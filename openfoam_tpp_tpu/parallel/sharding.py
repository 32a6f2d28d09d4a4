"""Multi-chip scale-out via jax.sharding — the TPU replacement for the
reference's decomposePar → mpirun → reconstructPar pipeline
(/root/reference/circularSloshingTank/Makefile:77-82, SURVEY.md §2.4).

The grid's leading (x) axis is sharded over the device mesh; every stencil
shift lowers to an XLA collective-permute over ICI (the halo exchange) and
every CG/Courant reduction to a psum — no hand-written communication, no
reconstruct step (arrays are globally addressable). A `case` mesh axis
shards vmapped sweep batches (the DP analog) on top of the spatial axis.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, case_axis: int = 1,
              y_axis: int = 1, devices=None) -> Mesh:
    """Device mesh with axes (case, x, y).

    case_axis=1, y_axis=1 → purely x-spatial (1-D decomposition, the
    default); y_axis>1 adds the second spatial axis — the analog of the
    reference's hierarchical multi-axis decomposePar layout
    (/root/reference/sloshingTank3D6DoF/system/decomposeParDict:19-29,
    n=(4 2 2)). The x shard count is whatever remains:
    n_devices / (case_axis · y_axis)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if len(devices) < n_devices:
        raise ValueError(
            f"make_mesh: asked for {n_devices} devices but only "
            f"{len(devices)} available ({[str(d) for d in devices]}); "
            "provision virtual CPU devices via "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N plus "
            "jax.config.update('jax_platforms', 'cpu') before first use"
        )
    if n_devices % (case_axis * y_axis):
        raise ValueError(
            f"make_mesh: case_axis={case_axis} * y_axis={y_axis} does not "
            f"divide n_devices={n_devices}"
        )
    devices = np.asarray(devices[:n_devices])
    x_axis = n_devices // (case_axis * y_axis)
    return Mesh(devices.reshape(case_axis, x_axis, y_axis),
                ("case", "x", "y"))


def parse_devices(spec) -> tuple[int, int]:
    """(x_shards, y_shards) from a --devices spec: an int N (x-only, the
    1-D default) or a string 'NxM' for a 2-D (x, y) spatial decomposition
    (decomposeParDict hierarchical-n analog)."""
    if spec is None:
        return 1, 1
    if isinstance(spec, int):
        return max(spec, 1), 1
    s = str(spec).lower().replace("×", "x")
    if "x" in s:
        dx, dy = s.split("x", 1)
        return max(int(dx), 1), max(int(dy), 1)
    return max(int(s), 1), 1


def state_sharding(mesh: Mesh, batched: bool = False):
    """NamedSharding pytree for PackedState (uniform cell-shaped fields —
    see parallel/packed.py): fields sharded on their (x, y) spatial axes
    (y trivially when the mesh has no y extent), scalars replicated; with
    `batched`, the vmap axis maps to the `case` mesh axis."""
    from openfoam_tpp_tpu.parallel.packed import PackedState

    lead = ("case",) if batched else ()
    spatial = ("x", "y") if "y" in mesh.axis_names else ("x",)

    def fld(*spec):
        return NamedSharding(mesh, P(*lead, *spec))

    scalar = NamedSharding(mesh, P(*lead))
    return PackedState(
        alpha=fld(*spatial), u=fld(*spatial), v=fld(*spatial),
        w=fld(*spatial), w_top=fld(*spatial),
        p=fld(*spatial), t=scalar, dt=scalar, step=scalar,
    )


def params_sharding(mesh: Mesh, batched: bool = False):
    from openfoam_tpp_tpu.core.state import CaseParams

    s = NamedSharding(mesh, P("case") if batched else P())
    return CaseParams(orbit_radius=s, omega=s, ramp_time=s)


def shard_state(state, mesh: Mesh, batched: bool = False):
    """device_put a SimState onto the mesh (as a PackedState)."""
    from openfoam_tpp_tpu.parallel import packed as pk

    ps = pk.pack(state)
    return jax.device_put(ps, state_sharding(mesh, batched))


def sharded_step(step_fn, mesh: Mesh, batched: bool = False):
    """jit the step with explicit in/out shardings over the mesh.

    Takes/returns PackedState (uniform shapes divide evenly over the mesh;
    the (n+1)-face MAC layout is reconstructed inside jit where GSPMD
    handles ragged intermediate shapes)."""
    from openfoam_tpp_tpu.parallel import packed as pk

    sh_state = state_sharding(mesh, batched)
    sh_params = params_sharding(mesh, batched)

    return jax.jit(
        pk.packed_fn(step_fn),
        in_shardings=(sh_state, sh_params),
        out_shardings=(sh_state, None),
    )
