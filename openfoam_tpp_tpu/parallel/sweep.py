"""vmapped parameter sweeps — the TPU replacement for the reference's
"one Slurm job per case" sweep farming (/root/reference/main.py:599-608).

Two batching modes:

  * `make_sweep_step(geom, ...)` — all cases share one geometry
    (H, D, mesh, geo fixed) and vary the forcing (R, freq, ramp);
  * `make_geom_sweep_step(...)` + `build_batched_geometry(rows)` — full
    (f, R, H, D, geo) Cartesian sweeps (/root/reference/main.py:504-534):
    every case's cut-cell apertures and spacing are stacked as vmapped
    OPERANDS on a shared padded grid (solver/timestep.py make_step_core
    takes geometry as runtime arguments). Cases share hx = hy = mesh;
    per-case hz = H/nz puts every tank's open top exactly at layer nz−1.

`axis` selects the batch-axis position: 0 (leading — the sharded multi-
chip layout, parallel/sharding.py maps it to the `case` mesh axis) or −1
(trailing — the single-chip throughput layout: TPU tiles the two minor
dims to (8, 128), so a small nz in the lane slot pads up to 128 and
wastes bandwidth; with the batch axis minor, lanes vectorize across
cases instead and tiny per-case grids run at full rate).

Batched cases share a single adaptive dt (the min over the batch) so the
batch stays in one jit program — the standard batched-ODE compromise.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from openfoam_tpp_tpu.config import PhysicalProperties, SolverControls
from openfoam_tpp_tpu.core.state import CaseParams, SimState, init_state
from openfoam_tpp_tpu.mesh.geometry import (
    TankGeometry,
    build_tank_geometry,
    natural_shape,
)
from openfoam_tpp_tpu.solver.timestep import (
    geometry_arrays,
    make_step,
    make_step_core,
)


def _stack(leaves, axis):
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=axis), *leaves)


def batch_params(param_rows: list[dict]) -> CaseParams:
    """Stack per-case (R, freq, duration, ramp) dicts into one CaseParams
    pytree with a batch axis (scalars — axis position is moot)."""
    built = [
        CaseParams.make(
            R=row["R"], freq=row["freq"], duration=row["duration"],
            ramp=row.get("ramp", -1.0),
        )
        for row in param_rows
    ]
    return _stack(built, 0)


def batch_states(geom: TankGeometry, n: int, dt0: float = 1e-3,
                 axis: int = 0) -> SimState:
    """n identical quiescent initial states with a batch axis."""
    s = init_state(geom, dt0=dt0)

    def rep(a):
        if a.ndim == 0:
            return jnp.broadcast_to(a, (n,)).copy()
        out = jnp.broadcast_to(a[None], (n,) + a.shape)
        return out.copy() if axis == 0 else jnp.moveaxis(out, 0, -1).copy()

    return jax.tree.map(rep, s)


def _sync_dt(states: SimState) -> SimState:
    dt_sync = jnp.min(states.dt)
    return dataclasses.replace(
        states, dt=jnp.broadcast_to(dt_sync, states.dt.shape)
    )


def _sweep_kernel_policy(axis) -> dict:
    """SolverControls overrides for a vmapped sweep step
    (OFTPP_SWEEP_PALLAS):
      unset ("auto") — batch-native 7-point pressure kernels via the
        custom_vmap reroute (ops/pallas/seven_point_batch.py); needs the
        trailing case axis and a TPU backend. Single-grid MULES/momentum
        kernels stay off (batch_lanes pin, config.py): their vmap
        lowering is one lane-padded grid program per case — measured
        slower than the lane-vectorized jnp path (r3 TPU A/B, 130.0M vs
        142.1M agg cell-updates/s, docs/ROADMAP.md §3b).
      =interpret — same routing with interpreter-mode kernels (CI
        coverage on CPU).
      =1 — legacy: ALL kernels via the pallas batching rule.
      =0 — everything jnp."""
    env = os.environ.get("OFTPP_SWEEP_PALLAS", "auto")
    trailing = axis in (-1, 3)
    if env == "1":
        return dict(use_pallas=True, mom_pallas=False)
    if trailing and (env == "interpret"
                     or (env == "auto"
                         and jax.default_backend() == "tpu")):
        return dict(use_pallas=True, batch_lanes=True, mom_pallas=False)
    return dict(use_pallas=False, mom_pallas=False)


def make_sweep_step(
    geom: TankGeometry,
    props: PhysicalProperties = PhysicalProperties(),
    controls: SolverControls = SolverControls(),
    axis: int = 0,
):
    """vmapped step over forcing params, one shared geometry:
    (batched SimState, batched CaseParams) -> same.

    The per-case adaptive dt is synchronized to the batch minimum before
    stepping, keeping all cases on a common time axis.
    """
    # The fused momentum-RHS kernel is a single-grid design; under vmap
    # the case-minor jnp path vectorizes across lanes instead. The
    # 7-point pressure kernels DO run batch-native (same policy and env
    # knob as make_geom_sweep_step below): the operator weights depend
    # on the batched alpha, so they are batched operands and the
    # custom_vmap reroute applies even though the geometry is shared.
    controls = dataclasses.replace(controls,
                                   **_sweep_kernel_policy(axis))
    step = make_step(geom, props, controls)
    vstep = jax.vmap(step, in_axes=(axis, 0), out_axes=(axis, 0))

    def sweep_step(states: SimState, params: CaseParams):
        return vstep(_sync_dt(states), params)

    return sweep_step


# ------------------------------------------------- geometry-batched sweeps

@dataclasses.dataclass
class BatchedGeometry:
    """Per-case geometries embedded in one shared padded grid.

    `ga` is the stacked geometry_arrays pytree (vmapped operand — NOT a
    compile-time constant, keeping programs under the remote-compile size
    limit and shared across sweeps); `spacing` is (n, 3)."""

    geoms: list                  # per-case TankGeometry (host post-processing)
    ga: dict                     # stacked device arrays, batch at `axis`
    spacing: jax.Array           # (n_cases, 3)
    shape: tuple                 # shared (nx, ny, nz)
    axis: int

    @property
    def n_cases(self) -> int:
        return len(self.geoms)


def build_batched_geometry(rows: list[dict], round_to: int = 8,
                           axis: int = 0) -> BatchedGeometry:
    """Build the shared-grid batched geometry for sweep rows with
    (possibly) different H, D, geo. All rows must share `mesh` (cases at
    different resolutions belong in different compiled programs — group
    them into separate batches).
    """
    meshes = {float(r["mesh"]) for r in rows}
    if len(meshes) > 1:
        raise ValueError(
            f"geometry batch mixes mesh sizes {sorted(meshes)}; group rows "
            "by mesh and run one batch per resolution"
        )
    shapes = [
        natural_shape(r["H"], r["D"], r["mesh"], r.get("geo", "flat"),
                      round_to=round_to)
        for r in rows
    ]
    nx = max(s[0] for s in shapes)
    ny = max(s[1] for s in shapes)
    nz = max(s[2] for s in shapes)
    shared = (nx, ny, nz)
    geoms = [
        build_tank_geometry(
            H=r["H"], D=r["D"], mesh=r["mesh"], geo=r.get("geo", "flat"),
            force_shape=shared,
        )
        for r in rows
    ]
    ga = _stack([geometry_arrays(g) for g in geoms], axis)
    spacing = jnp.asarray([g.spacing for g in geoms], jnp.float32)
    return BatchedGeometry(geoms=geoms, ga=ga, spacing=spacing,
                           shape=shared, axis=axis)


def batch_states_geom(bgeom: BatchedGeometry, dt0: float = 1e-3) -> SimState:
    """Per-case quiescent initial states (each filled to its own H/2)."""
    states = [init_state(g, dt0=dt0) for g in bgeom.geoms]

    def stack(*xs):
        a = jnp.stack(xs, 0 if xs[0].ndim == 0 else bgeom.axis)
        return a

    return jax.tree.map(stack, *states)


def make_geom_sweep_step(
    bgeom: BatchedGeometry,
    props: PhysicalProperties = PhysicalProperties(),
    controls: SolverControls = SolverControls(),
    lockstep: bool = True,
):
    """Geometry-batched vmapped step: every case carries its own cut-cell
    arrays and spacing as batched operands; one program serves the whole
    (f, R, H, D, geo) sweep.

    `lockstep=True` (default) syncs the CFL dt across lanes with
    lax.pmin, so all case times stay bitwise identical and land on write
    targets together; `lockstep=False` gives every lane its OWN adaptive
    dt (independent-job parity with the reference's per-case farming,
    /root/reference/main.py:599-608): lanes still land exactly on each
    write target (the per-lane write-grid split), and lanes that have
    already reached `t_stop` are HELD (masked identity) while stiffer
    lanes catch up — a lax case takes its solo step count, not the
    batch-stiffest one (VERDICT r3 item 7)."""
    # Kernels under vmap: see _sweep_kernel_policy (batch-native 7-point
    # pressure kernels by default on TPU with the trailing case axis).
    controls = dataclasses.replace(controls,
                                   **_sweep_kernel_policy(bgeom.axis))
    axis_name = "case" if lockstep else None
    core = make_step_core(props, controls, open_top=True,
                          sync_axis=axis_name)

    def stepper(state, params, ga, spacing, t_stop):
        return core(state, params, ga, (spacing[0], spacing[1], spacing[2]),
                    t_stop=t_stop)

    ax = bgeom.axis
    vstep = jax.vmap(stepper, in_axes=(ax, 0, ax, 0, None),
                     out_axes=(ax, 0), axis_name=axis_name)

    def _hold_done(old: SimState, new: SimState, done):
        """Select old (held) lanes where done, per-leaf broadcast."""
        def sel(o, nw):
            if o.ndim <= 1:
                m = done
            elif ax == 0:
                m = done.reshape((-1,) + (1,) * (o.ndim - 1))
            else:
                m = done.reshape((1,) * (o.ndim - 1) + (-1,))
            return jnp.where(m, o, nw)

        return jax.tree.map(sel, old, new)

    def sweep_step(states: SimState, params: CaseParams, t_stop=None):
        if lockstep:
            return vstep(_sync_dt(states), params, bgeom.ga, bgeom.spacing,
                         t_stop)
        new_states, diag = vstep(states, params, bgeom.ga, bgeom.spacing,
                                 t_stop)
        if t_stop is None:
            return new_states, diag
        done = states.t >= jnp.asarray(t_stop, states.t.dtype)
        return _hold_done(states, new_states, done), diag

    return sweep_step


def run_sweep(
    geom,
    param_rows: list[dict],
    t_end: float,
    props: PhysicalProperties = PhysicalProperties(),
    controls: SolverControls = SolverControls(),
    max_steps: int = 100_000,
    axis: int = 0,
):
    """Advance a whole sweep batch to t_end. Returns (states, n_steps).

    `geom`: a TankGeometry (shared-geometry forcing sweep) or a
    BatchedGeometry (full geometry sweep)."""
    params = batch_params(param_rows)
    if isinstance(geom, BatchedGeometry):
        states = batch_states_geom(geom)
        sweep_step = make_geom_sweep_step(geom, props, controls)
    else:
        states = batch_states(geom, len(param_rows), axis=axis)
        sweep_step = make_sweep_step(geom, props, controls, axis=axis)

    @jax.jit
    def advance(states, params):
        def cond(c):
            s, n = c
            return jnp.logical_and(jnp.min(s.t) < t_end, n < max_steps)

        def body(c):
            s, n = c
            s2, _ = sweep_step(s, params)
            return s2, n + 1

        return jax.lax.while_loop(cond, body, (states, jnp.asarray(0, jnp.int32)))

    states, n = advance(states, params)
    return states, int(np.asarray(n))
