"""Case execution: the TPU replacement for the reference's L3 layer
(`run_case_local` → make → mpirun foamRun, /root/reference/main.py:333-348,
Makefile:71-99). The solver runs in-process: a jitted device loop advances
the state between write times; every `write_interval` of simulated time a
SimState checkpoint is persisted (time-directory parity, purgeWrite 0) and
probes are appended. Resume-from-latest is automatic (`startFrom
latestTime` parity).
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from openfoam_tpp_tpu.config import PhysicalProperties, SolverControls
from openfoam_tpp_tpu.core.state import CaseParams, init_state
from openfoam_tpp_tpu.manager.cases import load_case_params
from openfoam_tpp_tpu.mesh import build_tank_geometry
from openfoam_tpp_tpu.post.probes import (
    ProbeWriter,
    default_probe_points,
    default_wave_columns,
)
from openfoam_tpp_tpu.solver.timestep import StepDiagnostics, make_step
from openfoam_tpp_tpu.utils.io import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
    to_state,
)

_MAX_STEPS_PER_WRITE = 4000


def _zero_diag():
    z = jnp.asarray(0.0, jnp.float32)
    return StepDiagnostics(z, z, z, jnp.asarray(0, jnp.int32), z, z, z)


def make_advance(step_fn, max_steps: int = _MAX_STEPS_PER_WRITE,
                 sampler=None, sample_width: int = 0):
    """Device loop: run steps until t >= t_target (bounded by max_steps).

    `sampler(state) -> (sample_width,) row`: evaluated after EVERY solver
    step into a fixed on-device buffer returned alongside the state —
    per-timestep probe cadence (functionObject parity; the reference
    samples p every solver dt, /root/reference/circularSloshingTank/
    system/functions:17-33). Returns (state, diag, n_steps[, samples]).

    A step_fn built with `carry_precond=True` (its `init_precond`
    attribute marks it) threads the bf16 MG preconditioner bundle through
    the loop carry, refreshing it every controls.precond_refresh steps;
    one fresh bundle is built per advance call (amortized over the
    ~write_interval/dt steps the call runs).

    A step_fn built by make_step_ga (its `takes_ga` attribute marks it)
    changes the signature to `advance(state, params, t_target, ga[,
    probe_pack])`: the geometry arrays (and the sampler's probe
    constants) cross the jit boundary as OPERANDS, so one compiled
    advance serves every same-(shape, spacing) geometry and executables
    stop embedding ~5·n³ floats of HLO constants (VERDICT r3 item 8);
    `sampler` is then the pure post.probes.sample_row(state, pack)."""
    init_precond = getattr(step_fn, "init_precond", None)
    takes_ga = getattr(step_fn, "takes_ga", False)

    def advance(state, params, t_target, *operands):
        ga_args = operands[:1] if takes_ga else ()
        pack = operands[1] if (takes_ga and sampler is not None) else None

        def cond(carry):
            s = carry[0]
            n = carry[2]
            return jnp.logical_and(s.t < t_target, n < max_steps)

        def body(carry):
            s, _, n = carry[:3]
            # t_stop makes the final step land EXACTLY on t_target
            # (adjustableRunTime parity, controlDict:29-32).
            if init_precond is None:
                s2, d = step_fn(s, params, *ga_args, t_stop=t_target)
                bundle = ()
            else:
                s2, d, b2 = step_fn(s, params, *ga_args, t_stop=t_target,
                                    precond=carry[-1])
                bundle = (b2,)
            if sampler is None:
                return (s2, d, n + 1) + bundle
            row = sampler(s2, pack) if takes_ga else sampler(s2)
            buf = carry[3].at[n].set(row)
            return (s2, d, n + 1, buf) + bundle

        init = (state, _zero_diag(), jnp.asarray(0, jnp.int32))
        if sampler is not None:
            init = init + (jnp.zeros((max_steps, sample_width),
                                     jnp.float32),)
        if init_precond is not None:
            init = init + (init_precond(state, *ga_args),)
            return jax.lax.while_loop(cond, body, init)[:-1]
        return jax.lax.while_loop(cond, body, init)

    return advance


def _spmd_kernels_wanted() -> bool:
    """True when a 1-D x-sharded run should use the per-shard fused
    kernels (parallel/spmd.py): TPU backend, or CPU virtual devices with
    OFTPP_SPMD_PALLAS=interpret (the CI/e2e coverage mode). =0 disables.
    Shared by the geometry rounding policy and the step builder so they
    agree — the kernels need nx to be a SLAB multiple PER SHARD, a
    rounding the plain GSPMD path must not pay (it would change the grid
    vs a solo run of the same case, tests/test_sharded_run.py)."""
    env = os.environ.get("OFTPP_SPMD_PALLAS", "1")
    if env == "0":
        return False
    return jax.default_backend() == "tpu" or env == "interpret"


def build_case_geometry(params: dict, shape_hint: tuple | None = None,
                        devices=None):
    """Geometry for a case. `shape_hint` (from an existing checkpoint's
    alpha shape) keeps resumed/postprocessed cases consistent with the
    grid they were started on, across round_to policy changes.
    `devices` (int N or 'NxM'): the grid's x (and y) extents must divide
    the device-mesh axes for sharded runs — rounds nx/ny up (with solid
    zero-aperture padding) when 8-rounding alone does not."""
    if params.get("model") == "tank6dof":
        from openfoam_tpp_tpu.mesh import (build_box_geometry,
                                           build_chamfer_tank_geometry)

        if float(params.get("chamfer", 0.0)) > 0.0:
            # The tutorial tank's true shape class: 45°-chamfered
            # bottom/top edges (blockMesh resources/sloshingTank3D,
            # /root/reference/sloshingTank3D6DoF/Allrun:7).
            return build_chamfer_tank_geometry(
                params["Lx"], params["Ly"], params["Lz"], params["mesh"],
                chamfer=float(params["chamfer"]), z0=-params["Lz"] / 2.0,
            )
        return build_box_geometry(
            params["Lx"], params["Ly"], params["Lz"], params["mesh"],
            z0=-params["Lz"] / 2.0, open_top=False,
        )
    from openfoam_tpp_tpu.parallel.sharding import parse_devices

    dx, dy = parse_devices(devices)
    # round_to=8: nx/ny padded (with solid, zero-aperture cells) to a
    # multiple of 8 — aligns TPU tiles and enables the Pallas kernels.
    rounds = [8, 1]
    if dx * dy > 1:
        import math

        cands = [math.lcm(8, max(dx, dy))]
        if dy == 1 and _spmd_kernels_wanted():
            # 1-D x decomposition with per-shard fused kernels: the LOCAL
            # nx must stay a SLAB multiple (parallel/spmd.py), so round nx
            # to 8·dx first; the plain lcm candidate remains the GSPMD
            # fallback for resumed cases built under the old rounding.
            cands = [8 * dx] + cands
        rounds = cands + rounds
    for r in rounds:
        geom = build_tank_geometry(
            H=params["H"], D=params["D"], mesh=params["mesh"],
            geo=params["geo"], round_to=r,
        )
        if shape_hint is not None and tuple(geom.shape) != tuple(shape_hint):
            continue
        if dx * dy > 1 and (geom.shape[0] % dx or geom.shape[1] % dy):
            continue
        return geom
    raise ValueError(
        f"no geometry for {params} matches checkpoint grid {shape_hint}"
        + (f" with (nx, ny) divisible by ({dx}, {dy}) devices"
           if devices else "")
        + " — was the case built with different parameters?"
    )


def _case_shape_hint(case_dir: str):
    """Grid shape of the case's existing checkpoints (None if fresh)."""
    from openfoam_tpp_tpu.utils.io import latest_checkpoint, load_checkpoint

    chk = latest_checkpoint(case_dir)
    if chk is None:
        return None
    return tuple(load_checkpoint(chk[1])["alpha"].shape)


def build_case_motion(params: dict, case_dir: str):
    """TableMotion for table-driven models; None for analytic orbital."""
    if params.get("model") != "tank6dof":
        return None
    from openfoam_tpp_tpu.core.motion import TableMotion
    from openfoam_tpp_tpu.utils.io import read_6dof_table

    table = os.path.join(case_dir, "constant", "6DoF.dat")
    t, trans, rot = read_6dof_table(table)
    # Resample to the solver dt scale for smooth finite-difference
    # accelerations (the reference table is 100 coarse samples).
    return TableMotion.from_table(t, trans, rot,
                                  resample_dt=min(0.05, params["dt"] * 10))


# Compiled-solver cache: cases sharing (geometry, physics, controls) reuse
# one jitted advance function — sweeps over (R, freq) recompile nothing.
_ADVANCE_CACHE: dict = {}


def _identity(x):
    return x


def _sharded_wrappers(step, mesh, sampler=None, sample_width: int = 0):
    """Advance over a device mesh: the grid's x axis is sharded (the
    decomposePar → mpirun replacement, /root/reference/circularSloshingTank/
    Makefile:77-82) — stencil halos lower to XLA collective-permutes, CG
    dots to psums. State crosses the jit boundary as PackedState (uniform
    shapes divide evenly over the mesh; parallel/packed.py)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from openfoam_tpp_tpu.parallel import packed as pk
    from openfoam_tpp_tpu.parallel import sharding as sh

    adv = make_advance(step, sampler=sampler, sample_width=sample_width)

    def packed_adv(ps, params, t_target):
        out = adv(pk.unpack(ps), params, t_target)
        return (pk.pack(out[0]),) + out[1:]

    st_sh = sh.state_sharding(mesh)
    rep = NamedSharding(mesh, P())
    n_extra = 2 if sampler is None else 3
    jitted = jax.jit(
        packed_adv,
        in_shardings=(st_sh, sh.params_sharding(mesh), rep),
        out_shardings=(st_sh,) + (None,) * n_extra,
    )

    def to_dev(state):
        return jax.device_put(pk.pack(state), st_sh)

    # unpack outside jit is O(boundary) concat on the gathered-at-write
    # boundary planes; checkpoints are written globally (reconstructPar
    # eliminated by design).
    return jitted, to_dev, pk.unpack


def get_compiled_advance(params: dict, props: PhysicalProperties,
                         controls: SolverControls, case_dir: str | None = None,
                         devices=None):
    """Returns (geom, advance, to_dev, to_host). `devices` (int N or
    'NxM') shards the case's x (and y) axes over a device mesh (manager
    `--devices N[xM]`).

    Single-device analytic-orbital cases run the geometry-as-OPERANDS
    path (make_step_ga): the jitted advance is keyed only by
    (shape, spacing, open_top, physics, controls), so every (H, D, geo)
    variant of one grid class reuses ONE executable with no baked
    geometry constants (VERDICT r3 item 8). Table-motion (6DoF) and
    sharded runs keep the closure step (the motion table is compiled in;
    the ragged (n+1)-face aperture arrays do not shard evenly)."""
    import dataclasses

    from openfoam_tpp_tpu.parallel.sharding import parse_devices

    d_x, d_y = parse_devices(devices)
    n_dev = d_x * d_y
    is_6dof = params.get("model") == "tank6dof"
    shape_hint = _case_shape_hint(case_dir) if case_dir else None

    geom = build_case_geometry(params, shape_hint,
                               devices=devices if n_dev > 1 else None)
    spmd_ctx = None
    if (jax.default_backend() == "tpu" and geom.shape[0] % 8 == 0
            and n_dev == 1):
        # The fused stencil kernels are single-device programs; under
        # plain GSPMD the dense jnp path (which lowers to collectives)
        # would run instead.
        controls = dataclasses.replace(controls, use_pallas=True)
    elif (n_dev > 1 and d_y == 1 and not is_6dof
          and geom.shape[0] % (8 * d_x) == 0
          and (jax.default_backend() == "tpu"
               or os.environ.get("OFTPP_SPMD_PALLAS") == "interpret")
          and os.environ.get("OFTPP_SPMD_PALLAS", "1") != "0"):
        # Spatially sharded runs keep the fused kernels: each kernel call
        # becomes a per-shard shard_map island with explicit ppermute
        # halo rings (parallel/spmd.py) — erasing the ~20%/chip forfeit
        # of the kernels-off GSPMD route (docs/ROADMAP.md). 1-D x
        # decomposition only; OFTPP_SPMD_PALLAS=0 reverts to GSPMD-jnp.
        from openfoam_tpp_tpu.parallel import sharding as sh
        from openfoam_tpp_tpu.parallel.spmd import SpmdCtx

        # OFTPP_SPMD_PALLAS=interpret exercises this path on virtual CPU
        # devices (kernels in interpreter mode — the CI/e2e coverage for
        # the halo rings without TPU hardware).
        mesh = sh.make_mesh(n_dev, case_axis=1, y_axis=d_y)
        spmd_ctx = SpmdCtx(mesh=mesh, axis="x",
                           interpret=jax.default_backend() != "tpu")
        controls = dataclasses.replace(controls, use_pallas=True)
    k_env = os.environ.get("OFTPP_PRECOND_REFRESH")
    if k_env is not None:
        controls = dataclasses.replace(controls,
                                       precond_refresh=int(k_env))

    from openfoam_tpp_tpu.post.probes import probe_pack
    from openfoam_tpp_tpu.solver.timestep import geometry_arrays, make_step_ga

    spacing = tuple(float(s) for s in geom.spacing)
    open_top = bool(np.any(geom.top_open > 0))

    if not is_6dof and n_dev == 1:
        sealed_x = bool(np.all(geom.ax[-1] == 0.0))
        key = (tuple(geom.shape), spacing, open_top, sealed_x,
               props, controls)
        hit = _ADVANCE_CACHE.get(key)
        if hit is None:
            step = make_step_ga(spacing, props, controls,
                                open_top=open_top, carry_precond=True,
                                sealed_x=sealed_x)
            from openfoam_tpp_tpu.post.probes import sample_row

            width = 1 + len(default_probe_points(geom)) \
                + len(default_wave_columns(geom))
            hit = jax.jit(make_advance(step, sampler=sample_row,
                                       sample_width=width))
            _ADVANCE_CACHE[key] = hit
        jitted = hit
        ga = geometry_arrays(geom)
        pack = probe_pack(geom, default_probe_points(geom),
                          default_wave_columns(geom))

        def advance(state, case_params, t_target):
            return jitted(state, case_params, t_target, ga, pack)

        return geom, advance, _identity, _identity

    if is_6dof:
        # Table-driven motion is baked into the compiled step — keyed by
        # the case directory (table identity).
        key = ("tank6dof", case_dir, params["Lx"], params["Ly"],
               params["Lz"], params["mesh"], props, controls)
    else:
        key = (
            params["H"], params["D"], params["mesh"], params["geo"],
            props, controls,
        )
    key = key + (shape_hint, d_x, d_y, spmd_ctx is not None)
    hit = _ADVANCE_CACHE.get(key)
    if hit is None:
        motion = build_case_motion(params, case_dir) if case_dir else None
        # The preconditioner bundle threads through the advance loop carry
        # (make_advance) so precond_refresh amortizes its construction on
        # BOTH the single-device and the sharded path: the bundle is born
        # inside the jitted advance (init_precond in the while_loop init),
        # so GSPMD propagates its shardings through the carry without any
        # jit-boundary declaration (VERDICT r3 item 2a).
        step = make_step(geom, props, controls, motion=motion,
                         carry_precond=True, spmd=spmd_ctx)
        from openfoam_tpp_tpu.post.probes import make_probe_sampler

        sampler, width = make_probe_sampler(
            geom, default_probe_points(geom), default_wave_columns(geom))
        if n_dev > 1:
            from openfoam_tpp_tpu.parallel import sharding as sh

            mesh = (spmd_ctx.mesh if spmd_ctx is not None
                    else sh.make_mesh(n_dev, case_axis=1, y_axis=d_y))
            advance, to_dev, to_host = _sharded_wrappers(
                step, mesh, sampler=sampler, sample_width=width)
        else:
            advance, to_dev, to_host = (
                jax.jit(make_advance(step, sampler=sampler,
                                     sample_width=width)),
                _identity, _identity)
        hit = (geom, advance, to_dev, to_host)
        _ADVANCE_CACHE[key] = hit
    return hit


def run_case(
    case_dir: str,
    props: PhysicalProperties = PhysicalProperties(),
    controls: SolverControls = SolverControls(),
    log=print,
    write_checkpoints: bool = True,
    devices=None,
) -> dict:
    """Run (or resume) a case to its encoded duration. Returns run stats.

    `devices` (int N, or 'NxM' for a 2-D x·y decomposition): shard the
    grid's spatial axes over that many devices (`jax.sharding` mesh — the
    in-process replacement for the reference's decomposePar → mpirun -np N
    → reconstructPar pipeline; 'NxM' is the hierarchical-n analog).
    Checkpoints, probes and resume work identically: state is written
    globally."""
    # FPE-trap parity (OpenFOAM's `sigFpe: Enabling floating point
    # exception trapping`, circularSloshingTank/result.txt:17):
    # OFTPP_DEBUG_NANS=1 makes jax raise on the first NaN produced by
    # any solver op instead of letting it propagate silently.
    if os.environ.get("OFTPP_DEBUG_NANS") == "1":
        jax.config.update("jax_debug_nans", True)
        log("  (jax_debug_nans on — sigFpe-parity NaN trapping)")
    params = load_case_params(case_dir)
    is_6dof = params.get("model") == "tank6dof"
    geom, advance, to_dev, to_host = get_compiled_advance(
        params, props, controls, case_dir, devices=devices)
    n_cells = geom.n_fluid_cells
    log(f"  Mesh: {geom.shape[0]}x{geom.shape[1]}x{geom.shape[2]} grid, "
        f"{n_cells} fluid cells (h={params['mesh']:g} m, "
        f"geo={params.get('geo', geom.geo)})"
        + (f", sharded over {devices} devices (x·y)"
           if devices not in (None, 1) else ""))

    if is_6dof:
        # Motion comes from the compiled-in table; params are inert.
        case_params = CaseParams.make(R=0.0, freq=0.0,
                                      duration=params["duration"])
    else:
        case_params = CaseParams.make(
            R=params["R"], freq=params["freq"], duration=params["duration"],
            ramp=params["ramp"],
        )

    chk = latest_checkpoint(case_dir)
    if chk is not None:
        state = to_state(load_checkpoint(chk[1]))
        log(f"  Resuming from t={chk[0]:.4f} s ({chk[1]})")
    else:
        # 6DoF tutorial tank: waterline at z=0 (setFieldsDict box → z<0).
        fill = 0.0 if is_6dof else None
        state = init_state(geom, fill_height=fill, dt0=params["dt"])
        if write_checkpoints:
            save_checkpoint(case_dir, state)

    # Per-timestep probe channels (functionObject parity — see
    # make_probe_sampler): pressure probes + η wave gauges, accumulated on
    # device every solver step and flushed at each write interval.
    probe_pts = default_probe_points(geom)
    wave_cols = default_wave_columns(geom)
    t0_now = float(np.asarray(state.t))
    probes = ProbeWriter(case_dir, probe_pts, "p", start_time=t0_now)
    gauges = ProbeWriter(
        case_dir,
        np.column_stack([wave_cols, np.zeros(len(wave_cols))]),
        "eta", start_time=t0_now)
    n_pts = len(probe_pts)

    duration = params["duration"]
    w = controls.write_interval
    t_now = float(np.asarray(state.t))
    first_k = int(np.floor(t_now / w + 1e-6)) + 1
    # Targets are computed with the same f32 arithmetic the device uses to
    # snap landing times (k * f32(w)), so `state.t == t_target` bitwise at
    # each write — no epsilon drift across a 20 s / 400-write run.
    w32 = np.float32(w)
    n_writes = int(np.floor(duration / w + 1e-9))
    targets = [float(np.float32(k) * w32) for k in range(first_k, n_writes + 1)]
    # A duration that is not a write multiple (swept values like 0.33) must
    # still be reached, else is_case_done() never fires (ADVICE r1).
    if not targets or targets[-1] < duration - 1e-9:
        targets.append(float(np.float32(duration)))

    wall0 = time.time()
    steps_total = 0
    work = to_dev(state)
    for t_target in targets:
        # Re-invoke until the target is actually reached: one advance is
        # bounded at max_steps and may fall short on fine meshes (ADVICE r1).
        while True:
            work, diag, n, buf = advance(work, case_params,
                                         jnp.float32(t_target))
            steps_total += int(n)
            if int(n):
                rows = np.asarray(buf)[: int(n)]
                probes.append_rows(rows[:, 0], rows[:, 1 : 1 + n_pts])
                gauges.append_rows(rows[:, 0], rows[:, 1 + n_pts :])
            if float(np.asarray(work.t)) >= t_target or int(n) == 0:
                break
            log(f"  (write target {t_target:.6g} s not reached in "
                f"{int(n)} steps; continuing)")
        state = to_host(work)
        if write_checkpoints:
            save_checkpoint(case_dir, state)
        log(
            f"Time = {float(np.asarray(state.t)):.6g} s  "
            f"dt = {float(np.asarray(state.dt)):.3e}  "
            f"Co = {float(diag.courant):.3f}  alphaCo = {float(diag.alpha_courant):.3f}  "
            f"p: iters {int(diag.p_iters)}, res {float(diag.p_residual):.2e}  "
            f"alpha in [{float(diag.alpha_min):.4f}, {float(diag.alpha_max):.4f}]"
        )

    wall = time.time() - wall0
    sim_time = float(np.asarray(state.t)) - t_now
    stats = {
        "n_cells": n_cells,
        "steps": steps_total,
        "wall_seconds": wall,
        "sim_seconds": sim_time,
        "cell_steps_per_sec": n_cells * steps_total / max(wall, 1e-9),
    }
    log(
        f"  Done: {steps_total} steps / {sim_time:.3g} s simulated in "
        f"{wall:.1f} s wall ({stats['cell_steps_per_sec']:.3g} cell-updates/s)"
    )
    return stats


def iterate_snapshots(case_dir: str):
    """Yield (t, alpha) from all checkpoints — feeds post/interface.py."""
    from openfoam_tpp_tpu.utils.io import list_checkpoints

    for t, path in list_checkpoints(case_dir):
        payload = load_checkpoint(path)
        yield t, payload["alpha"]
