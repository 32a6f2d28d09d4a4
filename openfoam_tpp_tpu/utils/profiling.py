"""On-device profiling — the in-process tracing subsystem the reference
lacks (SURVEY.md §5: its only "profiling" is the calibrated cost model,
/root/reference/main.py:193-249, plus Slurm wall-clock logs).

Two tools:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` producing
    a TensorBoard-loadable XLA trace (op-level HLO timings, HBM traffic).
  * ``profile_case(case_dir, n_steps)`` — resume a case from its latest
    checkpoint, run ``n_steps`` solver steps under the trace, and write a
    human-readable summary (per-step wall ms, cell-updates/s) next to the
    trace under ``postProcessing/profile/``.

Exposed via the manager as ``--action profile`` (manager/cli.py).
"""

from __future__ import annotations

import contextlib
import os
import time

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace into `logdir` (view with TensorBoard)."""
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def profile_case(case_dir: str, n_steps: int = 20,
                 props=None, controls=None, log=print) -> dict:
    """Profile `n_steps` solver steps of a case (from latest checkpoint —
    run the case first so the adaptive dt reflects real flow)."""
    import jax
    import jax.numpy as jnp

    from openfoam_tpp_tpu.config import PhysicalProperties, SolverControls
    from openfoam_tpp_tpu.core.state import CaseParams, init_state
    from openfoam_tpp_tpu.manager.cases import load_case_params
    from openfoam_tpp_tpu.manager.runner import (
        build_case_geometry,
        build_case_motion,
        _case_shape_hint,
    )
    from openfoam_tpp_tpu.solver.timestep import make_step
    from openfoam_tpp_tpu.utils.io import (
        latest_checkpoint,
        load_checkpoint,
        to_state,
    )
    from openfoam_tpp_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    props = props or PhysicalProperties()
    controls = controls or SolverControls()
    params = load_case_params(case_dir)
    geom = build_case_geometry(params, _case_shape_hint(case_dir))
    if jax.default_backend() == "tpu" and geom.shape[0] % 8 == 0:
        import dataclasses

        controls = dataclasses.replace(controls, use_pallas=True)
    motion = build_case_motion(params, case_dir)
    step = jax.jit(make_step(geom, props, controls, motion=motion))

    if params.get("model") == "tank6dof":
        cp = CaseParams.make(R=0.0, freq=0.0, duration=params["duration"])
    else:
        cp = CaseParams.make(R=params["R"], freq=params["freq"],
                             duration=params["duration"],
                             ramp=params.get("ramp", 0.0))

    chk = latest_checkpoint(case_dir)
    if chk is not None:
        state = to_state(load_checkpoint(chk[1]))
        log(f"  Profiling from checkpoint t={chk[0]:.4f} s")
    else:
        state = init_state(geom, dt0=params["dt"])
        log("  Profiling from t=0 (no checkpoint found — dt still settling)")

    # Warmup: compile + settle the step program.
    for _ in range(3):
        state, diag = step(state, cp)
    jax.block_until_ready(state)

    outdir = os.path.join(case_dir, "postProcessing", "profile")
    os.makedirs(outdir, exist_ok=True)
    step_walls = []
    with trace(outdir):
        for _ in range(n_steps):
            w0 = time.perf_counter()
            state, diag = step(state, cp)
            jax.block_until_ready(state)
            step_walls.append(time.perf_counter() - w0)

    walls = np.asarray(step_walls)
    n_cells = geom.n_fluid_cells
    stats = {
        "n_steps": n_steps,
        "fluid_cells": n_cells,
        "grid": list(geom.shape),
        "device": str(jax.devices()[0]),
        "mean_step_ms": float(walls.mean() * 1e3),
        "p50_step_ms": float(np.percentile(walls, 50) * 1e3),
        "p95_step_ms": float(np.percentile(walls, 95) * 1e3),
        "cell_updates_per_sec": float(n_cells / walls.mean()),
        "final_dt": float(np.asarray(state.dt)),
        "p_iters": int(np.asarray(diag.p_iters)),
        "trace_dir": outdir,
    }
    summary = os.path.join(outdir, "summary.txt")
    with open(summary, "w") as f:
        for k, v in stats.items():
            f.write(f"{k}: {v}\n")
    log(f"  Step wall: mean {stats['mean_step_ms']:.2f} ms  "
        f"p95 {stats['p95_step_ms']:.2f} ms  "
        f"({stats['cell_updates_per_sec']:.3g} cell-updates/s)")
    log(f"  XLA trace + summary in {outdir} (load with TensorBoard)")
    return stats
