"""Benchmark: full VoF step throughput on one TPU chip at ~1M fluid cells.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "cell-updates/s", "vs_baseline": N}

Baseline: the reference's calibrated CPU cost model — 80 cpu-hours per
(Mcell·s simulated) ≈ 3.5 cell-updates/µs/core aggregate, at its 32-core
job cap → 1.12e8 cell-updates/s (/root/reference/main.py:205-226;
BASELINE.md). "Cell-update" = one full solver step of one fluid cell
(alpha MULES subcycles + momentum + MG-CG pressure solve included).

Env knobs: BENCH_SMALL=1 for a CPU-sized smoke run; BENCH_STEPS,
BENCH_MESH to override.
"""

import json
import os
import time

import numpy as np


def bench_sweep():
    """Sweep-throughput benchmark: N (f, R) cases vmapped on one chip —
    the reference farms these as N independent Slurm jobs
    (/root/reference/main.py:599-608); here one jitted batched step
    advances all of them (BASELINE.json "100+ cases/chip" north star)."""
    import time

    import jax
    import jax.numpy as jnp

    from openfoam_tpp_tpu.config import PhysicalProperties, SolverControls
    from openfoam_tpp_tpu.mesh import build_tank_geometry
    from openfoam_tpp_tpu.parallel.sweep import (
        batch_params,
        batch_states,
        make_sweep_step,
    )

    n_cases = int(os.environ.get("BENCH_CASES", "128"))
    mesh = float(os.environ.get("BENCH_MESH", "0.002"))
    n_steps = int(os.environ.get("BENCH_STEPS", "20"))
    # Default-case geometry (DEFAULTS: H=0.1, D=0.02).
    geom = build_tank_geometry(H=0.1, D=0.02, mesh=mesh, geo="flat",
                               round_to=8)
    n_cells = geom.n_fluid_cells

    sweep_step = make_sweep_step(geom, PhysicalProperties(), SolverControls())
    rows = [
        {"R": 0.002 + 2e-5 * i, "freq": 1.5 + 0.01 * i, "duration": 10.0}
        for i in range(n_cases)
    ]
    params = batch_params(rows)
    states = batch_states(geom, n_cases)

    @jax.jit
    def advance(states, params):
        def body(s, _):
            s2, d = sweep_step(s, params)
            return s2, None

        out, _ = jax.lax.scan(body, states, None, length=5)
        return out

    states = advance(states, params)
    jax.block_until_ready(states)
    for _ in range(3):
        states = advance(states, params)
    jax.block_until_ready(states)

    t0 = float(np.asarray(states.t[0]))
    wall0 = time.perf_counter()
    done = 0
    while done < n_steps:
        states = advance(states, params)
        done += 5
    jax.block_until_ready(states)
    wall = time.perf_counter() - wall0
    t1 = float(np.asarray(states.t[0]))

    updates = n_cells * n_cases * done / wall
    sim_rate = (t1 - t0) / wall
    result = {
        "metric": f"sweep cell-updates/sec/chip ({n_cases} vmapped cases)",
        "value": round(updates, 1),
        "unit": "cell-updates/s",
        "vs_baseline": round(updates / 1.12e8, 2),
        "detail": {
            "n_cases": n_cases,
            "cells_per_case": n_cells,
            "grid": list(geom.shape),
            "steps_timed": done,
            "wall_seconds": round(wall, 3),
            "sim_seconds_per_wall_second": round(sim_rate, 5),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


def main():
    import jax
    import jax.numpy as jnp

    from openfoam_tpp_tpu.config import PhysicalProperties, SolverControls
    from openfoam_tpp_tpu.core.state import CaseParams, init_state
    from openfoam_tpp_tpu.mesh import build_tank_geometry
    from openfoam_tpp_tpu.solver.timestep import make_multi_step, make_step

    small = os.environ.get("BENCH_SMALL") == "1"
    # Production-case geometry (case_H0.208_D0.2_flat_R0.004_f1.88) at a
    # resolution giving ~1e6 fluid cells (BASELINE.json north star).
    mesh = float(os.environ.get("BENCH_MESH", "0.0085" if small else "0.00185"))
    n_steps = int(os.environ.get("BENCH_STEPS", "4" if small else "20"))
    chunk = 2 if small else 5

    H, D, freq, R = 0.208, 0.2, 1.88, 0.004
    geom = build_tank_geometry(H=H, D=D, mesh=mesh, geo="flat", round_to=8)
    n_cells = geom.n_fluid_cells

    props = PhysicalProperties()
    controls = SolverControls(use_pallas=jax.default_backend() == "tpu")
    step = make_step(geom, props, controls)
    multi = jax.jit(make_multi_step(step, chunk))
    params = CaseParams.make(R=R, freq=freq, duration=20.0)
    state = init_state(geom, dt0=1e-3)

    # Warmup: compile + let the adaptive dt settle to its CFL level.
    state, diag = multi(state, params)
    jax.block_until_ready(state)
    for _ in range(2 if small else 4):
        state, diag = multi(state, params)
    jax.block_until_ready(state)

    t_start = float(np.asarray(state.t))
    wall0 = time.perf_counter()
    done = 0
    while done < n_steps:
        state, diag = multi(state, params)
        done += chunk
    jax.block_until_ready(state)
    wall = time.perf_counter() - wall0
    t_end = float(np.asarray(state.t))

    cell_updates_per_sec = n_cells * done / wall
    sim_rate = (t_end - t_start) / wall                 # sim-seconds per wall-second
    period = 1.0 / freq
    secs_per_period = period / max(sim_rate, 1e-30)
    mcell_s_per_wall_s = (n_cells / 1e6) * sim_rate

    # Baseline: the reference's calibrated cost model at its 32-core job cap
    # — 80 cpu-hours per (Mcell·s simulated) ⇒ 32/(80·3600) Mcell·s of
    # simulation progress per wall-second (/root/reference/main.py:205-226).
    baseline_mcell_s = 32.0 / (80.0 * 3600.0)
    result = {
        "metric": "simulated Mcell*s per wall-second, 1 chip (~1M-cell VoF)",
        "value": round(mcell_s_per_wall_s, 5),
        "unit": "Mcell*s/wall-s",
        "vs_baseline": round(mcell_s_per_wall_s / baseline_mcell_s, 1),
        "detail": {
            "cell_updates_per_sec": round(cell_updates_per_sec, 1),
            "fluid_cells": n_cells,
            "grid": list(geom.shape),
            "steps_timed": done,
            "wall_seconds": round(wall, 3),
            "mean_dt": round((t_end - t_start) / done, 6),
            "sim_seconds_per_wall_second": round(sim_rate, 5),
            "wall_seconds_per_shaking_period": round(secs_per_period, 2),
            "baseline_mcell_s_per_wall_s_32core": round(baseline_mcell_s, 6),
            "device": str(jax.devices()[0]),
            "final_courant": float(np.asarray(diag.courant)),
            "p_iters_last": int(np.asarray(diag.p_iters)),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if os.environ.get("BENCH_SWEEP") == "1":
        bench_sweep()
    else:
        main()
