"""Benchmark: full VoF step throughput on one TPU chip at ~1M fluid cells.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The PRIMARY window is steady state (t >= BENCH_STEADY_T, default 16 s —
past the 2 s forcing ramp and the resonant growth, where the adaptive dt
is CFL-limited by real wave speeds and the pressure solve works hardest).
The early-transient window (the r1 headline) is reported in `detail` for
comparison. The steady-state warmup is advanced once and cached under
.bench_cache/ so repeated runs skip it.

Baseline: the reference's calibrated CPU cost model — 80 cpu-hours per
(Mcell·s simulated) ≈ 3.5 cell-updates/µs/core aggregate, at its 32-core
job cap → 1.11e-4 Mcell·s/wall-s (/root/reference/main.py:205-226;
BASELINE.md). "Cell-update" = one full solver step of one fluid cell
(alpha MULES subcycles + momentum + MG-CG pressure solve included).

Env knobs: BENCH_SMALL=1 for a CPU-sized smoke run; BENCH_STEPS,
BENCH_MESH, BENCH_STEADY_T, BENCH_CASES, BENCH_SWEEP=1 overrides.
"""

import json
import os
import time

import numpy as np

_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".bench_cache")


def _time_window(multi, state, params, n_steps, chunk):
    """Advance `n_steps` (in `chunk`-step jitted chunks), timed.
    Collects per-step pressure-iteration counts for the histogram.
    `state` is the carry pytree; element [0] must be the SimState."""
    import jax

    t0 = float(np.asarray(state[0].t))
    wall0 = time.perf_counter()
    done = 0
    diag = None
    iters_chunks = []
    while done < n_steps:
        state, diag, p_iters = multi(state, params)
        iters_chunks.append(p_iters)
        done += chunk
    jax.block_until_ready(state)
    wall = time.perf_counter() - wall0
    t1 = float(np.asarray(state[0].t))
    it = np.concatenate([np.asarray(c) for c in iters_chunks])
    vals, counts = np.unique(it, return_counts=True)
    return state, diag, {
        "steps": done,
        "wall_seconds": round(wall, 3),
        "sim_seconds": round(t1 - t0, 6),
        "mean_dt": round((t1 - t0) / done, 6),
        "sim_seconds_per_wall_second": round((t1 - t0) / wall, 5),
        "p_iters_hist": {int(v): int(c) for v, c in zip(vals, counts)},
    }


def bench_sweep():
    """Sweep-throughput benchmark: N (f, R) cases vmapped on one chip —
    the reference farms these as N independent Slurm jobs
    (/root/reference/main.py:599-608); here one jitted batched step
    advances all of them (BASELINE.json "100+ cases/chip" north star).

    The batch axis is TRAILING (axis=-1): TPU tiles the two minor dims to
    (8, 128), so small per-case grids with the case axis minor vectorize
    across lanes instead of padding nz up to 128 (the r1 sweep-throughput
    regression)."""
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from openfoam_tpp_tpu.config import PhysicalProperties, SolverControls
    from openfoam_tpp_tpu.mesh import build_tank_geometry
    from openfoam_tpp_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    from openfoam_tpp_tpu.parallel.sweep import (
        batch_params,
        batch_states,
        make_sweep_step,
    )

    n_cases = int(os.environ.get("BENCH_CASES", "128"))
    mesh = float(os.environ.get("BENCH_MESH", "0.002"))
    n_steps = int(os.environ.get("BENCH_STEPS", "20"))
    axis = int(os.environ.get("BENCH_AXIS", "-1"))
    tiled = os.environ.get("BENCH_TILED", "0") == "1"
    # Default-case geometry (DEFAULTS: H=0.1, D=0.02). round_to=4 keeps
    # the box tight around the cylinder (fill factor 0.55 vs 0.31 at 8 —
    # the vmapped path needs no tile alignment; measured layouts in
    # docs/ROADMAP.md).
    round_to = int(os.environ.get("BENCH_ROUND", "8" if tiled else "4"))
    geom = build_tank_geometry(H=0.1, D=0.02, mesh=mesh, geo="flat",
                               round_to=round_to)
    n_cells = geom.n_fluid_cells

    rows = [
        {"R": 0.002 + 2e-5 * i, "freq": 1.5 + 0.01 * i, "duration": 10.0}
        for i in range(n_cases)
    ]
    params = batch_params(rows)
    if tiled:
        # Merged-grid layout (parallel/tiled_sweep.py): one big x-tiled
        # grid, zero-aperture junctions — full single-case efficiency.
        from openfoam_tpp_tpu.parallel.tiled_sweep import (
            make_tiled_sweep_step,
            tile_state,
        )

        sweep_step = make_tiled_sweep_step(
            geom, n_cases, PhysicalProperties(),
            SolverControls(use_pallas=jax.default_backend() == "tpu"))
        states = tile_state(geom, n_cases)
    else:
        sweep_step = make_sweep_step(geom, PhysicalProperties(),
                                     SolverControls(), axis=axis)
        states = batch_states(geom, n_cases, axis=axis)

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

    t0 = float(np.asarray(states.t.ravel()[0]))
    wall0 = time.perf_counter()
    done = 0
    while done < n_steps:
        states = advance(states, params)
        done += 5
    jax.block_until_ready(states)
    wall = time.perf_counter() - wall0
    t1 = float(np.asarray(states.t.ravel()[0]))

    updates = n_cells * n_cases * done / wall
    sim_rate = (t1 - t0) / wall
    layout = "tiled" if tiled else "vmapped"
    # Fill-factor-normalized rate: the batched step streams the PADDED
    # box (a cylinder inscribed in a rounded rectangle — the padding is a
    # geometry property, not a batching overhead). The padded-cell rate
    # is the apples-to-apples comparison against the single-case bench;
    # the headline stays honest fluid-cell updates.
    padded_cells = int(np.prod(geom.shape))
    fill = n_cells / padded_cells
    result = {
        "metric": f"sweep cell-updates/sec/chip ({n_cases} {layout} cases)",
        "value": round(updates, 1),
        "unit": "cell-updates/s",
        "vs_baseline": round(updates / 1.12e8, 2),
        "detail": {
            "n_cases": n_cases,
            "cells_per_case": n_cells,
            "grid": list(geom.shape),
            "fluid_fill_factor": round(fill, 4),
            "padded_cell_updates_per_sec": round(updates / fill, 1),
            "layout": layout,
            "batch_axis": axis,
            "steps_timed": done,
            "wall_seconds": round(wall, 3),
            "sim_seconds_per_wall_second": round(sim_rate, 5),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


def main():
    import jax

    # Site plugins (the axon TPU tunnel) force jax_platforms at import;
    # re-assert an explicit JAX_PLATFORMS so CPU smoke runs work.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from openfoam_tpp_tpu.config import PhysicalProperties, SolverControls
    from openfoam_tpp_tpu.core.state import CaseParams, init_state
    from openfoam_tpp_tpu.mesh import build_tank_geometry
    from openfoam_tpp_tpu.solver.timestep import make_step
    from openfoam_tpp_tpu.utils import io as uio
    from openfoam_tpp_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    small = os.environ.get("BENCH_SMALL") == "1"
    # Production-case geometry (case_H0.208_D0.2_flat_R0.004_f1.88) at a
    # resolution giving ~1e6 fluid cells (BASELINE.json north star).
    mesh = float(os.environ.get("BENCH_MESH", "0.0085" if small else "0.00185"))
    # Steady window >= 200 steps (~2 s wall): long enough that run-to-run
    # wobble and per-step p_iters variation average out (VERDICT r2 #5).
    n_steps = int(os.environ.get("BENCH_STEPS", "4" if small else "200"))
    n_early = min(n_steps, 40)
    t_steady = float(os.environ.get("BENCH_STEADY_T", "2" if small else "16"))
    chunk = 2 if small else 5

    H, D, freq, R = 0.208, 0.2, 1.88, 0.004
    geom = build_tank_geometry(H=H, D=D, mesh=mesh, geo="flat", round_to=8)
    n_cells = geom.n_fluid_cells

    props = PhysicalProperties()
    controls = SolverControls(
        use_pallas=jax.default_backend() == "tpu",
        precond_refresh=int(os.environ.get("OFTPP_PRECOND_REFRESH", "1")),
        p_tol_rel_b=float(os.environ["OFTPP_P_TOL_REL_B"])
        if "OFTPP_P_TOL_REL_B" in os.environ else
        SolverControls.p_tol_rel_b,
    )
    # BENCH_SPMD=N: run the per-shard-kernel shard_map path on an
    # N-device x mesh (parallel/spmd.py). N=1 on the single real chip is
    # the VERDICT-r4 A/B: per-chip rate of the sharded step with halo
    # rings vs the plain fused path (the ppermutes are no-ops at N=1, so
    # any gap is pure island/wrapper overhead).
    spmd_ctx = None
    n_spmd = int(os.environ.get("BENCH_SPMD", "0"))
    if n_spmd > 0:
        from openfoam_tpp_tpu.parallel.sharding import make_mesh
        from openfoam_tpp_tpu.parallel.spmd import SpmdCtx

        spmd_ctx = SpmdCtx(mesh=make_mesh(n_spmd),
                           interpret=jax.default_backend() != "tpu")
        controls = SolverControls(
            use_pallas=True, precond_refresh=controls.precond_refresh,
            p_tol_rel_b=controls.p_tol_rel_b)
    step = make_step(geom, props, controls, carry_precond=True,
                     spmd=spmd_ctx)
    params = CaseParams.make(R=R, freq=freq, duration=20.0)

    def multi_fn(carry, params):
        def body(c, _):
            s, b = c
            s2, d, b2 = step(s, params, precond=b)
            return (s2, b2), d

        final, diags = jax.lax.scan(body, carry, None, length=chunk)
        last = jax.tree.map(lambda a: a[-1], diags)
        return final, last, diags.p_iters

    multi = jax.jit(multi_fn)
    init_precond = jax.jit(step.init_precond)

    def fresh_carry(s):
        """(SimState, preconditioner bundle) — the loop carry."""
        return (s, init_precond(s))

    # --- early-transient window (the r1 metric, kept for comparison) ---
    state = fresh_carry(init_state(geom, dt0=1e-3))
    state, diag, _ = multi(state, params)    # compile + settle dt
    jax.block_until_ready(state)
    for _ in range(2 if small else 4):
        state, diag, _ = multi(state, params)
    jax.block_until_ready(state)
    state, _, early = _time_window(multi, state, params, n_early, chunk)

    # --- steady-state warmup (cached): advance to t >= t_steady ---
    os.makedirs(_CACHE_DIR, exist_ok=True)
    tag = "x".join(map(str, geom.shape))
    cache = os.path.join(_CACHE_DIR, f"steady_{tag}_t{t_steady:g}.npz")
    if os.path.exists(cache):
        state = fresh_carry(uio.to_state(uio.load_checkpoint(cache)))
    else:
        wall0 = time.perf_counter()
        while float(np.asarray(state[0].t)) < t_steady:
            state, _, _ = multi(state, params)
        jax.block_until_ready(state)
        warm_wall = time.perf_counter() - wall0
        np_state = state[0]
        uio.save_checkpoint(os.path.dirname(cache) or ".", np_state)
        # save_checkpoint names by time; rename to the cache key.
        t_got = float(np.asarray(np_state.t))
        os.replace(
            os.path.join(os.path.dirname(cache), f"chk_t{t_got:.6f}.npz"),
            cache,
        )
        print(f"# steady-state warmup to t={t_got:.3f} s took "
              f"{warm_wall:.1f} s wall", flush=True)

    for _ in range(2 if small else 4):       # re-warm the timed program
        state, diag, _ = multi(state, params)
    jax.block_until_ready(state)

    # >= 3 consecutive steady windows: past A/Bs showed +-5% run-to-run
    # wobble (docs/ROADMAP.md 3b), the same size as the margins being
    # chased — report mean +- sigma so deltas inside the noise band are
    # visible as such (VERDICT r4 item 5; scripts/ab_compare.py consumes
    # the per-window rates).
    n_windows = int(os.environ.get("BENCH_WINDOWS", "1" if small else "3"))
    windows = []
    for _ in range(n_windows):
        state, diag, win = _time_window(multi, state, params, n_steps, chunk)
        windows.append(win)
    rates = np.array([w["sim_seconds_per_wall_second"] for w in windows])
    steady = windows[-1]

    sim_rate = float(rates.mean())
    sim_rate_std = float(rates.std(ddof=1)) if n_windows > 1 else 0.0
    period = 1.0 / freq
    mcell_s_per_wall_s = (n_cells / 1e6) * sim_rate
    cell_updates_per_sec = float(np.mean(
        [n_cells * w["steps"] / max(w["wall_seconds"], 1e-9)
         for w in windows]))

    # Baseline: the reference's calibrated cost model at its 32-core job cap
    # — 80 cpu-hours per (Mcell·s simulated) ⇒ 32/(80·3600) Mcell·s of
    # simulation progress per wall-second (/root/reference/main.py:205-226).
    baseline_mcell_s = 32.0 / (80.0 * 3600.0)
    result = {
        "metric": ("simulated Mcell*s per wall-second, 1 chip, steady state "
                   f"(t>{t_steady:g}s, ~1M-cell VoF)"),
        "value": round(mcell_s_per_wall_s, 5),
        "value_std": round((n_cells / 1e6) * sim_rate_std, 7),
        "unit": "Mcell*s/wall-s",
        "vs_baseline": round(mcell_s_per_wall_s / baseline_mcell_s, 1),
        "detail": {
            "cell_updates_per_sec": round(cell_updates_per_sec, 1),
            "fluid_cells": n_cells,
            "grid": list(geom.shape),
            "n_steady_windows": n_windows,
            "window_sim_rates": [round(float(r), 5) for r in rates],
            "sim_rate_mean": round(sim_rate, 5),
            "sim_rate_std": round(sim_rate_std, 5),
            "steady_window": steady,
            "early_transient_window": early,
            "wall_seconds_per_shaking_period": round(
                period / max(sim_rate, 1e-30), 2),
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
