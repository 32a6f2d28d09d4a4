"""Preconditioner tuning probe for the steady-state pressure solve.

Captures the EXACT (b, x0, rho) of the flagship production solve — one
real solver step from the cached steady state (.bench_cache/) with
solve_pcg/build_poisson spied via jax.debug.callback — then replays
solve_pcg under the current OFTPP_* preconditioner knobs and reports the
iteration count.  Iteration counts are hardware-independent, so the
sweep runs on CPU; per-iteration *cost* must then be weighed on TPU
(scripts/phase_timing.py).

Usage:
    python scripts/cg_tuning.py capture        # once: writes /tmp/cg_probe.npz
    OFTPP_SMOOTH_SWEEPS=3 python scripts/cg_tuning.py replay
    python scripts/cg_tuning.py sweep          # capture + canned config matrix
"""

import json
import os
import subprocess
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax  # noqa: E402

# The sitecustomize TPU plugin force-sets jax_platforms after import;
# the env var alone does not stick (see tests/conftest.py).
jax.config.update("jax_platforms", "cpu")

PROBE = "/tmp/cg_probe.npz"
STEADY = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                      ".bench_cache", "steady_112x112x112_t16.npz")

GEOM = dict(H=0.208, D=0.2, mesh=0.00185, geo="flat", round_to=8)


def _build_geom():
    from openfoam_tpp_tpu.mesh import build_tank_geometry

    return build_tank_geometry(**GEOM)


def capture():
    import numpy as np
    import jax

    from openfoam_tpp_tpu.config import PhysicalProperties, SolverControls
    from openfoam_tpp_tpu.core.state import CaseParams
    from openfoam_tpp_tpu.solver import poisson, timestep
    from openfoam_tpp_tpu.utils import io as uio

    geom = _build_geom()
    state = uio.to_state(uio.load_checkpoint(STEADY))
    got = {}

    def _stash_solve(b, x0):
        got["b"] = np.asarray(b)
        got["x0"] = np.asarray(x0)

    def _stash_rho(rho):
        got["rho"] = np.asarray(rho)

    orig_solve = poisson.solve_pcg
    orig_build = poisson.build_operator

    def spy_solve(problem, b, x0, **kw):
        jax.debug.callback(_stash_solve, b, x0)
        return orig_solve(problem, b, x0, **kw)

    def spy_build(geom_arrays, spacing, rho, top_open, **kw):
        # The step builds through the split API (build_operator +
        # make_bundle), not build_poisson.
        jax.debug.callback(_stash_rho, rho)
        return orig_build(geom_arrays, spacing, rho, top_open, **kw)

    poisson.solve_pcg = spy_solve
    poisson.build_operator = spy_build
    try:
        step = timestep.make_step(geom, PhysicalProperties(),
                                  SolverControls())
        params = CaseParams.make(R=0.004, freq=1.88, duration=20.0)
        new_state, diag = jax.jit(step)(state, params)
        jax.block_until_ready(new_state)
    finally:
        poisson.solve_pcg = orig_solve
        poisson.build_operator = orig_build

    np.savez_compressed(PROBE, **got)
    print(f"captured b/x0/rho -> {PROBE}  "
          f"(production p_iters={int(diag.p_iters)}, "
          f"res={float(diag.p_residual):.3e})")


def replay():
    import time

    import numpy as np
    import jax

    from openfoam_tpp_tpu.solver import poisson
    from openfoam_tpp_tpu.solver.timestep import geometry_arrays

    d = np.load(PROBE)
    geom = _build_geom()
    ga = geometry_arrays(geom)
    spacing = geom.spacing

    prob = poisson.build_poisson(ga, spacing, d["rho"], ga["top_open"],
                                 use_pallas=False)

    @jax.jit
    def solve(b, x0):
        return poisson.solve_pcg(prob, b, x0, tol_rel=1e-3, tol_abs=1e-8,
                                 max_iters=50)

    x, res, iters = solve(d["b"], d["x0"])
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    x, res, iters = solve(d["b"], d["x0"])
    jax.block_until_ready(x)
    wall = time.perf_counter() - t0
    knobs = {k: v for k, v in os.environ.items() if k.startswith("OFTPP_")}
    print(json.dumps({"iters": int(iters), "res": float(res),
                      "cpu_wall_s": round(wall, 2), "knobs": knobs}))


CONFIGS = [
    {},                                             # baseline: cheb2 V bf16
    {"OFTPP_SMOOTH_SWEEPS": "3"},
    {"OFTPP_SMOOTH_SWEEPS": "4"},
    {"OFTPP_CHEB_LMIN": "0.15"},
    {"OFTPP_CHEB_LMIN": "0.35"},
    # (OFTPP_MG_GAMMA W-cycle arms removed: measured 38% slower on the
    # r3 TPU A/B despite halving p_iters; the knob was deleted.)
    {"OFTPP_PRECOND_F32": "1"},
    {"OFTPP_SMOOTHER": "jacobi"},
    {"OFTPP_COARSEST_SWEEPS": "48"},
]


def sweep():
    if not os.path.exists(PROBE):
        capture()
    for cfg in CONFIGS:
        env = dict(os.environ, **cfg)
        tag = " ".join(f"{k.removeprefix('OFTPP_')}={v}"
                       for k, v in cfg.items()) or "baseline"
        print(f"--- {tag}", flush=True)
        subprocess.run([sys.executable, __file__, "replay"], env=env,
                       check=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "sweep"
    {"capture": capture, "replay": replay, "sweep": sweep}[mode]()
