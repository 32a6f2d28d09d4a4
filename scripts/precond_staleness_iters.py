"""Measure CG-iteration inflation from a K-step-stale MG preconditioner.

The amortized preconditioner (SolverControls.precond_refresh, commit
52a6e3a) trades the per-step bf16 hierarchy build for whatever extra CG
iterations a stale hierarchy costs. Wall-clock needs the TPU, but the
ITERATION counts are platform-independent (the fused kernels are
bit-compatible with the jnp path to test tolerance) — so the staleness
side of the trade is measured here on CPU: run the same forced-sloshing
trajectory at several K and compare per-step p_iters.

Usage:  python scripts/precond_staleness_iters.py [mesh] [t_end]
Writes a JSON summary to stdout.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax
    import jax.numpy as jnp
    import numpy as np

    from openfoam_tpp_tpu.config import PhysicalProperties, SolverControls
    from openfoam_tpp_tpu.core.state import CaseParams, init_state
    from openfoam_tpp_tpu.mesh import build_tank_geometry
    from openfoam_tpp_tpu.solver.timestep import make_step
    from openfoam_tpp_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    mesh = float(sys.argv[1]) if len(sys.argv) > 1 else 0.006
    t_end = float(sys.argv[2]) if len(sys.argv) > 2 else 0.8

    # Flagship operating point (near-resonant f=1.88) scaled to a
    # CPU-tractable grid; 0.05 s ramp so the interface moves almost from
    # t=0 (ramp=0 makes the analytic orbit acceleration singular).
    geom = build_tank_geometry(H=0.208, D=0.2, mesh=mesh, geo="flat")
    print(f"# grid {geom.shape}, {geom.n_fluid_cells} fluid cells",
          file=sys.stderr)
    params = CaseParams.make(R=0.004, freq=1.88, duration=t_end, ramp=0.05)

    results = {}
    for K in (1, 4, 8, 16):
        controls = SolverControls(precond_refresh=K)
        step = make_step(geom, PhysicalProperties(), controls,
                         carry_precond=True)

        @jax.jit
        def advance_chunk(carry, n=20):
            def body(c, _):
                s, b = c
                s2, d, b2 = step(s, params, precond=b)
                return (s2, b2), (d.p_iters, d.p_residual)

            return jax.lax.scan(body, carry, None, length=n)

        state = init_state(geom, dt0=1e-3)
        carry = (state, jax.jit(step.init_precond)(state))
        iters, resid = [], []
        while float(np.asarray(carry[0].t)) < t_end:
            carry, (it, rs) = advance_chunk(carry)
            iters.append(np.asarray(it))
            resid.append(np.asarray(rs))
        it = np.concatenate(iters)
        vals, counts = np.unique(it, return_counts=True)
        results[K] = {
            "steps": int(it.size),
            "mean_iters": round(float(it.mean()), 3),
            "max_iters": int(it.max()),
            "hist": {int(v): int(c) for v, c in zip(vals, counts)},
            "max_resid": float(np.concatenate(resid).max()),
        }
        print(f"# K={K}: mean {results[K]['mean_iters']} max "
              f"{results[K]['max_iters']} over {it.size} steps",
              file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
