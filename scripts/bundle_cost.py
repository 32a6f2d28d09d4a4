"""In-program cost of the per-step MG-bundle rebuild (make_bundle).

Isolated jits of make_bundle overstate its cost (outputs that stay
fused/DCE'd in the real step get materialized as program results —
scripts/phase_timing.py's sum check). This measures it differentially
inside the REAL fused multi-step program: pin CG to a fixed iteration
count (tol 0, max_iters=N, so the pressure work is bitwise-identical
per step regardless of preconditioner staleness), then time the same
window with precond_refresh=1 (rebuild every step) vs a refresh period
longer than the window (never rebuild). The wall-clock difference IS
the in-program bundle build cost.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from openfoam_tpp_tpu.config import PhysicalProperties, SolverControls
from openfoam_tpp_tpu.core.state import CaseParams
from openfoam_tpp_tpu.mesh import build_tank_geometry
from openfoam_tpp_tpu.solver.timestep import make_step
from openfoam_tpp_tpu.utils import io as uio
from openfoam_tpp_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

mesh = float(os.environ.get("BENCH_MESH", "0.00185"))
geom = build_tank_geometry(H=0.208, D=0.2, mesh=mesh, geo="flat", round_to=8)
props = PhysicalProperties()
params = CaseParams.make(R=0.004, freq=1.88, duration=20.0)

# The steady-state checkpoint is produced by bench.py (it caches the
# spun-up flagship state keyed by the grid shape); the filename must track
# BENCH_MESH or a non-default mesh would silently time the wrong state.
_shape = "x".join(str(s) for s in geom.shape)
cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".bench_cache", f"steady_{_shape}_t16.npz")
if not os.path.exists(cache):
    sys.exit(
        f"missing steady-state cache {cache!r} — run `python bench.py` "
        f"(with BENCH_MESH={mesh:g}) first; it spins up and caches the "
        "steady flagship state this script times against")
state0 = uio.to_state(uio.load_checkpoint(cache))

N_ITERS = int(os.environ.get("FIXED_ITERS", "10"))
STEPS = int(os.environ.get("STEPS", "200"))
CHUNK = 5


def run(refresh):
    controls = SolverControls(
        use_pallas=jax.default_backend() == "tpu",
        precond_refresh=refresh,
        p_tol_rel=0.0, p_tol_abs=0.0, p_tol_rel_b=0.0,
        p_max_iters=N_ITERS,
    )
    step = make_step(geom, props, controls, carry_precond=True)

    @jax.jit
    def multi(carry, params):
        def body(c, _):
            s, b = c
            s2, d, b2 = step(s, params, precond=b)
            return (s2, b2), d

        final, diags = jax.lax.scan(body, carry, None, length=CHUNK)
        return final, jax.tree.map(lambda a: a[-1], diags)

    carry = (state0, jax.jit(step.init_precond)(state0))
    carry, diag = multi(carry, params)
    jax.block_until_ready(carry)
    for _ in range(4):
        carry, diag = multi(carry, params)
    jax.block_until_ready(carry)
    t0 = time.perf_counter()
    done = 0
    while done < STEPS:
        carry, diag = multi(carry, params)
        done += CHUNK
    jax.block_until_ready(carry)
    wall = time.perf_counter() - t0
    ms = wall / done * 1e3
    print(f"refresh={refresh:>6d}: {ms:7.3f} ms/step "
          f"(p_iters={int(np.asarray(diag.p_iters))}, fixed)")
    return ms


a = run(1)
b = run(10 ** 6)
print(f"bundle build in-program ~ {a - b:.3f} ms/step "
      f"({(a - b) / a * 100:.1f}% of the step at K=1)")
