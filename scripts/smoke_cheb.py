"""TPU smoke + timing for the fused degree-2 Chebyshev smoother kernels.

Runs the V-cycle preconditioner and the full MG-CG solve at the cached
steady-state operating point; compare with OFTPP_FUSED_CHEB=0/1 across
two invocations (the knob is read at import).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from openfoam_tpp_tpu.config import PhysicalProperties, SolverControls
from openfoam_tpp_tpu.core.state import mixture_density
from openfoam_tpp_tpu.mesh import build_tank_geometry
from openfoam_tpp_tpu.ops import stencil as st
from openfoam_tpp_tpu.solver import poisson
from openfoam_tpp_tpu.solver.timestep import geometry_arrays
from openfoam_tpp_tpu.utils import io as uio
from openfoam_tpp_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

geom = build_tank_geometry(H=0.208, D=0.2, mesh=0.00185, geo="flat",
                           round_to=8)
props = PhysicalProperties()
controls = SolverControls(use_pallas=jax.default_backend() == "tpu")

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".bench_cache", "steady_112x112x112_t16.npz")
state = uio.to_state(uio.load_checkpoint(cache))
ga = geometry_arrays(geom)
spacing = tuple(float(s) for s in geom.spacing)
fluid = ga["vfrac"] > 0.0
rho = mixture_density(state.alpha, props)
prob = poisson.build_poisson(ga, spacing, rho, ga["top_open"],
                             use_pallas=controls.use_pallas)
phi_star = (ga["ax"] * state.u, ga["ay"] * state.v, ga["az"] * state.w)
b = jnp.where(fluid, -st.divergence(*phi_star, spacing) / state.dt, 0.0)
b_hat = prob.scale * b


def timeit(name, fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:18s} {ms:8.3f} ms", flush=True)
    return out


@jax.jit
def run_solve(b, p0):
    return poisson.solve_pcg(prob, b, p0, tol_rel=controls.p_tol_rel,
                             tol_abs=controls.p_tol_abs,
                             max_iters=controls.p_max_iters)


print(f"backend={jax.default_backend()}  "
      f"FUSED_CHEB={os.environ.get('OFTPP_FUSED_CHEB', '1')}", flush=True)
z = timeit("precond_hat", jax.jit(prob.precond_hat), b_hat)
print(f"  |z| = {float(jnp.linalg.norm(z.astype(jnp.float32))):.6e}")
dp, res, iters = timeit("full solve", run_solve, b, state.p, n=20)
print(f"  iters={int(np.asarray(iters))}  res={float(np.asarray(res)):.3e}  "
      f"|dp|={float(jnp.linalg.norm(dp)):.6e}")
