"""Differential step-cost breakdown on the real steady checkpoint.

Times the FULL fused step, then variants with one phase structurally
removed (CG pinned to 0 iterations, limiter iterations 0, subcycles 1,
momentum kernel off, dev2 off, correctors 0 -> no solve at all), all
from the same steady state. The difference full - variant is the
*marginal in-program* cost of that phase — unlike isolated phase jits
(scripts/phase_timing.py), this accounts for XLA cross-phase fusion.
XLA dead-code-elimination can make a variant cheaper than the phase's
true cost (downstream consumers vanish too); read deltas as upper
bounds on what deleting the phase could save.
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

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
base = SolverControls(use_pallas=jax.default_backend() == "tpu")
params = CaseParams.make(R=0.004, freq=1.88, duration=20.0)

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".bench_cache", "steady_112x112x112_t16.npz")
if not os.path.exists(cache):
    sys.exit(f"missing steady checkpoint {cache} — run `python bench.py` "
             "once to produce it")
state = uio.to_state(uio.load_checkpoint(cache))


def timeit(name, controls, n=60, ref=None):
    step = jax.jit(make_step(geom, props, controls))
    out = step(state, params)
    jax.block_until_ready(out)
    for _ in range(5):
        out = step(state, params)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = step(state, params)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / n * 1e3
    extra = f"   (delta {ref - ms:+7.3f} ms)" if ref is not None else ""
    iters = int(np.asarray(out[1].p_iters))
    print(f"{name:34s} {ms:8.3f} ms  p_iters={iters}{extra}")
    return ms


full = timeit("FULL STEP", base)
timeit("  p_max_iters=0 (no CG loop)",
       dataclasses.replace(base, p_max_iters=0), ref=full)
timeit("  n_correctors=0 -> 1? (min 1)",
       dataclasses.replace(base, n_correctors=1), ref=full)
timeit("  n_limiter_iters=0 (no FCT)",
       dataclasses.replace(base, n_limiter_iters=0), ref=full)
timeit("  n_alpha_subcycles=1",
       dataclasses.replace(base, n_alpha_subcycles=1), ref=full)
timeit("  mom_pallas off (jnp momentum)",
       dataclasses.replace(base, mom_pallas=False), ref=full)
timeit("  dev2 off", dataclasses.replace(base, dev2_stress=False), ref=full)
timeit("  c_alpha=0 (no compression)",
       dataclasses.replace(base, c_alpha=0.0), ref=full)
timeit("  fct_bf16 off",
       dataclasses.replace(base, fct_bf16=False), ref=full)
