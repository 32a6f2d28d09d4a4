"""A/B the pressure-solve stopping criterion: r0-relative only (legacy)
vs with the OpenFOAM-normFactor-style ||b||-floor (SolverControls.p_tol_rel_b).

The reference's fvSolution tolerances are ABSOLUTE on the normalized
residual (/root/reference/circularSloshingTank/system/fvSolution:42-66),
so its warm-started steady-state solves stop as soon as the residual is
small relative to the problem scale. Our legacy criterion (tol_rel * r0
with r0 the warm-started residual) instead demands a fixed 1e3 reduction
every step even when the start is already converged — pure iteration
waste at steady state, where ||r0|| << ||b||.

Protocol (platform-independent: CG iteration counts, not wall time):
  1. run a coarsened flagship (same geometry/forcing as bench.py, mesh
     4x coarser) from rest to quasi-steady t=T0 under the LEGACY
     criterion — the common snapshot;
  2. from that snapshot, advance N_AB steps under each criterion
     variant; record p_iters, div_error and the final interface
     heightfield;
  3. report mean p_iters, worst div_error, and the max interface height
     deviation from the legacy variant (in % of fill depth).

Run on CPU:  JAX_PLATFORMS=cpu python -u scripts/tol_criterion_study.py
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")  # axon plugin clobbers the env var

import jax.numpy as jnp

from openfoam_tpp_tpu.config import PhysicalProperties, SolverControls
from openfoam_tpp_tpu.core.state import CaseParams, init_state
from openfoam_tpp_tpu.mesh import build_tank_geometry
from openfoam_tpp_tpu.solver.timestep import make_step
from openfoam_tpp_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

MESH = float(os.environ.get("STUDY_MESH", "0.0074"))  # 4x coarser flagship
T0 = float(os.environ.get("STUDY_T0", "10.0"))        # spin-up horizon [s]
N_AB = int(os.environ.get("STUDY_STEPS", "400"))      # A/B window [steps]
VARIANTS = {
    "legacy(rel_b=0)": 0.0,
    "rel_b=3e-5": 3e-5,
    "rel_b=1e-4": 1e-4,
    "rel_b=3e-4": 3e-4,
    "rel_b=1e-3": 1e-3,
}

geom = build_tank_geometry(H=0.208, D=0.2, mesh=MESH, geo="flat", round_to=8)
props = PhysicalProperties()
params = CaseParams.make(R=0.004, freq=1.88, duration=max(T0 + 2.0, 20.0))
print(f"grid {geom.shape} = {int(np.prod(geom.shape))} cells, "
      f"backend {jax.default_backend()}", flush=True)


def make(controls):
    step = make_step(geom, props, controls)
    return jax.jit(lambda s, p: step(s, p))


def mean_interface_z(alpha, vfrac, dz):
    """Water column height per (x, y) — the heightfield the golden
    compare scores (post/interface.py column fast path)."""
    col = jnp.sum(alpha * vfrac, axis=2) * dz
    return col


base_controls = SolverControls()
step_base = make(base_controls)

state = init_state(geom)
t_start = time.time()
n = 0
while float(state.t) < T0:
    state, diag = step_base(state, params)
    n += 1
    if n % 500 == 0:
        print(f"  spin-up t={float(state.t):.3f}s after {n} steps "
              f"({time.time()-t_start:.0f}s wall)", flush=True)
state = jax.block_until_ready(state)
print(f"spin-up done: t={float(state.t):.3f}s, {n} steps, "
      f"{time.time()-t_start:.0f}s wall", flush=True)

dz = float(geom.spacing[2])
results = {}
eta_ref = None
depth = 0.5 * 0.208  # fill depth H/2

for name, rel_b in VARIANTS.items():
    controls = dataclasses.replace(base_controls, p_tol_rel_b=rel_b)
    stepv = make(controls)
    s = state
    iters, divs, resids = [], [], []
    t0 = time.time()
    for _ in range(N_AB):
        s, d = stepv(s, params)
        iters.append(int(d.p_iters))
        divs.append(float(d.div_error))
        resids.append(float(d.p_residual))
    s = jax.block_until_ready(s)
    eta = np.asarray(mean_interface_z(s.alpha, jnp.asarray(geom.vfrac), dz))
    if eta_ref is None:
        eta_ref = eta
        dev = 0.0
    else:
        dev = float(np.max(np.abs(eta - eta_ref))) / depth * 100.0
    results[name] = (np.mean(iters), np.max(divs), np.mean(resids), dev)
    print(f"{name:18s} p_iters mean {np.mean(iters):5.2f} "
          f"(min {min(iters)} max {max(iters)}), div_err max {max(divs):.3e}, "
          f"p_res mean {np.mean(resids):.3e}, "
          f"eta dev vs legacy {dev:.4f}% of depth "
          f"[{time.time()-t0:.0f}s wall]", flush=True)

base_it = results["legacy(rel_b=0)"][0]
print("\nsummary (iteration cut vs legacy):")
for name, (it, dv, res, dev) in results.items():
    print(f"  {name:18s} {it:5.2f} iters ({100*(1-it/base_it):+.1f}%), "
          f"eta dev {dev:.4f}%")
