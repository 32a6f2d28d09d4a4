"""Per-phase wall timing of the flagship step on the current backend.

Times each solver phase as its own jitted program from the cached
steady-state checkpoint (.bench_cache/steady_112x112x112_t16.npz):
  - mules      : alpha advection (3 subcycles, 3 limiter iters)
  - momentum   : explicit conservative momentum (visc - conv + dev2)
  - poisson_build : operator + MG hierarchy construction
  - pcg        : the MG-CG solve at the step's real RHS/x0
  - full_step  : the whole fused step for reference

Phase sums will not exactly equal the full step (XLA fuses across phase
boundaries inside the real step), but the ranking is what matters.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from openfoam_tpp_tpu.config import PhysicalProperties, SolverControls
from openfoam_tpp_tpu.core.state import CaseParams, mixture_density, mixture_viscosity
from openfoam_tpp_tpu.mesh import build_tank_geometry
from openfoam_tpp_tpu.ops import mules
from openfoam_tpp_tpu.ops import stencil as st
from openfoam_tpp_tpu.solver import momentum as mom
from openfoam_tpp_tpu.solver import poisson
from openfoam_tpp_tpu.solver.timestep import geometry_arrays, make_step
from openfoam_tpp_tpu.utils import io as uio
from openfoam_tpp_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

mesh = float(os.environ.get("BENCH_MESH", "0.00185"))
geom = build_tank_geometry(H=0.208, D=0.2, mesh=mesh, geo="flat", round_to=8)
props = PhysicalProperties()
controls = SolverControls(use_pallas=jax.default_backend() == "tpu")
params = CaseParams.make(R=0.004, freq=1.88, duration=20.0)

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".bench_cache", "steady_112x112x112_t16.npz")
state = uio.to_state(uio.load_checkpoint(cache))
ga = geometry_arrays(geom)
spacing = tuple(float(s) for s in geom.spacing)
hx, hy, hz = spacing
fluid = ga["vfrac"] > 0.0

dt = state.dt
phi = (ga["ax"] * state.u, ga["ay"] * state.v, ga["az"] * state.w)
rho_new = mixture_density(state.alpha, props)
mu = mixture_viscosity(state.alpha, props)


def timeit(name, fn, *args, n=30):
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
    print(f"{name:22s} {ms:8.3f} ms")
    return ms


@jax.jit
def run_mules(alpha, phi, dt):
    a, rp, _ = mules.advect_alpha(alpha, phi, ga, spacing, dt,
                                  props.rho1, props.rho2,
                                  use_pallas=controls.use_pallas)
    return a, rp


@jax.jit
def run_mules_jnp(alpha, phi, dt):
    a, rp, _ = mules.advect_alpha(alpha, phi, ga, spacing, dt,
                                  props.rho1, props.rho2, use_pallas=False)
    return a, rp


@jax.jit
def run_fluxes(alpha, phi):
    """One subcycle's flux construction (compression + low/anti)."""
    apertures = (ga["ax"], ga["ay"], ga["az"])
    u_cs = mules.compression_fluxes(alpha, phi, apertures, spacing, 1.0)
    lows, antis = mules._face_fluxes(alpha, phi, u_cs)
    return lows, antis


@jax.jit
def run_limiter(alpha, phi, dt):
    """One subcycle's FCT limiter (3 iterations) on real fluxes."""
    apertures = (ga["ax"], ga["ay"], ga["az"])
    inv_vol = jnp.where(fluid, 1.0 / jnp.maximum(ga["vfrac"], 0.5), 0.0)
    u_cs = mules.compression_fluxes(alpha, phi, apertures, spacing, 1.0)
    lows, antis = mules._face_fluxes(alpha, phi, u_cs)
    a_low = alpha - dt / 3.0 * inv_vol * mules._div(list(lows), spacing)
    lim = mules._fct_limited(alpha, a_low, list(antis), dt / 3.0, spacing,
                             inv_vol, fluid, 3,
                             use_pallas=controls.use_pallas)
    return lim


@jax.jit
def run_momentum(alpha, u, v, w, phi, dt):
    rho_old = mixture_density(alpha, props)
    a2, rho_phi, _ = mules.advect_alpha(alpha, phi, ga, spacing, dt,
                                        props.rho1, props.rho2)
    rho_n = mixture_density(a2, props)
    mu = mixture_viscosity(a2, props)
    mu_edges = mom.edge_viscosities(mu)
    div_u = st.divergence(*phi, spacing)
    outs = []
    for ax, q in enumerate((u, v, w)):
        rof = st.cells_to_faces_avg(rho_old, ax)
        rnf = st.cells_to_faces_avg(rho_n, ax)
        conv = mom.convect_face_field(q, ax, rho_phi, spacing)
        visc = mom.viscous_face_field(q, ax, mu, spacing, mu_edges)
        vc = visc - conv + mom.transpose_viscous_face_field(
            (u, v, w), ax, mu, spacing, mu_edges, div_u)
        outs.append((rof * q + dt * vc) / rnf)
    return tuple(outs)


@jax.jit
def run_build(rho):
    prob = poisson.build_poisson(ga, spacing, rho, ga["top_open"],
                                 use_pallas=controls.use_pallas)
    return prob.diag


@jax.jit
def run_build_op(rho):
    """Operator half only (everything that must be fresh per step)."""
    prob, pack = poisson.build_operator(ga, spacing, rho, ga["top_open"],
                                        use_pallas=controls.use_pallas)
    return prob.diag, pack


@jax.jit
def run_bundle(rho):
    """Operator + bf16 V-cycle hierarchy build (the make_bundle half)."""
    _, pack = poisson.build_operator(ga, spacing, rho, ga["top_open"],
                                     use_pallas=controls.use_pallas)
    return poisson.make_bundle(pack, use_pallas=controls.use_pallas)


@jax.jit
def run_pcg(rho, u, v, w, p0, dt):
    prob = poisson.build_poisson(ga, spacing, rho, ga["top_open"],
                                 use_pallas=controls.use_pallas)
    phi_star = (ga["ax"] * u, ga["ay"] * v, ga["az"] * w)
    b = jnp.where(fluid, -st.divergence(*phi_star, spacing) / dt, 0.0)
    dp, res, iters = poisson.solve_pcg(prob, b, p0,
                                       tol_rel=controls.p_tol_rel,
                                       tol_abs=controls.p_tol_abs,
                                       max_iters=controls.p_max_iters)
    return dp, res, iters


step = jax.jit(make_step(geom, props, controls))

print(f"backend={jax.default_backend()}  grid={geom.shape}  "
      f"fluid={geom.n_fluid_cells}  dt={float(np.asarray(dt)):.3e}")

t_mules = timeit("mules(3x3)", run_mules, state.alpha, phi, dt)
timeit("mules(3x3) jnp-limiter", run_mules_jnp, state.alpha, phi, dt)
t_flux = timeit("  1-subcycle fluxes", run_fluxes, state.alpha, phi)
t_lim = timeit("  fluxes+limiter(3)", run_limiter, state.alpha, phi, dt)
print(f"  limiter-only ~ {t_lim - t_flux:.3f} ms/subcycle")
t_mom_full = timeit("mules+momentum", run_momentum, state.alpha, state.u,
                    state.v, state.w, phi, dt)
t_build = timeit("poisson build", run_build, rho_new)
t_build_op = timeit("  operator only", run_build_op, rho_new)
t_bundle = timeit("  operator+bundle", run_bundle, rho_new)
print(f"  bundle-only ~ {t_bundle - t_build_op:.3f} ms/step (K=1 refresh)")
t_pcg = timeit("build+pcg", run_pcg, rho_new, state.u, state.v, state.w,
               state.p, dt)
t_full = timeit("FULL STEP", lambda s: step(s, params)[0], state, n=30)

_, res, iters = run_pcg(rho_new, state.u, state.v, state.w, state.p, dt)
print(f"pcg iters={int(np.asarray(iters))}  res={float(np.asarray(res)):.2e}")
print(f"momentum-only ~ {t_mom_full - t_mules:.3f} ms, "
      f"pcg-only ~ {t_pcg - t_build:.3f} ms, "
      f"sum check: {t_mules:.2f}+{t_mom_full - t_mules:.2f}+{t_pcg:.2f} "
      f"= {t_mom_full + t_pcg:.2f} vs full {t_full:.2f}")
