"""Pressure-solve tolerance parity (VERDICT r1 #29 / fvSolution:42-66).

The reference solves p_rgh with GAMG to tol 1e-8 (relTol 0.01) and the
final corrector with PCG to tol 2e-9. This solver's engineering stance
(config.py) is an f32 MG-preconditioned CG in diagonally-scaled space
with a relative tolerance + iterative refinement. This test quantifies
that the stance delivers the same *answer*: an independent float64
numpy CG on the identical 7-point cut-cell operator, converged to
||r|| <= 1e-8 ||b|| (the reference's tolerance class), agrees with the
production f32 solve to ~f32 representation accuracy — i.e. tighter
stopping cannot change the pressure field at the precision the solver
carries.
"""

import jax
import jax.numpy as jnp
import numpy as np

from openfoam_tpp_tpu.config import PhysicalProperties, SolverControls
from openfoam_tpp_tpu.core.state import init_state, mixture_density
from openfoam_tpp_tpu.mesh import build_tank_geometry
from openfoam_tpp_tpu.solver import poisson
from openfoam_tpp_tpu.solver.timestep import geometry_arrays


def _np_apply(level, p):
    """float64 replica of poisson._weights_apply (7-point cut-cell op)."""
    wx = np.asarray(level.wx, np.float64)
    wy = np.asarray(level.wy, np.float64)
    wz = np.asarray(level.wz, np.float64)
    diag = np.asarray(level.diag, np.float64)

    def dn(a, ax):
        return np.concatenate([np.take(a, [0], ax), np.delete(a, -1, ax)], ax)

    def up(a, ax):
        return np.concatenate([np.delete(a, 0, ax), np.take(a, [-1], ax)], ax)

    nb = (
        wx[:-1] * dn(p, 0) + wx[1:] * up(p, 0)
        + wy[:, :-1] * dn(p, 1) + wy[:, 1:] * up(p, 1)
        + wz[:, :, :-1] * dn(p, 2) + wz[:, :, 1:] * up(p, 2)
    )
    return diag * p - nb


def _np_cg(level, b, fluid, tol_rel=1e-8, max_iters=5000):
    """Jacobi-preconditioned CG in float64 to ||r|| <= tol_rel ||b||."""
    diag = np.asarray(level.diag, np.float64)
    minv = np.where(fluid, 1.0 / np.where(diag > 0, diag, 1.0), 0.0)
    x = np.zeros_like(b)
    r = np.where(fluid, b - _np_apply(level, x), 0.0)
    z = minv * r
    p = z.copy()
    rz = float((r * z).sum())
    b_norm = float(np.sqrt((b * b).sum()))
    for k in range(max_iters):
        if np.sqrt((r * r).sum()) <= tol_rel * b_norm:
            break
        ap = np.where(fluid, _np_apply(level, p), 0.0)
        alpha = rz / float((p * ap).sum())
        x += alpha * p
        r -= alpha * ap
        z = minv * r
        rz_new = float((r * z).sum())
        p = z + (rz_new / rz) * p
        rz = rz_new
    return x, float(np.sqrt((r * r).sum()) / b_norm), k


def test_f32_solve_matches_f64_tol1e8_oracle():
    geom = build_tank_geometry(0.05, 0.02, 0.002, geo="flat")
    ga = geometry_arrays(geom)
    spacing = tuple(float(s) for s in geom.spacing)
    state = init_state(geom)
    rho = mixture_density(state.alpha, PhysicalProperties())
    controls = SolverControls()

    @jax.jit
    def solve(tol_rel, max_iters):
        prob = poisson.build_poisson(ga, spacing, rho, ga["top_open"])
        # RHS in the operator's range: a projection-step-like divergence
        # field (random cell values, zeroed outside fluid).
        p_ref = jnp.where(
            prob.fluid,
            jax.random.normal(jax.random.PRNGKey(7), rho.shape), 0.0)
        b = prob.apply(p_ref)
        x, res, iters = poisson.solve_pcg(
            prob, b, jnp.zeros_like(b),
            tol_rel=tol_rel, tol_abs=controls.p_tol_abs,
            max_iters=max_iters,
        )
        return prob.fluid, b, x, iters

    fluid, b, x_tight, it_tight = solve(1e-7, 60)
    _, _, x_default, it_default = solve(controls.p_tol_rel,
                                        controls.p_max_iters)
    fluid = np.asarray(fluid)
    prob = poisson.build_poisson(ga, spacing, rho, ga["top_open"])
    top_level = prob.levels[0]

    x64, rel64, k64 = _np_cg(top_level, np.asarray(b, np.float64), fluid)
    assert rel64 <= 1e-8, f"f64 oracle failed to converge ({rel64}, {k64} it)"

    def rel_err(x32):
        d = np.where(fluid, np.asarray(x32, np.float64) - x64, 0.0)
        scale = np.abs(x64[fluid]).max()
        return (np.sqrt((d * d).sum() / (x64[fluid] ** 2).sum()),
                np.abs(d).max() / scale)

    # Capability parity: asked for the reference's tolerance class, the
    # f32 MG-CG lands on the tol-1e-8 answer to ~f32 operator accuracy
    # (difference bounded by f32 rounding x conditioning, ~1e-4..1e-3 at
    # the 1000:1 density ratio) — tighter stopping cannot change the
    # field at the precision the solver carries.
    l2_t, inf_t = rel_err(x_tight)
    assert l2_t < 1e-3, (l2_t, inf_t, int(it_tight))
    assert inf_t < 5e-3, (l2_t, inf_t, int(it_tight))

    # The per-step engineering default (rel 1e-3 + refinement across the
    # incremental solve) stops earlier on this cold synthetic RHS; its
    # distance from the exact answer is the documented trade-off, kept
    # honest here (config.py p_tol_rel rationale + per-step div-error
    # diagnostics in solver/timestep.py).
    l2_d, _ = rel_err(x_default)
    assert l2_d < 5e-2, (l2_d, int(it_default))
