"""dev2 transpose stress term (fvSchemes:32 parity — VERDICT r1 #28).

For a LINEAR velocity field U = A·x (constant ∇U) and LINEAR viscosity
μ = μ0 + g·x, every interpolation/difference in the discretization is
exact, so at interior points

    [∇·(μ (∇U)ᵀ − (2/3)μ(∇·U)I)]_i  =  Σ_d A_{di} g_d − (2/3) tr(A) g_i

must hold to round-off. Also checks the term vanishes for constant μ
with a divergence-free linear field.
"""

import jax.numpy as jnp
import numpy as np

from openfoam_tpp_tpu.solver.momentum import (
    edge_viscosities,
    transpose_viscous_face_field,
)

H = (0.1, 0.12, 0.08)
N = (12, 10, 14)


def _grids():
    """MAC coordinates: faces at i*h, centers at (i+0.5)*h, per axis."""
    hx, hy, hz = H
    nx, ny, nz = N
    xf = np.arange(nx + 1) * hx
    yf = np.arange(ny + 1) * hy
    zf = np.arange(nz + 1) * hz
    xc, yc, zc = xf[:-1] + hx / 2, yf[:-1] + hy / 2, zf[:-1] + hz / 2
    return (xf, yf, zf), (xc, yc, zc)


def _linear_fields(A, mu0, g):
    (xf, yf, zf), (xc, yc, zc) = _grids()

    def vel(comp, x, y, z):
        X, Y, Z = np.meshgrid(x, y, z, indexing="ij")
        return A[0][comp] * X + A[1][comp] * Y + A[2][comp] * Z

    # u at x-faces, v at y-faces, w at z-faces (MAC layout).
    u = vel(0, xf, yc, zc)
    v = vel(1, xc, yf, zc)
    w = vel(2, xc, yc, zf)
    Xc, Yc, Zc = np.meshgrid(xc, yc, zc, indexing="ij")
    mu = mu0 + g[0] * Xc + g[1] * Yc + g[2] * Zc
    return tuple(jnp.asarray(q) for q in (u, v, w)), jnp.asarray(mu)


def _interior(arr, qax):
    sl = [slice(2, -2)] * 3
    sl[qax] = slice(3, -3)  # stay clear of the clamped boundary faces
    return np.asarray(arr)[tuple(sl)]


def test_dev2_linear_exact():
    # A[d][i] = du_i/dx_d, so du_d/dx_i = A[i][d] — the term's flux for
    # component i along d is μ A[i][d]. Non-symmetric, nonzero trace.
    A = np.array([[0.3, -0.2, 0.5],
                  [0.7, 0.1, -0.4],
                  [-0.6, 0.9, 0.2]])
    g = np.array([2.0, -3.0, 1.5])
    vels, mu = _linear_fields(A, 5.0, g)
    mu_edges = edge_viscosities(mu)
    tr_A = np.trace(A)
    div_u = jnp.full(N, tr_A)

    for qax in range(3):
        got = transpose_viscous_face_field(vels, qax, mu, H,
                                           mu_edges, div_u)
        # Σ_d g_d ∂u_d/∂x_qax − (2/3) tr(A) g_qax = A[qax,:]·g − ...
        expected = float(A[qax, :] @ g - (2.0 / 3.0) * tr_A * g[qax])
        inner = _interior(got, qax)
        np.testing.assert_allclose(inner, expected, rtol=2e-4,
                                   err_msg=f"component {qax}")


def test_dev2_vanishes_constant_mu_divfree():
    # Traceless A (div-free linear field), constant μ → exact zero.
    A = np.array([[0.4, -0.2, 0.5],
                  [0.7, -0.1, -0.4],
                  [-0.6, 0.9, -0.3]])
    assert abs(np.trace(A)) < 1e-12
    vels, mu = _linear_fields(A, 3.0, np.zeros(3))
    mu_edges = edge_viscosities(mu)
    div_u = jnp.zeros(N)
    for qax in range(3):
        got = transpose_viscous_face_field(vels, qax, mu, H,
                                           mu_edges, div_u)
        assert np.abs(_interior(got, qax)).max() < 1e-4


def test_dev2_wired_into_step():
    """The step runs with dev2_stress on (default) and off, and the two
    differ only at interface cells (∇μ ≠ 0 there only)."""
    import dataclasses

    import jax

    from openfoam_tpp_tpu.config import PhysicalProperties, SolverControls
    from openfoam_tpp_tpu.core.state import CaseParams, init_state
    from openfoam_tpp_tpu.mesh import build_tank_geometry
    from openfoam_tpp_tpu.solver.timestep import make_step

    geom = build_tank_geometry(H=0.04, D=0.016, mesh=0.004, geo="flat")
    props = PhysicalProperties()
    params = CaseParams.make(R=0.002, freq=3.0, duration=1.0, ramp=0.02)

    outs = {}
    for flag in (True, False):
        controls = SolverControls(dev2_stress=flag, p_max_iters=12)
        step = jax.jit(make_step(geom, props, controls))
        state = init_state(geom, dt0=5e-4)
        for _ in range(4):
            state, diag = step(state, params)
        outs[flag] = state
    a_on = np.asarray(outs[True].alpha)
    assert np.isfinite(a_on).all()
    # Both stable; fields differ (the term is active at the interface).
    du = np.abs(np.asarray(outs[True].w) - np.asarray(outs[False].w))
    assert du.max() > 0
