"""Dense brute-force validation of the RAP-27 Galerkin coarse operators
(solver/rap.py): transfer adjointness, exact P^T A P equality on a small
grid, constant-nullspace preservation, and the gated OFTPP_COARSE=rap27
preconditioner path solving a real pressure problem."""

import numpy as np
import jax
import jax.numpy as jnp

from openfoam_tpp_tpu.solver import rap


def _random_7pt(shape, rng, neumann=True):
    """Random SPD-ish 7-point operator as (apply, dense) pair. Face
    weights are zero on the boundary (homogeneous Neumann) so A·1 = 0
    when `neumann`; otherwise an `extra` diagonal makes it SPD."""
    nx, ny, nz = shape
    wx = jnp.asarray(rng.uniform(0.5, 2.0, (nx + 1, ny, nz)), jnp.float32)
    wy = jnp.asarray(rng.uniform(0.5, 2.0, (nx, ny + 1, nz)), jnp.float32)
    wz = jnp.asarray(rng.uniform(0.5, 2.0, (nx, ny, nz + 1)), jnp.float32)
    wx = wx.at[0].set(0).at[-1].set(0)
    wy = wy.at[:, 0].set(0).at[:, -1].set(0)
    wz = wz.at[:, :, 0].set(0).at[:, :, -1].set(0)
    extra = (jnp.zeros(shape, jnp.float32) if neumann
             else jnp.asarray(rng.uniform(0.1, 0.5, shape), jnp.float32))
    diag = (wx[:-1] + wx[1:] + wy[:, :-1] + wy[:, 1:]
            + wz[:, :, :-1] + wz[:, :, 1:] + extra)

    def shift(p, axis, d):
        return jnp.roll(p, d, axis)

    def apply_fine(p):
        return (diag * p
                - wx[:-1] * shift(p, 0, 1) - wx[1:] * shift(p, 0, -1)
                - wy[:, :-1] * shift(p, 1, 1) - wy[:, 1:] * shift(p, 1, -1)
                - wz[:, :, :-1] * shift(p, 2, 1)
                - wz[:, :, 1:] * shift(p, 2, -1))
    # rolls wrap, but the boundary weights are zero so wrapped reads
    # are multiplied by 0 — the operator is genuinely Neumann-closed.

    n = nx * ny * nz
    eye = np.eye(n, dtype=np.float32).reshape(n, nx, ny, nz)
    dense = np.stack([np.asarray(apply_fine(jnp.asarray(e))).ravel()
                      for e in eye], axis=1)
    return apply_fine, dense


def _dense_prolong(cs, fs):
    nc = int(np.prod(cs))
    eye = np.eye(nc, dtype=np.float32).reshape(nc, *cs)
    cols = [np.asarray(rap.prolong_linear(jnp.asarray(e), fs)).ravel()
            for e in eye]
    return np.stack(cols, axis=1)          # (n_fine, n_coarse)


def _dense_from_c27(c):
    cs = c.shape[1:]
    nc = int(np.prod(cs))
    eye = np.eye(nc, dtype=np.float32).reshape(nc, *cs)
    cols = [np.asarray(rap.apply27(c, jnp.asarray(e))).ravel() for e in eye]
    return np.stack(cols, axis=1)


def test_prolong_partition_of_unity_and_adjoint():
    fs = (7, 6, 5)
    cs = rap.coarse_shape_of(fs)
    ones = jnp.ones(cs, jnp.float32)
    np.testing.assert_allclose(np.asarray(rap.prolong_linear(ones, fs)),
                               1.0, rtol=1e-6)
    rng = np.random.default_rng(0)
    e = jnp.asarray(rng.normal(size=cs), jnp.float32)
    r = jnp.asarray(rng.normal(size=fs), jnp.float32)
    restrict = rap.make_restrict_linear(cs, fs)
    lhs = float(jnp.vdot(rap.prolong_linear(e, fs), r))
    rhs = float(jnp.vdot(e, restrict(r)))
    assert abs(lhs - rhs) < 1e-4 * max(abs(lhs), 1.0)


def test_rap27_equals_dense_galerkin():
    fs = (6, 5, 4)
    cs = rap.coarse_shape_of(fs)
    rng = np.random.default_rng(1)
    apply_fine, A = _random_7pt(fs, rng, neumann=False)
    P = _dense_prolong(cs, fs)
    want = P.T @ A @ P
    c = rap.rap27(apply_fine, fs)
    got = _dense_from_c27(c)
    np.testing.assert_allclose(got, want, atol=1e-4 * abs(want).max())
    # Symmetry survives (A SPD, Galerkin triple product).
    np.testing.assert_allclose(got, got.T, atol=1e-4 * abs(want).max())


def test_rap27_preserves_constant_nullspace():
    fs = (8, 6, 6)
    rng = np.random.default_rng(2)
    apply_fine, _ = _random_7pt(fs, rng, neumann=True)
    c = rap.rap27(apply_fine, fs)
    cs = rap.coarse_shape_of(fs)
    resid = rap.apply27(c, jnp.ones(cs, jnp.float32))
    scale = float(jnp.abs(c[13]).max())
    assert float(jnp.abs(resid).max()) < 1e-5 * scale


def test_rap27_preconditioner_solves_pressure_problem(monkeypatch):
    """The gated OFTPP_COARSE=rap27 V-cycle must precondition a real
    cylinder-tank pressure solve to the same answer as the default.
    (The gate is read at build time, so an env switch is enough.)"""
    from openfoam_tpp_tpu.mesh import build_tank_geometry
    from openfoam_tpp_tpu.solver import poisson
    from openfoam_tpp_tpu.solver.timestep import geometry_arrays

    geom = build_tank_geometry(H=0.08, D=0.05, mesh=0.004, geo="flat")
    ga = geometry_arrays(geom)
    rng = np.random.default_rng(3)
    rho = jnp.asarray(
        rng.uniform(1.0, 1000.0, ga["vfrac"].shape), jnp.float32)
    fluid = np.asarray(ga["vfrac"]) > 0
    b = jnp.asarray(rng.normal(size=ga["vfrac"].shape) * fluid, jnp.float32)
    spacing = tuple(float(s) for s in geom.spacing)

    def solve():
        prob = poisson.build_poisson(ga, spacing, rho, ga["top_open"])
        x, res, iters = poisson.solve_pcg(
            prob, b, jnp.zeros_like(b), tol_rel=1e-5, max_iters=200)
        return np.asarray(x), int(iters)

    x_ref, it_ref = solve()
    monkeypatch.setenv("OFTPP_COARSE", "rap27")
    x_rap, it_rap = solve()
    scale = np.abs(x_ref).max()
    np.testing.assert_allclose(x_rap, x_ref, atol=5e-4 * scale)
    # The whole point: linear-P Galerkin must not be WORSE.
    assert it_rap <= it_ref + 2, (it_rap, it_ref)
