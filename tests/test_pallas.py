"""Pallas TPU kernel correctness (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from openfoam_tpp_tpu.config import PhysicalProperties
from openfoam_tpp_tpu.core.state import init_state, mixture_density
from openfoam_tpp_tpu.mesh import build_tank_geometry
from openfoam_tpp_tpu.ops import stencil as st
from openfoam_tpp_tpu.ops.pallas import seven_point as sp
from openfoam_tpp_tpu.solver import poisson as po
from openfoam_tpp_tpu.solver.timestep import geometry_arrays


def test_apply_7pt_matches_jnp_operator():
    geom = build_tank_geometry(H=0.05, D=0.02, mesh=0.0025, geo="flat",
                               round_to=sp.SLAB)
    assert sp.supported(geom.shape)
    ga = geometry_arrays(geom)
    rho = mixture_density(init_state(geom).alpha, PhysicalProperties())
    spacing = tuple(float(s) for s in geom.spacing)
    prob = po.build_poisson(ga, spacing, rho, ga["top_open"])

    hx, hy, hz = spacing
    bx = 1.0 / st.cells_to_faces_avg(rho, 0)
    by = 1.0 / st.cells_to_faces_avg(rho, 1)
    bz = 1.0 / st.cells_to_faces_avg(rho, 2)
    wx = ga["ax"] * bx / (hx * hx)
    wy = ga["ay"] * by / (hy * hy)
    wz = (ga["az"] * bz / (hz * hz)).at[:, :, -1].set(0.0)

    p = jax.random.normal(jax.random.PRNGKey(0), geom.shape, jnp.float32)
    ref = np.asarray(prob.apply(p))
    out = np.asarray(
        sp.apply_7pt(p, sp.split_weights(wx, wy, wz), prob.diag,
                     interpret=True)
    )
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() / scale < 1e-5

    # Fused scaled residual (the smoother inner op): (b − A p)/diag.
    b = jax.random.normal(jax.random.PRNGKey(1), geom.shape, jnp.float32)
    ref_r = np.asarray((b - prob.apply(p)) / prob.diag)
    out_r = np.asarray(
        sp.resid_scaled_7pt(p, sp.split_weights(wx, wy, wz), prob.diag, b,
                            interpret=True)
    )
    scale_r = np.abs(ref_r).max()
    assert np.abs(out_r - ref_r).max() / scale_r < 1e-5


def _split_hat(geom, ga, prob, spacing, rho):
    """Rebuild the scaled-space split weights exactly as build_poisson."""
    hx, hy, hz = spacing
    bx = 1.0 / st.cells_to_faces_avg(rho, 0)
    by = 1.0 / st.cells_to_faces_avg(rho, 1)
    bz = 1.0 / st.cells_to_faces_avg(rho, 2)
    wx = ga["ax"] * bx / (hx * hx)
    wy = ga["ay"] * by / (hy * hy)
    wz = (ga["az"] * bz / (hz * hz)).at[:, :, -1].set(0.0)
    s = prob.scale
    sl_x, sr_x = st.face_lr(s, 0)
    sl_y, sr_y = st.face_lr(s, 1)
    sl_z, sr_z = st.face_lr(s, 2)
    return sp.split_weights(wx * sl_x * sr_x, wy * sl_y * sr_y,
                            wz * sl_z * sr_z)


def test_fused_cheb2_smoother_parity():
    """The one-pass degree-2 Chebyshev pre(+residual)/post kernels match
    the unfused poisson._chebyshev recurrence on Â."""
    geom = build_tank_geometry(H=0.05, D=0.02, mesh=0.0025, geo="flat",
                               round_to=sp.SLAB)
    ga = geometry_arrays(geom)
    rho = mixture_density(init_state(geom).alpha, PhysicalProperties())
    spacing = tuple(float(s) for s in geom.spacing)
    prob = po.build_poisson(ga, spacing, rho, ga["top_open"])
    split_hat = _split_hat(geom, ga, prob, spacing, rho)

    lmax, lmin_frac = 2.0, 0.25
    a, c = lmin_frac * lmax, 1.02 * lmax
    theta = 0.5 * (c + a)
    delta = 0.5 * (c - a)
    sigma = theta / delta
    rho1 = 1.0 / sigma
    rho2 = 1.0 / (2.0 * sigma - rho1)

    def unfused_pre(b):
        p1 = b / theta
        x1 = p1
        d = b - prob.apply_hat(x1)
        p2 = (rho2 * rho1) * p1 + (2.0 * rho2 / delta) * d
        x2 = x1 + p2
        return x2, b - prob.apply_hat(x2)

    def unfused_post(x, b):
        d = b - prob.apply_hat(x)
        p1 = d / theta
        x1 = x + p1
        d2 = b - prob.apply_hat(x1)
        p2 = (rho2 * rho1) * p1 + (2.0 * rho2 / delta) * d2
        return x1 + p2

    b = jax.random.normal(jax.random.PRNGKey(4), geom.shape, jnp.float32)
    ref_x, ref_r = unfused_pre(b)
    out_x, out_r = sp.cheb2_pre_7pt(b, split_hat, lmax, lmin_frac,
                                    interpret=True)
    sx = float(jnp.abs(ref_x).max())
    sr = float(jnp.abs(ref_r).max())
    assert np.abs(np.asarray(out_x) - np.asarray(ref_x)).max() / sx < 1e-5
    assert np.abs(np.asarray(out_r) - np.asarray(ref_r)).max() / sr < 1e-5

    ref_x2 = unfused_post(ref_x, b)
    out_x2 = sp.cheb2_post_7pt(ref_x, b, split_hat, lmax, lmin_frac,
                               interpret=True)
    s2 = float(jnp.abs(ref_x2).max())
    assert np.abs(np.asarray(out_x2) - np.asarray(ref_x2)).max() / s2 < 1e-5

    # bf16 (the production preconditioner dtype): same math, loose tol.
    b16 = b.astype(jnp.bfloat16)
    split16 = tuple(w.astype(jnp.bfloat16) for w in split_hat)
    x16, r16 = sp.cheb2_pre_7pt(b16, split16, lmax, lmin_frac,
                                interpret=True)
    assert x16.dtype == jnp.bfloat16
    assert np.abs(np.asarray(x16, np.float32)
                  - np.asarray(ref_x)).max() / sx < 0.05
    x16b = sp.cheb2_post_7pt(x16, b16, split16, lmax, lmin_frac,
                             interpret=True)
    assert np.abs(np.asarray(x16b, np.float32)
                  - np.asarray(ref_x2)).max() / s2 < 0.05

    # Widened store (out_dtype): bf16 compute, f32 result in the same
    # pass — the production V-cycle → CG hand-off.
    x16f = sp.cheb2_post_7pt(x16, b16, split16, lmax, lmin_frac,
                             out_dtype=jnp.float32, interpret=True)
    assert x16f.dtype == jnp.float32
    assert np.abs(np.asarray(x16f)
                  - np.asarray(ref_x2)).max() / s2 < 0.05


def test_unit_diag_and_fused_apply_dot():
    """Unit-diagonal kernels (the scaled operator Â) and the fused
    (Â·p, p·Â·p) CG curvature kernel match the jnp reference."""
    geom = build_tank_geometry(H=0.05, D=0.02, mesh=0.0025, geo="flat",
                               round_to=sp.SLAB)
    ga = geometry_arrays(geom)
    rho = mixture_density(init_state(geom).alpha, PhysicalProperties())
    spacing = tuple(float(s) for s in geom.spacing)
    prob = po.build_poisson(ga, spacing, rho, ga["top_open"])

    # Rebuild the scaled-space split weights exactly as build_poisson does.
    hx, hy, hz = spacing
    bx = 1.0 / st.cells_to_faces_avg(rho, 0)
    by = 1.0 / st.cells_to_faces_avg(rho, 1)
    bz = 1.0 / st.cells_to_faces_avg(rho, 2)
    wx = ga["ax"] * bx / (hx * hx)
    wy = ga["ay"] * by / (hy * hy)
    wz = (ga["az"] * bz / (hz * hz)).at[:, :, -1].set(0.0)
    s = prob.scale
    sl_x, sr_x = st.face_lr(s, 0)
    sl_y, sr_y = st.face_lr(s, 1)
    sl_z, sr_z = st.face_lr(s, 2)
    split_hat = sp.split_weights(wx * sl_x * sr_x, wy * sl_y * sr_y,
                                 wz * sl_z * sr_z)

    p = jax.random.normal(jax.random.PRNGKey(2), geom.shape, jnp.float32)
    p = jnp.where(prob.fluid, p, 0.0)  # CG invariant: zero on solid
    ref = np.asarray(prob.apply_hat(p))

    out_unit = np.asarray(sp.apply_7pt(p, split_hat, None, interpret=True))
    scale = np.abs(ref).max()
    assert np.abs(out_unit - ref).max() / scale < 1e-5

    ap, pap = sp.apply_dot_7pt(p, split_hat, interpret=True)
    assert np.abs(np.asarray(ap) - ref).max() / scale < 1e-5
    ref_dot = float(jnp.sum(p * prob.apply_hat(p), dtype=jnp.float32))
    assert abs(float(pap) - ref_dot) / max(abs(ref_dot), 1e-30) < 1e-5

    # Unit-diag fused residual: b − Â·p.
    b = jax.random.normal(jax.random.PRNGKey(3), geom.shape, jnp.float32)
    ref_r = np.asarray(b - prob.apply_hat(p))
    out_r = np.asarray(
        sp.resid_scaled_7pt(p, split_hat, None, b, interpret=True))
    assert np.abs(out_r - ref_r).max() / np.abs(ref_r).max() < 1e-5


def test_cheb2_post_dot_parity():
    """cheb2_post_dot_7pt returns the identical smoothed z plus
    rz = sum(b*z) (the CG coupling dot fused into the exit smoother)."""
    geom = build_tank_geometry(H=0.05, D=0.02, mesh=0.0025, geo="flat",
                               round_to=sp.SLAB)
    ga = geometry_arrays(geom)
    rho = mixture_density(init_state(geom).alpha, PhysicalProperties())
    spacing = tuple(float(s) for s in geom.spacing)
    prob = po.build_poisson(ga, spacing, rho, ga["top_open"])
    split_hat = _split_hat(geom, ga, prob, spacing, rho)

    key = jax.random.PRNGKey(11)
    kx, kb = jax.random.split(key)
    x = jax.random.normal(kx, geom.shape, jnp.float32)
    b = jax.random.normal(kb, geom.shape, jnp.float32)

    ref = sp.cheb2_post_7pt(x, b, split_hat, 2.0, 0.25, interpret=True)
    z, rz = sp.cheb2_post_dot_7pt(x, b, split_hat, 2.0, 0.25,
                                  interpret=True)
    sz = float(jnp.abs(ref).max())
    assert np.abs(np.asarray(z) - np.asarray(ref)).max() / sz < 1e-6
    rz_ref = float(jnp.sum(b * ref, dtype=jnp.float32))
    assert abs(float(rz) - rz_ref) <= 1e-5 * abs(rz_ref)

    # bf16 inputs with widened f32 store — the production configuration.
    b16 = b.astype(jnp.bfloat16)
    x16 = x.astype(jnp.bfloat16)
    split16 = tuple(w.astype(jnp.bfloat16) for w in split_hat)
    ref16 = sp.cheb2_post_7pt(x16, b16, split16, 2.0, 0.25,
                              out_dtype=jnp.float32, interpret=True)
    z16, rz16 = sp.cheb2_post_dot_7pt(x16, b16, split16, 2.0, 0.25,
                                      out_dtype=jnp.float32,
                                      interpret=True)
    assert z16.dtype == jnp.float32
    s16 = float(jnp.abs(ref16).max())
    assert np.abs(np.asarray(z16) - np.asarray(ref16)).max() / s16 < 1e-6
    rz16_ref = float(jnp.sum(b16.astype(jnp.float32) * ref16,
                             dtype=jnp.float32))
    assert abs(float(rz16) - rz16_ref) <= 1e-4 * max(abs(rz16_ref), 1e-30)
