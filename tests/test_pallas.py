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
