"""Batch-native rank-4 7-point kernels (ops/pallas/seven_point_batch)
and their custom_vmap routing (seven_point *_v): parity against the
single-grid kernels per case, and the geometry-batched sweep step with
the batch path forced (OFTPP_SWEEP_PALLAS=interpret) against the jnp
path. All in interpreter mode on CPU."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openfoam_tpp_tpu.ops.pallas import seven_point as sp
from openfoam_tpp_tpu.ops.pallas import seven_point_batch as sb


def _problem(key, nx=12, ny=8, nz=8, B=3, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    shape4 = (nx, ny, nz, B)
    p = jax.random.normal(ks[0], shape4, dtype)
    b = jax.random.normal(ks[1], shape4, dtype)
    # Face arrays with ZERO domain-boundary faces (the geometry
    # invariant every kernel relies on).
    wx = jax.random.uniform(ks[2], (nx + 1, ny, nz, B), dtype) * 0.16
    wy = jax.random.uniform(ks[3], (nx, ny + 1, nz, B), dtype) * 0.16
    wz = jax.random.uniform(ks[4], (nx, ny, nz + 1, B), dtype) * 0.16
    wx = wx.at[0].set(0).at[-1].set(0)
    wy = wy.at[:, 0].set(0).at[:, -1].set(0)
    wz = wz.at[:, :, 0].set(0).at[:, :, -1].set(0)
    diag = 1.0 + jax.random.uniform(ks[5], shape4, dtype)
    split4 = (wx[:-1], wy[:, :-1], wz[:, :, :-1])
    return p, b, diag, split4


def _per_case(fn, *args4):
    """Loop the single-grid interpret kernel over the trailing case axis."""
    outs = [fn(*(a[..., i] for a in args4)) for i in range(args4[0].shape[-1])]
    if isinstance(outs[0], tuple):
        return tuple(jnp.stack([o[k] for o in outs], -1 if outs[0][k].ndim
                               else 0)
                     for k in range(len(outs[0])))
    return jnp.stack(outs, -1)


def test_apply_resid_dot_batch_parity():
    p, b, diag, split4 = _problem(jax.random.PRNGKey(0))

    ref = _per_case(
        lambda q, a, c, d: sp.apply_7pt(q, (a, c, d), interpret=True),
        p, *split4)
    out = sb.apply_7pt_nb(p, split4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    ref = _per_case(
        lambda q, a, c, d, dg: sp.apply_7pt(q, (a, c, d), diag=dg,
                                            interpret=True),
        p, *split4, diag)
    out = sb.apply_7pt_nb(p, split4, diag=diag, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    ref = _per_case(
        lambda q, a, c, d, r: sp.resid_scaled_7pt(q, (a, c, d), None, r,
                                                  interpret=True),
        p, *split4, b)
    out = sb.resid_scaled_7pt_nb(p, split4, None, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    ref = _per_case(
        lambda q, a, c, d, dg, r: sp.resid_scaled_7pt(q, (a, c, d), dg, r,
                                                      interpret=True),
        p, *split4, diag, b)
    out = sb.resid_scaled_7pt_nb(p, split4, diag, b, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    ap_ref, dot_ref = _per_case(
        lambda q, a, c, d: sp.apply_dot_7pt(q, (a, c, d), interpret=True),
        p, *split4)
    ap, dots = sb.apply_dot_7pt_nb(p, split4, interpret=True)
    np.testing.assert_allclose(np.asarray(ap), np.asarray(ap_ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(dots), np.asarray(dot_ref),
                               rtol=2e-5)


def test_custom_vmap_routes_batch():
    """vmap over the trailing case axis of the *_v wrappers must agree
    with the per-case single kernels (the rule's moveaxis bookkeeping,
    supported4 gate, and per-case dot all exercised)."""
    p, b, diag, split4 = _problem(jax.random.PRNGKey(1))

    out = jax.vmap(sp.apply_7pt_v, in_axes=(3, 3, 3, 3),
                   out_axes=3)(p, *split4)
    ref = _per_case(
        lambda q, a, c, d: sp.apply_7pt(q, (a, c, d), interpret=True),
        p, *split4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    ap, dots = jax.vmap(sp.apply_dot_7pt_v, in_axes=(3, 3, 3, 3),
                        out_axes=(3, 0))(p, *split4)
    ap_ref, dot_ref = _per_case(
        lambda q, a, c, d: sp.apply_dot_7pt(q, (a, c, d), interpret=True),
        p, *split4)
    np.testing.assert_allclose(np.asarray(ap), np.asarray(ap_ref),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(dots), np.asarray(dot_ref),
                               rtol=2e-5)

    # cheb2 decomposed rules vs the fused single-grid kernels.
    lmax, lmf = 1.9, 0.06
    x2, r = jax.vmap(sp.cheb2_pre_v(lmax, lmf), in_axes=(3,) * 4,
                     out_axes=(3, 3))(b, *split4)
    x2r, rr = _per_case(
        lambda q, a, c, d: sp.cheb2_pre_7pt(q, (a, c, d), lmax, lmf,
                                            interpret=True),
        b, *split4)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x2r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r), np.asarray(rr), atol=1e-5)

    z, rz = jax.vmap(sp.cheb2_post_dot_v(lmax, lmf), in_axes=(3,) * 5,
                     out_axes=(3, 0))(p, b, *split4)
    zr, rzr = _per_case(
        lambda s, q, a, c, d: sp.cheb2_post_dot_7pt(
            s, q, (a, c, d), lmax, lmf, interpret=True),
        p, b, *split4)
    np.testing.assert_allclose(np.asarray(z), np.asarray(zr), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rz), np.asarray(rzr), rtol=3e-5)


def test_custom_vmap_fallback_unbatched_weights():
    """Shared-geometry vmap (weights unbatched) must fall back to the
    vmapped single kernel and stay correct."""
    p, b, _, split4 = _problem(jax.random.PRNGKey(2))
    split1 = tuple(w[..., 0] for w in split4)
    out = jax.vmap(sp.apply_7pt_v, in_axes=(3, None, None, None),
                   out_axes=3)(p, *split1)
    ref = jnp.stack([sp.apply_7pt(p[..., i], split1, interpret=True)
                     for i in range(p.shape[-1])], -1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("nx", [12, 16])
def test_slab4_single_grid(nx):
    """pick_slab=4 single-grid kernels (sweep-box x extents) match the
    jnp stencil reference."""
    p, b, diag, split4 = _problem(jax.random.PRNGKey(3), nx=nx, B=1)
    p1, b1 = p[..., 0], b[..., 0]
    split1 = tuple(w[..., 0] for w in split4)
    wxl, wyl, wzl = split1

    def ref_apply(q):
        shift = lambda a, ax, d: jnp.roll(a, d, ax)
        wxh = jnp.concatenate([wxl[1:], jnp.zeros_like(wxl[:1])], 0)
        wyh = jnp.concatenate([wyl[:, 1:], jnp.zeros_like(wyl[:, :1])], 1)
        wzh = jnp.concatenate(
            [wzl[:, :, 1:], jnp.zeros_like(wzl[:, :, :1])], 2)
        xm = jnp.concatenate([q[:1], q[:-1]], 0)
        xp = jnp.concatenate([q[1:], q[-1:]], 0)
        ym = jnp.concatenate([q[:, :1], q[:, :-1]], 1)
        yp = jnp.concatenate([q[:, 1:], q[:, -1:]], 1)
        zm = jnp.concatenate([q[:, :, :1], q[:, :, :-1]], 2)
        zp = jnp.concatenate([q[:, :, 1:], q[:, :, -1:]], 2)
        return q - (wxl * xm + wxh * xp + wyl * ym + wyh * yp
                    + wzl * zm + wzh * zp)

    out = sp.apply_7pt(p1, split1, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_apply(p1)),
                               atol=1e-6)


def test_sweep_step_batch_kernels_match_jnp(tmp_path, monkeypatch):
    """Geometry-batched sweep step with the batch-native kernels forced
    (OFTPP_SWEEP_PALLAS=interpret) agrees with the jnp path (=0) after a
    few steps."""
    from openfoam_tpp_tpu.config import PhysicalProperties, SolverControls
    from openfoam_tpp_tpu.parallel.sweep import (
        batch_params,
        batch_states_geom,
        build_batched_geometry,
        make_geom_sweep_step,
    )

    rows = [
        {"H": 0.04, "D": 0.02, "mesh": 0.004, "geo": "flat", "R": 0.002,
         "freq": 3.0},
        {"H": 0.03, "D": 0.016, "mesh": 0.004, "geo": "flat", "R": 0.001,
         "freq": 2.0},
    ]
    bgeom = build_batched_geometry(rows, round_to=4, axis=-1)
    params = batch_params([
        {"R": r["R"], "freq": r["freq"], "duration": 0.05} for r in rows])
    props = PhysicalProperties()
    controls = SolverControls()

    def run(env):
        monkeypatch.setenv("OFTPP_SWEEP_PALLAS", env)
        step = make_geom_sweep_step(bgeom, props, controls)
        s = batch_states_geom(bgeom, dt0=4e-4)
        for _ in range(4):
            s, _ = step(s, params)
        return s

    s_jnp = run("0")
    s_bat = run("interpret")
    np.testing.assert_allclose(np.asarray(s_bat.alpha),
                               np.asarray(s_jnp.alpha), atol=5e-5)
    # p agrees to CG-tolerance level only: the per-case kernel dots
    # reduce in a different order, so the solves stop on slightly
    # different iterates (observed max 0.13% relative).
    np.testing.assert_allclose(np.asarray(s_bat.p),
                               np.asarray(s_jnp.p), rtol=8e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(s_bat.t), np.asarray(s_jnp.t),
                               rtol=1e-6)
