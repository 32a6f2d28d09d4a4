"""Fused 7-point variable-coefficient stencil apply — Pallas TPU kernel.

The pressure operator A(p) = diag·p − Σ_f w_f·p_nb is the hottest op in
the solver (~5 finest-grid applies per MG-CG iteration × ~14 iterations
per step). The jnp version lowers to concat-based shifts that XLA
executes at ~80 GB/s effective; this kernel streams x-slabs through VMEM
and evaluates the full stencil in one fused pass.

Halo handling: `p` is passed as THREE BlockSpec views of the same array —
the current slab plus ONE-PLANE views of the previous/next x-planes
(index maps clamped at the ends), so p costs one slab + two planes of
HBM traffic per grid step instead of three slabs. Mosaic double-buffers
the block fetches automatically; x-neighbor slices are concatenations
along the untiled major axis, y/z neighbors slice+concat shifts.

Weight layout ("face-lite", r5): only the three LOW-face coefficient
arrays are streamed (`split_weights`): wxl[c] is the weight on cell c's
low-x face (multiplies p[x−1]); the HIGH-face coefficients are recovered
in-kernel as one-plane-shifted views — the high face of cell c IS the
low face of cell c+1 — with the final plane supplied as a dedicated
x-plane view (select-zeroed at the global end block) for x and an
in-register zero fill for y/z. The zero fills are EXACT, not an
approximation: domain-boundary faces carry zero weight
(mesh/geometry.py `_finalize`), the same invariant that makes the
clamped halo index maps harmless. These kernels are HBM-bound, so
halving the weight traffic (6 arrays → 3) is ~a third of each apply's
total bytes; the extra in-register shifts ride the VPU slack.

Requirements: nx divisible by SLAB (build the geometry with
`round_to=SLAB`); f32. solver/poisson.py falls back to the jnp path
otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SLAB = 8  # x-planes per grid step on the flagship-class grids (and the
          # fixed slab of the halo7/spmd per-shard variants); grids whose
          # nx is only a multiple of 4 (sweep boxes, round_to=4) run a
          # 4-plane slab via `pick_slab`.


def pick_slab(nx: int) -> int | None:
    """Slab (x-planes per grid step) for an nx extent; None = infeasible."""
    if nx % 8 == 0:
        return 8
    if nx % 4 == 0:
        return 4
    return None


def _nb_core(c, pm_plane, pp_plane, wl, wy_, wz_, wxh_last, s, ny, nz):
    """Face-lite neighbor sum in PRODUCT-SHIFT form.

    The high-face terms never materialize the shifted weight arrays:
    w_h[j]·p[j+1] = w_l[j+1]·p[j+1] = (w_l·p)[j+1] — shift the PRODUCT,
    not the weight — so the per-axis VPU cost (one rotate for the low
    shift of p, one for the high shift of the product) is identical to
    the six-array kernel's (rotates of p for both low and high), while
    the weight traffic is halved. Vacated high edges are the
    domain-boundary faces (zero weight by mesh/geometry._finalize ⇒ the
    true term is exactly 0); the x high edge instead takes
    `wxh_last`·`pp_plane` (the next slab's first wxl plane — or zero at
    the global end — times p's next plane). Bitwise-identical products
    and add order vs the six-array form."""
    xm = jnp.concatenate([pm_plane, c[: s - 1, :, :]], axis=0)
    tx = wl * c
    xh = jnp.concatenate([tx[1:, :, :], wxh_last * pp_plane], axis=0)
    ym = jnp.concatenate([c[:, :1, :], c[:, : ny - 1, :]], axis=1)
    ty = wy_ * c
    yh = jnp.concatenate(
        [ty[:, 1:, :], jnp.zeros_like(ty[:, :1, :])], axis=1)
    zm = jnp.concatenate([c[:, :, :1], c[:, :, : nz - 1]], axis=2)
    tz = wz_ * c
    zh = jnp.concatenate(
        [tz[:, :, 1:], jnp.zeros_like(tz[:, :, :1])], axis=2)
    return wl * xm + xh + wy_ * ym + yh + wz_ * zm + zh


def _wxh_last(wxh_p):
    """The slab's last high-x face plane from its halo view (the next
    slab's first wxl plane, index map clamped at the grid end): the end
    block's clamped value is STALE (a weight is the multiplier itself,
    unlike a p halo) — select the true boundary value, zero."""
    v = wxh_p[0:1, :, :]
    return jnp.where(pl.program_id(0) == pl.num_programs(0) - 1,
                     jnp.zeros_like(v), v)


def _nb_sum(p_prev, p_cur, p_next, wxl, wxh, wyl, wyh, wzl, wzh, s, ny, nz):
    """Σ_f w_f·p_neighbor for the current slab (expanded weights).

    x-neighbors: ONE-PLANE halo views of p (the plane below/above this
    slab; index maps clamped at the global ends, where the stray value
    is multiplied by the zero boundary-face weight). Fetching planes
    instead of whole neighbor slabs cuts the kernel's p traffic from
    3 slabs to 1 slab + 2 planes.
    y/z neighbors are slice+concat edge-clamped shifts (NOT pltpu.roll:
    Mosaic only rotates 32-bit data, and the bf16 V-cycle levels run
    through this kernel too); the clamped edge values are likewise
    killed by the zero boundary-face weights."""
    c = p_cur[:, :, :]
    xm = jnp.concatenate([p_prev[0:1, :, :], c[: s - 1, :, :]], axis=0)
    xp = jnp.concatenate([c[1:, :, :], p_next[0:1, :, :]], axis=0)
    ym = jnp.concatenate([c[:, :1, :], c[:, : ny - 1, :]], axis=1)
    yp = jnp.concatenate([c[:, 1:, :], c[:, ny - 1 :, :]], axis=1)
    zm = jnp.concatenate([c[:, :, :1], c[:, :, : nz - 1]], axis=2)
    zp = jnp.concatenate([c[:, :, 1:], c[:, :, nz - 1 :]], axis=2)
    return (
        wxl * xm + wxh * xp + wyl * ym + wyh * yp + wzl * zm + wzh * zp
    )


def _nb_sum_lite(p_prev, p_cur, p_next, wxl, wxh_p, wyl, wzl, s, ny, nz):
    """Face-lite neighbor sum for the single-device kernels: halo planes
    from the clamped index-map views, product-shift core."""
    return _nb_core(p_cur[:, :, :], p_prev[0:1, :, :], p_next[0:1, :, :],
                    wxl[:, :, :], wyl[:, :, :], wzl[:, :, :],
                    _wxh_last(wxh_p), s, ny, nz)


def _kernel(p_prev, p_cur, p_next, wxl, wxh_p, wyl, wzl, diag, out):
    s, ny, nz = out.shape
    nb = _nb_sum_lite(p_prev, p_cur, p_next, wxl, wxh_p, wyl, wzl,
                      s, ny, nz)
    out[:, :, :] = diag[:, :, :] * p_cur[:, :, :] - nb


def _kernel_unit(p_prev, p_cur, p_next, wxl, wxh_p, wyl, wzl, out):
    """Unit-diagonal apply (the diagonally-scaled operator Â): skips the
    HBM read of an all-ones diag array — out = p − Σ w·p_nb."""
    s, ny, nz = out.shape
    nb = _nb_sum_lite(p_prev, p_cur, p_next, wxl, wxh_p, wyl, wzl,
                      s, ny, nz)
    out[:, :, :] = p_cur[:, :, :] - nb


def _kernel_apply_dot_unit(p_prev, p_cur, p_next, wxl, wxh_p, wyl, wzl,
                           out, partial):
    """Unit-diagonal apply PLUS the CG curvature dot: writes A·p and the
    per-slab partial Σ p·(A·p) to SMEM, eliminating the separate
    dot(p, ap) HBM pass (reads p and ap again) that follows every CG
    apply across the Pallas fusion barrier."""
    s, ny, nz = out.shape
    c = p_cur[:, :, :]
    nb = _nb_sum_lite(p_prev, p_cur, p_next, wxl, wxh_p, wyl, wzl,
                      s, ny, nz)
    ap = c - nb
    out[:, :, :] = ap
    # The partials vector lives whole in SMEM across the grid (constant
    # index map); each x-slab writes its own slot.
    partial[pl.program_id(0)] = jnp.sum(c * ap, dtype=jnp.float32)


def _kernel_resid(p_prev, p_cur, p_next, wxl, wxh_p, wyl, wzl,
                  diag, b, out):
    """out = (b − A·p) / diag — the Jacobi-scaled residual, the inner op
    of every MG smoother iteration, in ONE fused pass (folds the apply,
    the b subtraction, and the diagonal scaling that the jnp path runs
    as separate HBM passes)."""
    s, ny, nz = out.shape
    d = diag[:, :, :]
    nb = _nb_sum_lite(p_prev, p_cur, p_next, wxl, wxh_p, wyl, wzl,
                      s, ny, nz)
    ax = d * p_cur[:, :, :] - nb
    out[:, :, :] = (b[:, :, :] - ax) / d


def _kernel_resid_unit(p_prev, p_cur, p_next, wxl, wxh_p, wyl, wzl,
                       b, out):
    """Unit-diagonal residual: out = b − Â·p, no diag read, no divide."""
    s, ny, nz = out.shape
    nb = _nb_sum_lite(p_prev, p_cur, p_next, wxl, wxh_p, wyl, wzl,
                      s, ny, nz)
    out[:, :, :] = b[:, :, :] - (p_cur[:, :, :] - nb)


def split_weights(wx, wy, wz):
    """Face weight arrays → the three cell-shaped LOW-face coefficient
    arrays (face-lite layout, module docstring): wxl[c] multiplies
    p[x−1]; the high-face coefficients are one-plane shifts recovered
    in-kernel, with the vacated domain-edge plane zero — exact because
    domain-boundary faces carry zero weight."""
    return (wx[:-1], wy[:, :-1], wz[:, :, :-1])


def _specs(nx, ny, nz, slab):
    """(p_prev-plane, p_cur-slab, p_next-plane, slab-factory, wxh-plane)
    BlockSpecs: the halo views are single planes — block index = element
    plane index for a block of x-extent 1 — so p is fetched once per
    slab plus two planes, not three full slabs. The wxh plane view (same
    index map as p_next) supplies the slab's last high-x face weights
    from the NEXT slab's first wxl plane (select-zeroed at the end
    block, `_wxh_last`)."""

    def blk(index_map=lambda i: (i, 0, 0)):
        return pl.BlockSpec((slab, ny, nz), index_map,
                            memory_space=pltpu.VMEM)

    def plane(index_map):
        return pl.BlockSpec((1, ny, nz), index_map,
                            memory_space=pltpu.VMEM)

    last = nx - 1
    nxt = plane(lambda i: (jnp.minimum((i + 1) * slab, last), 0, 0))
    return (
        plane(lambda i: (jnp.maximum(i * slab - 1, 0), 0, 0)),      # p_prev
        blk(),                                                       # p_cur
        nxt,                                                         # p_next
        blk,
        nxt,                                                         # wxh_p
    )


def _w_specs_args(split, blk, wxh_plane):
    """(specs, args) for the face-lite weight operands: wxl as the slab
    block PLUS its +SLAB plane view, wyl/wzl as slab blocks."""
    wxl, wyl, wzl = split
    return ([blk(), wxh_plane, blk(), blk()], [wxl, wxl, wyl, wzl])


@functools.partial(jax.jit, static_argnames=("interpret",))
def apply_7pt(p, split, diag=None, interpret=False):
    """A(p) via the fused kernel. `split` from `split_weights`.
    `diag=None` = unit diagonal (the scaled operator Â) — one fewer HBM
    array streamed per apply."""
    nx, ny, nz = p.shape
    slab = pick_slab(nx)
    assert slab, f"nx={nx} not a multiple of 4"
    prev, cur, nxt, blk, wxh_p = _specs(nx, ny, nz, slab)
    w_specs, w_args = _w_specs_args(split, blk, wxh_p)
    if diag is None:
        return pl.pallas_call(
            _kernel_unit,
            grid=(nx // slab,),
            in_specs=[prev, cur, nxt] + w_specs,
            out_specs=blk(),
            out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
            interpret=interpret,
        )(p, p, p, *w_args)
    return pl.pallas_call(
        _kernel,
        grid=(nx // slab,),
        in_specs=[prev, cur, nxt] + w_specs + [blk()],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
        interpret=interpret,
    )(p, p, p, *w_args, diag)


@functools.partial(jax.jit, static_argnames=("interpret",))
def resid_scaled_7pt(p, split, diag, b, interpret=False):
    """(b − A·p)/diag via the fused kernel (smoother inner op).
    `diag=None` = unit diagonal: b − Â·p with no diag read or divide."""
    nx, ny, nz = p.shape
    slab = pick_slab(nx)
    assert slab, f"nx={nx} not a multiple of 4"
    prev, cur, nxt, blk, wxh_p = _specs(nx, ny, nz, slab)
    w_specs, w_args = _w_specs_args(split, blk, wxh_p)
    if diag is None:
        return pl.pallas_call(
            _kernel_resid_unit,
            grid=(nx // slab,),
            in_specs=[prev, cur, nxt] + w_specs + [blk()],
            out_specs=blk(),
            out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
            interpret=interpret,
        )(p, p, p, *w_args, b)
    return pl.pallas_call(
        _kernel_resid,
        grid=(nx // slab,),
        in_specs=[prev, cur, nxt] + w_specs + [blk(), blk()],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
        interpret=interpret,
    )(p, p, p, *w_args, diag, b)


@functools.partial(jax.jit, static_argnames=("interpret",))
def apply_dot_7pt(p, split, interpret=False):
    """(Â·p, p·Â·p) in one pass — the CG curvature step. The partial dot
    per x-slab lands in SMEM; the final Σ over ~nx/SLAB scalars is free.
    Unit-diagonal (scaled space) only — that is the only place CG runs."""
    nx, ny, nz = p.shape
    slab = pick_slab(nx)
    assert slab, f"nx={nx} not a multiple of 4"
    prev, cur, nxt, blk, wxh_p = _specs(nx, ny, nz, slab)
    w_specs, w_args = _w_specs_args(split, blk, wxh_p)
    nblk = nx // slab
    ap, partials = pl.pallas_call(
        _kernel_apply_dot_unit,
        grid=(nblk,),
        in_specs=[prev, cur, nxt] + w_specs,
        out_specs=(
            blk(),
            pl.BlockSpec((nblk,), lambda i: (0,), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(p.shape, p.dtype),
            jax.ShapeDtypeStruct((nblk,), jnp.float32),
        ),
        interpret=interpret,
    )(p, p, p, *w_args)
    return ap, jnp.sum(partials)


# ---------------------------------------------------------------- fused
# degree-2 Chebyshev smoothing (the V-cycle's top-level pre/post sweeps,
# solver/poisson.py _chebyshev) — one kernel pass each instead of ~4
# stencil passes + the axpy chains between them. Unit-diagonal (scaled)
# operator only — that is the only level the top smoother runs on.
#
# Halo reach is ±2 x-planes (two chained stencil applies); the clamped
# index maps at the global ends produce stale values that are always
# multiplied by the zero boundary-face weights before they can reach a
# real cell (same invariant as the single-apply kernels above).


def _in_plane_nb(xc, wyl, wyh, wzl, wzh, ny, nz):
    ym = jnp.concatenate([xc[:, :1, :], xc[:, : ny - 1, :]], 1)
    yp = jnp.concatenate([xc[:, 1:, :], xc[:, ny - 1 :, :]], 1)
    zm = jnp.concatenate([xc[:, :, :1], xc[:, :, : nz - 1]], 2)
    zp = jnp.concatenate([xc[:, :, 1:], xc[:, :, nz - 1 :]], 2)
    return wyl * ym + wyh * yp + wzl * zm + wzh * zp


def _hat_apply(xm, xc, xp, w6, ny, nz):
    """Â·x = x − Σ w·x_nb with explicit x-neighbor plane ranges."""
    wxl, wxh, wyl, wyh, wzl, wzh = w6
    nb = (wxl * xm + wxh * xp
          + _in_plane_nb(xc, wyl, wyh, wzl, wzh, ny, nz))
    return xc - nb


def _expand_w_ext(wxl_m, wxl_c, wxl_p1, wxl_p2,
                  wyl_m, wyl_c, wyl_p, wzl_m, wzl_c, wzl_p):
    """Face-lite → the six coefficient arrays over the cheb kernels'
    EXTENDED range (cells gi−1 … gi+s, s+2 planes). wxh over that range
    is wxl[gi … gi+s+1] = (cur slab, +SLAB plane, +SLAB+1 plane); the
    two planes are select-zeroed at the end block (true boundary /
    halo-plane high-face weights — matches the pre-face-lite kernels'
    clamped wxh views bitwise, since wxh[nx−1] = wx[nx] = 0). wyh/wzh
    are in-plane shifts with exact-zero boundary-face fills."""
    end = pl.program_id(0) == pl.num_programs(0) - 1
    p1 = wxl_p1[...]
    p2 = wxl_p2[...]
    p1z = jnp.where(end, jnp.zeros_like(p1), p1)
    p2z = jnp.where(end, jnp.zeros_like(p2), p2)
    c = wxl_c[...]
    wxl_e = jnp.concatenate([wxl_m[...], c, p1], axis=0)
    wxh_e = jnp.concatenate([c, p1z, p2z], axis=0)
    wyl_e = jnp.concatenate([wyl_m[...], wyl_c[...], wyl_p[...]], axis=0)
    wyh_e = jnp.concatenate(
        [wyl_e[:, 1:, :], jnp.zeros_like(wyl_e[:, :1, :])], axis=1)
    wzl_e = jnp.concatenate([wzl_m[...], wzl_c[...], wzl_p[...]], axis=0)
    wzh_e = jnp.concatenate(
        [wzl_e[:, :, 1:], jnp.zeros_like(wzl_e[:, :, :1])], axis=2)
    return (wxl_e, wxh_e, wyl_e, wyh_e, wzl_e, wzh_e)


def _cheb_coefs(lmax, lmin_frac):
    a, c = lmin_frac * lmax, 1.02 * lmax
    theta = 0.5 * (c + a)
    delta = 0.5 * (c - a)
    sigma = theta / delta
    rho = 1.0 / sigma
    rho_new = 1.0 / (2.0 * sigma - rho)
    return theta, rho_new * rho, 2.0 * rho_new / delta


def _kernel_cheb2_pre(theta, c_pp, c_pd,
                      b_m2, b_m1, b_c, b_p1, b_p2,
                      wxl_m, wxl_c, wxl_p1, wxl_p2,
                      wyl_m, wyl_c, wyl_p, wzl_m, wzl_c, wzl_p,
                      x_out, r_out):
    """Degree-2 Chebyshev from x≡0 on Â, PLUS the post-smooth residual:
    x = cheb2(0, b), r = b − Â·x — the V-cycle entry's full top-level
    work (poisson._vcycle_hybrid) in one pass."""
    s, ny, nz = x_out.shape
    be = jnp.concatenate(
        [r[...] for r in (b_m2, b_m1, b_c, b_p1, b_p2)], axis=0)  # s+4
    w6e = _expand_w_ext(wxl_m, wxl_c, wxl_p1, wxl_p2,               # s+2
                        wyl_m, wyl_c, wyl_p, wzl_m, wzl_c, wzl_p)
    # x1 = p1 = b/θ  (cells gi−2 … gi+s+1).
    x1e = be / theta
    # d1 = b − Â·x1 on the weight range (cells gi−1 … gi+s).
    ax1 = _hat_apply(x1e[: s + 2], x1e[1 : s + 3], x1e[2 : s + 4],
                     w6e, ny, nz)
    d1 = be[1 : s + 3] - ax1
    # Second Chebyshev term; x2 on the same range.
    p2 = c_pp * x1e[1 : s + 3] + c_pd * d1
    x2 = x1e[1 : s + 3] + p2
    # Residual on the slab (cells gi … gi+s−1).
    w6c = tuple(w[1 : s + 1] for w in w6e)
    ax2 = _hat_apply(x2[:s], x2[1 : s + 1], x2[2 : s + 2], w6c, ny, nz)
    x_out[:, :, :] = x2[1 : s + 1]
    r_out[:, :, :] = be[2 : s + 2] - ax2


def _kernel_cheb2_post(theta, c_pp, c_pd,
                       x_m2, x_m1, x_c, x_p1, x_p2,
                       b_m1, b_c, b_p1,
                       wxl_m, wxl_c, wxl_p1, wxl_p2,
                       wyl_m, wyl_c, wyl_p, wzl_m, wzl_c, wzl_p,
                       x_out):
    """Degree-2 Chebyshev continuation from the corrected x (the
    V-cycle's post-smooth) in one pass. `x_out` may be a wider dtype
    than the inputs (bf16 cycle → f32 CG hand-off): the cast rides the
    store instead of costing its own HBM pass."""
    s, ny, nz = x_out.shape
    xe = jnp.concatenate(
        [r[...] for r in (x_m2, x_m1, x_c, x_p1, x_p2)], axis=0)  # s+4
    be = jnp.concatenate(
        [r[...] for r in (b_m1, b_c, b_p1)], axis=0)               # s+2
    w6e = _expand_w_ext(wxl_m, wxl_c, wxl_p1, wxl_p2,
                        wyl_m, wyl_c, wyl_p, wzl_m, wzl_c, wzl_p)
    # d1 = b − Â·x on cells gi−1 … gi+s.
    ax = _hat_apply(xe[: s + 2], xe[1 : s + 3], xe[2 : s + 4],
                    w6e, ny, nz)
    d1 = be - ax
    p1 = d1 / theta
    x1 = xe[1 : s + 3] + p1
    # Second term on the slab.
    w6c = tuple(w[1 : s + 1] for w in w6e)
    ax1 = _hat_apply(x1[:s], x1[1 : s + 1], x1[2 : s + 2], w6c, ny, nz)
    d2 = be[1 : s + 1] - ax1
    p2 = c_pp * p1[1 : s + 1] + c_pd * d2
    x_out[:, :, :] = (x1[1 : s + 1] + p2).astype(x_out.dtype)


def _kernel_cheb2_post_dot(theta, c_pp, c_pd,
                           x_m2, x_m1, x_c, x_p1, x_p2,
                           b_m1, b_c, b_p1,
                           wxl_m, wxl_c, wxl_p1, wxl_p2,
                           wyl_m, wyl_c, wyl_p, wzl_m, wzl_c, wzl_p,
                           x_out, partial):
    """cheb2_post PLUS the CG coupling dot Σ b·x_out (per-slab partial
    to SMEM): b is the residual r the V-cycle preconditions and x_out
    is z = M⁻¹r, so this emits rz for CG's beta without the separate
    2-array dot pass over r and z. b is the cycle's low-precision copy
    of r — an O(2⁻⁹)-relative perturbation of rz, the flexible-CG
    regime the bf16 V-cycle already operates in."""
    s, ny, nz = x_out.shape
    xe = jnp.concatenate(
        [r[...] for r in (x_m2, x_m1, x_c, x_p1, x_p2)], axis=0)  # s+4
    be = jnp.concatenate(
        [r[...] for r in (b_m1, b_c, b_p1)], axis=0)               # s+2
    w6e = _expand_w_ext(wxl_m, wxl_c, wxl_p1, wxl_p2,
                        wyl_m, wyl_c, wyl_p, wzl_m, wzl_c, wzl_p)
    ax = _hat_apply(xe[: s + 2], xe[1 : s + 3], xe[2 : s + 4],
                    w6e, ny, nz)
    d1 = be - ax
    p1 = d1 / theta
    x1 = xe[1 : s + 3] + p1
    w6c = tuple(w[1 : s + 1] for w in w6e)
    ax1 = _hat_apply(x1[:s], x1[1 : s + 1], x1[2 : s + 2], w6c, ny, nz)
    d2 = be[1 : s + 1] - ax1
    p2 = c_pp * p1[1 : s + 1] + c_pd * d2
    xf = (x1[1 : s + 1] + p2).astype(x_out.dtype)
    x_out[:, :, :] = xf
    partial[pl.program_id(0)] = jnp.sum(
        be[1 : s + 1].astype(jnp.float32) * xf.astype(jnp.float32),
        dtype=jnp.float32)


def _halo_specs(nx, ny, nz, slab):
    def blk():
        return pl.BlockSpec((slab, ny, nz), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def plane(index_map):
        return pl.BlockSpec((1, ny, nz), index_map,
                            memory_space=pltpu.VMEM)

    last = nx - 1
    m2 = plane(lambda i: (jnp.maximum(i * slab - 2, 0), 0, 0))
    m1 = plane(lambda i: (jnp.maximum(i * slab - 1, 0), 0, 0))
    p1 = plane(lambda i: (jnp.minimum((i + 1) * slab, last), 0, 0))
    p2 = plane(lambda i: (jnp.minimum((i + 1) * slab + 1, last), 0, 0))
    return blk, m2, m1, p1, p2


def _w_specs_args_ext(split, blk, m1, p1, p2):
    """(specs, args) for the cheb kernels' face-lite weight operands:
    wxl as (m1, slab, +SLAB, +SLAB+1) views, wyl/wzl as (m1, slab, p1)."""
    wxl, wyl, wzl = split
    specs = [m1, blk(), p1, p2, m1, blk(), p1, m1, blk(), p1]
    args = [wxl, wxl, wxl, wxl, wyl, wyl, wyl, wzl, wzl, wzl]
    return specs, args


@functools.partial(jax.jit,
                   static_argnames=("lmax", "lmin_frac", "interpret"))
def cheb2_pre_7pt(b, split, lmax, lmin_frac, interpret=False):
    """(x, r) = (cheb2-smooth of Â x = b from zero, b − Â·x) — one pass."""
    nx, ny, nz = b.shape
    slab = pick_slab(nx)
    assert slab, f"nx={nx} not a multiple of 4"
    theta, c_pp, c_pd = _cheb_coefs(lmax, lmin_frac)
    blk, m2, m1, p1, p2 = _halo_specs(nx, ny, nz, slab)

    w_specs, w_args = _w_specs_args_ext(split, blk, m1, p1, p2)
    return pl.pallas_call(
        functools.partial(_kernel_cheb2_pre, theta, c_pp, c_pd),
        grid=(nx // slab,),
        in_specs=[m2, m1, blk(), p1, p2] + w_specs,
        out_specs=(blk(), blk()),
        out_shape=(jax.ShapeDtypeStruct(b.shape, b.dtype),
                   jax.ShapeDtypeStruct(b.shape, b.dtype)),
        interpret=interpret,
    )(b, b, b, b, b, *w_args)


@functools.partial(jax.jit,
                   static_argnames=("lmax", "lmin_frac", "out_dtype",
                                    "interpret"))
def cheb2_post_7pt(x, b, split, lmax, lmin_frac, out_dtype=None,
                   interpret=False):
    """cheb2-smooth of Â x = b continuing from x — one pass.
    `out_dtype` widens the result on the store (the V-cycle's bf16→f32
    hand-off back to CG), replacing a separate astype HBM pass."""
    nx, ny, nz = b.shape
    slab = pick_slab(nx)
    assert slab, f"nx={nx} not a multiple of 4"
    theta, c_pp, c_pd = _cheb_coefs(lmax, lmin_frac)
    blk, m2, m1, p1, p2 = _halo_specs(nx, ny, nz, slab)

    w_specs, w_args = _w_specs_args_ext(split, blk, m1, p1, p2)
    return pl.pallas_call(
        functools.partial(_kernel_cheb2_post, theta, c_pp, c_pd),
        grid=(nx // slab,),
        in_specs=[m2, m1, blk(), p1, p2, m1, blk(), p1] + w_specs,
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct(b.shape, out_dtype or b.dtype),
        interpret=interpret,
    )(x, x, x, x, x, b, b, b, *w_args)


@functools.partial(jax.jit,
                   static_argnames=("lmax", "lmin_frac", "out_dtype",
                                    "interpret"))
def cheb2_post_dot_7pt(x, b, split, lmax, lmin_frac, out_dtype=None,
                       interpret=False):
    """(cheb2_post(x, b), Σ b·result) in one pass — the V-cycle exit
    smoother fused with CG's rz coupling dot (see _kernel_cheb2_post_dot
    for the precision caveat)."""
    nx, ny, nz = b.shape
    slab = pick_slab(nx)
    assert slab, f"nx={nx} not a multiple of 4"
    theta, c_pp, c_pd = _cheb_coefs(lmax, lmin_frac)
    blk, m2, m1, p1, p2 = _halo_specs(nx, ny, nz, slab)
    nblk = nx // slab

    w_specs, w_args = _w_specs_args_ext(split, blk, m1, p1, p2)
    z, partials = pl.pallas_call(
        functools.partial(_kernel_cheb2_post_dot, theta, c_pp, c_pd),
        grid=(nblk,),
        in_specs=[m2, m1, blk(), p1, p2, m1, blk(), p1] + w_specs,
        out_specs=(
            blk(),
            pl.BlockSpec((nblk,), lambda i: (0,), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(b.shape, out_dtype or b.dtype),
            jax.ShapeDtypeStruct((nblk,), jnp.float32),
        ),
        interpret=interpret,
    )(x, x, x, x, x, b, b, b, *w_args)
    return z, jnp.sum(partials)


_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the ~16 MB/core VMEM


def supported(shape, dtype=jnp.float32) -> bool:
    """f32 and bf16 grids with nx a multiple of 4 (slab 8 on 8-multiples,
    else 4 — `pick_slab`); slab working set (12 arrays for the resid
    kernel × double buffering) must fit VMEM."""
    nx, ny, nz = shape
    slab = pick_slab(nx)
    if slab is None or min(ny, nz) < 8:
        return False
    if dtype == jnp.float32:
        itemsize = 4
    elif dtype == jnp.bfloat16:
        itemsize = 2
    else:
        return False
    slab_bytes = slab * ny * _round_up(nz, 128) * itemsize
    return 12 * 2 * slab_bytes <= _VMEM_BUDGET


def _round_up(n, m):
    return -(-n // m) * m


# ------------------------------------------------------------------ sweep
# batch routing: custom_vmap wrappers. Outside vmap these are the plain
# single-grid kernels above; under `jax.vmap` (the geometry-batched
# sweep, parallel/sweep.py) the rule reroutes to the BATCH-NATIVE rank-4
# kernels (ops/pallas/seven_point_batch.py) — case axis in the lanes —
# instead of the Pallas batching rule's one-grid-program-per-case
# lowering whose per-case nz lane padding measured SLOWER than jnp
# (docs/ROADMAP.md §3b). The rule moves custom_vmap's leading batch axis
# back to trailing; with the sweep's native case-minor layout XLA
# cancels the two moveaxis ops, so the reroute is layout-free.
# Falls back to the vmapped single-grid kernel when an operand is
# unbatched or the batched shape fails `supported4` (VMEM).


def _interp() -> bool:
    return jax.default_backend() != "tpu"


def _mv(a):
    return jnp.moveaxis(a, 0, -1)


def _batch_ok(axis_size, in_batched, ref):
    from openfoam_tpp_tpu.ops.pallas import seven_point_batch as sb

    return all(in_batched) and sb.supported4(
        tuple(ref.shape[1:]) + (axis_size,), ref.dtype)


from jax.custom_batching import custom_vmap  # noqa: E402


@custom_vmap
def apply_7pt_v(p, wxl, wyl, wzl):
    """Â(p) (unit diagonal) — batch-aware routing (module note above)."""
    return apply_7pt(p, (wxl, wyl, wzl), interpret=_interp())


@apply_7pt_v.def_vmap
def _apply_7pt_v_rule(axis_size, in_batched, p, wxl, wyl, wzl):
    from openfoam_tpp_tpu.ops.pallas import seven_point_batch as sb

    if _batch_ok(axis_size, in_batched, p):
        out = sb.apply_7pt_nb(_mv(p), (_mv(wxl), _mv(wyl), _mv(wzl)),
                              interpret=_interp())
        return jnp.moveaxis(out, -1, 0), True
    ax = [0 if b else None for b in in_batched]
    out = jax.vmap(lambda q, a, b_, c: apply_7pt(
        q, (a, b_, c), interpret=_interp()), in_axes=ax)(p, wxl, wyl, wzl)
    return out, True


@custom_vmap
def apply_7pt_diag_v(p, wxl, wyl, wzl, diag):
    """A(p) (physical diagonal) — batch-aware routing."""
    return apply_7pt(p, (wxl, wyl, wzl), diag=diag, interpret=_interp())


@apply_7pt_diag_v.def_vmap
def _apply_7pt_diag_v_rule(axis_size, in_batched, p, wxl, wyl, wzl, diag):
    from openfoam_tpp_tpu.ops.pallas import seven_point_batch as sb

    if _batch_ok(axis_size, in_batched, p):
        out = sb.apply_7pt_nb(_mv(p), (_mv(wxl), _mv(wyl), _mv(wzl)),
                              diag=_mv(diag), interpret=_interp())
        return jnp.moveaxis(out, -1, 0), True
    ax = [0 if b else None for b in in_batched]
    out = jax.vmap(lambda q, a, b_, c, d: apply_7pt(
        q, (a, b_, c), diag=d, interpret=_interp()),
        in_axes=ax)(p, wxl, wyl, wzl, diag)
    return out, True


@custom_vmap
def resid_scaled_unit_7pt_v(p, wxl, wyl, wzl, b):
    """b − Â·p — batch-aware routing."""
    return resid_scaled_7pt(p, (wxl, wyl, wzl), None, b,
                            interpret=_interp())


@resid_scaled_unit_7pt_v.def_vmap
def _resid_unit_v_rule(axis_size, in_batched, p, wxl, wyl, wzl, b):
    from openfoam_tpp_tpu.ops.pallas import seven_point_batch as sb

    if _batch_ok(axis_size, in_batched, p):
        out = sb.resid_scaled_7pt_nb(
            _mv(p), (_mv(wxl), _mv(wyl), _mv(wzl)), None, _mv(b),
            interpret=_interp())
        return jnp.moveaxis(out, -1, 0), True
    ax = [0 if q else None for q in in_batched]
    out = jax.vmap(lambda q, a, b_, c, r: resid_scaled_7pt(
        q, (a, b_, c), None, r, interpret=_interp()),
        in_axes=ax)(p, wxl, wyl, wzl, b)
    return out, True


@custom_vmap
def resid_scaled_diag_7pt_v(p, wxl, wyl, wzl, diag, b):
    """(b − A·p)/diag — batch-aware routing."""
    return resid_scaled_7pt(p, (wxl, wyl, wzl), diag, b,
                            interpret=_interp())


@resid_scaled_diag_7pt_v.def_vmap
def _resid_diag_v_rule(axis_size, in_batched, p, wxl, wyl, wzl, diag, b):
    from openfoam_tpp_tpu.ops.pallas import seven_point_batch as sb

    if _batch_ok(axis_size, in_batched, p):
        out = sb.resid_scaled_7pt_nb(
            _mv(p), (_mv(wxl), _mv(wyl), _mv(wzl)), _mv(diag), _mv(b),
            interpret=_interp())
        return jnp.moveaxis(out, -1, 0), True
    ax = [0 if q else None for q in in_batched]
    out = jax.vmap(lambda q, a, b_, c, d, r: resid_scaled_7pt(
        q, (a, b_, c), d, r, interpret=_interp()),
        in_axes=ax)(p, wxl, wyl, wzl, diag, b)
    return out, True


@custom_vmap
def apply_dot_7pt_v(p, wxl, wyl, wzl):
    """(Â·p, p·Â·p) — batch-aware routing; the dot is per case."""
    return apply_dot_7pt(p, (wxl, wyl, wzl), interpret=_interp())


@apply_dot_7pt_v.def_vmap
def _apply_dot_v_rule(axis_size, in_batched, p, wxl, wyl, wzl):
    from openfoam_tpp_tpu.ops.pallas import seven_point_batch as sb

    if _batch_ok(axis_size, in_batched, p):
        ap, dots = sb.apply_dot_7pt_nb(
            _mv(p), (_mv(wxl), _mv(wyl), _mv(wzl)), interpret=_interp())
        return (jnp.moveaxis(ap, -1, 0), dots), (True, True)
    ax = [0 if q else None for q in in_batched]
    out = jax.vmap(lambda q, a, b_, c: apply_dot_7pt(
        q, (a, b_, c), interpret=_interp()), in_axes=ax)(p, wxl, wyl, wzl)
    return out, (True, True)


@functools.lru_cache(maxsize=None)
def cheb2_pre_v(lmax: float, lmin_frac: float):
    """custom_vmap'd cheb2_pre_7pt closed over its static coefficients.
    The batched rule DECOMPOSES the fused pass into two batch-native
    kernel applies + elementwise jnp (same math as _kernel_cheb2_pre) —
    no rank-4 cheb kernel exists, and the Pallas-batching-rule lowering
    of the fused one is the measured-slow per-case path."""

    @custom_vmap
    def f(b, wxl, wyl, wzl):
        return cheb2_pre_7pt(b, (wxl, wyl, wzl), lmax, lmin_frac,
                             interpret=_interp())

    @f.def_vmap
    def _rule(axis_size, in_batched, b, wxl, wyl, wzl):
        from openfoam_tpp_tpu.ops.pallas import seven_point_batch as sb

        if _batch_ok(axis_size, in_batched, b):
            theta, c_pp, c_pd = _cheb_coefs(lmax, lmin_frac)
            bb = _mv(b)
            w = (_mv(wxl), _mv(wyl), _mv(wzl))
            x1 = bb / theta
            d1 = bb - sb.apply_7pt_nb(x1, w, interpret=_interp())
            x2 = x1 + (c_pp * x1 + c_pd * d1)
            r = sb.resid_scaled_7pt_nb(x2, w, None, bb,
                                       interpret=_interp())
            return ((jnp.moveaxis(x2, -1, 0), jnp.moveaxis(r, -1, 0)),
                    (True, True))
        ax = [0 if q else None for q in in_batched]
        out = jax.vmap(lambda q, a, b_, c: cheb2_pre_7pt(
            q, (a, b_, c), lmax, lmin_frac, interpret=_interp()),
            in_axes=ax)(b, wxl, wyl, wzl)
        return out, (True, True)

    return f


@functools.lru_cache(maxsize=None)
def cheb2_post_v(lmax: float, lmin_frac: float, out_dtype=None):
    """custom_vmap'd cheb2_post_7pt (see cheb2_pre_v)."""

    @custom_vmap
    def f(x, b, wxl, wyl, wzl):
        return cheb2_post_7pt(x, b, (wxl, wyl, wzl), lmax, lmin_frac,
                              out_dtype=out_dtype, interpret=_interp())

    @f.def_vmap
    def _rule(axis_size, in_batched, x, b, wxl, wyl, wzl):
        from openfoam_tpp_tpu.ops.pallas import seven_point_batch as sb

        if _batch_ok(axis_size, in_batched, b):
            theta, c_pp, c_pd = _cheb_coefs(lmax, lmin_frac)
            xx, bb = _mv(x), _mv(b)
            w = (_mv(wxl), _mv(wyl), _mv(wzl))
            d1 = sb.resid_scaled_7pt_nb(xx, w, None, bb,
                                        interpret=_interp())
            p1 = d1 / theta
            x1 = xx + p1
            d2 = sb.resid_scaled_7pt_nb(x1, w, None, bb,
                                        interpret=_interp())
            out = (x1 + (c_pp * p1 + c_pd * d2)).astype(
                out_dtype or b.dtype)
            return jnp.moveaxis(out, -1, 0), True
        ax = [0 if q else None for q in in_batched]
        out = jax.vmap(lambda s, q, a, b_, c: cheb2_post_7pt(
            s, q, (a, b_, c), lmax, lmin_frac, out_dtype=out_dtype,
            interpret=_interp()), in_axes=ax)(x, b, wxl, wyl, wzl)
        return out, True

    return f


@functools.lru_cache(maxsize=None)
def cheb2_post_dot_v(lmax: float, lmin_frac: float, out_dtype=None):
    """custom_vmap'd cheb2_post_dot_7pt (see cheb2_pre_v); the rz
    coupling dot is per case."""

    @custom_vmap
    def f(x, b, wxl, wyl, wzl):
        return cheb2_post_dot_7pt(x, b, (wxl, wyl, wzl), lmax, lmin_frac,
                                  out_dtype=out_dtype, interpret=_interp())

    @f.def_vmap
    def _rule(axis_size, in_batched, x, b, wxl, wyl, wzl):
        from openfoam_tpp_tpu.ops.pallas import seven_point_batch as sb

        if _batch_ok(axis_size, in_batched, b):
            theta, c_pp, c_pd = _cheb_coefs(lmax, lmin_frac)
            xx, bb = _mv(x), _mv(b)
            w = (_mv(wxl), _mv(wyl), _mv(wzl))
            d1 = sb.resid_scaled_7pt_nb(xx, w, None, bb,
                                        interpret=_interp())
            p1 = d1 / theta
            x1 = xx + p1
            d2 = sb.resid_scaled_7pt_nb(x1, w, None, bb,
                                        interpret=_interp())
            z = (x1 + (c_pp * p1 + c_pd * d2)).astype(out_dtype or b.dtype)
            rz = jnp.sum(bb.astype(jnp.float32) * z.astype(jnp.float32),
                         axis=(0, 1, 2), dtype=jnp.float32)
            return (jnp.moveaxis(z, -1, 0), rz), (True, True)
        ax = [0 if q else None for q in in_batched]
        out = jax.vmap(lambda s, q, a, b_, c: cheb2_post_dot_7pt(
            s, q, (a, b_, c), lmax, lmin_frac, out_dtype=out_dtype,
            interpret=_interp()), in_axes=ax)(x, b, wxl, wyl, wzl)
        return out, (True, True)

    return f
