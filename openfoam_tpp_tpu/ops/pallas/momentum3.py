"""Fused momentum RHS (visc − conv for all three MAC components) — Pallas.

The jnp momentum path (solver/momentum.py) evaluates 3 components × 3
directions × (vanLeer convection + viscous flux) as concat-based shifted
array chains — dozens of materialized intermediates streaming HBM. This
kernel computes all of

    A_q = Σ_d [ ∂_d(μ ∂_d q) − ∂_d(rhoPhi_d · q̃_d) ]   for q ∈ {u, v, w}

in ONE pass over (u, v, w, rhoPhi×3, μ). Matches solver/momentum.py's
discrete semantics exactly at open (aperture > 0) faces — asserted in
tests/test_pallas_momentum.py; wall faces are masked downstream.

Blocking: x-slabs of SLAB planes; each 3-D input arrives as three views
(2-plane tail of the previous slab, the slab, 2-plane head of the next —
the ±2 vanLeer halo). Inside the kernel every field is materialized as an
EXTENDED slab of SLAB+4 x-rows with ghost rows set by the field's
boundary policy (edge-clamp for cell-indexed axes; zero for dropped wall
faces; the w_top/rpz_top atmosphere planes for w/rhoPhi_z). x-shifts are
then plain slices; y/z shifts are `pltpu.roll` with iota-mask boundary
fixups. One grid dimension, Mosaic double-buffers the block streams.

Layout: PACKED cell-shaped fields (parallel/packed.py) — face f of
component q at index f is the LOWER face of cell f. The returned
(au, av, aw) are packed; the dropped top w-plane RHS is `w_top_rhs`
(a 2-D jnp slab). Reference analog: the momentum assembly inside
`foamRun incompressibleVoF` (SURVEY.md §3.2; fvSchemes:29 vanLeerV).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SLAB = 8
_H = 2          # halo planes per side
_EXT = SLAB + 2 * _H


def _limited(delta_up, delta_down, eps=1e-30):
    """van Leer limited slope φ(r)·Δdown (ops/stencil.py vanleer_faces)."""
    r = delta_up / jnp.where(jnp.abs(delta_down) > eps, delta_down,
                             jnp.where(delta_down >= 0, eps, -eps))
    phi = (r + jnp.abs(r)) / (1.0 + jnp.abs(r))
    return phi * delta_down


def _idx(shape, axis):
    return jax.lax.broadcasted_iota(jnp.int32, shape, axis)


def _extend_x(prev2, cur, next2, first, last, hi, top2d=None):
    """(EXT, ny, nz) slab with ghost rows [-2,-1] and [SLAB, SLAB+1].

    `first`/`last` are traced bools for the global end blocks, where the
    clamped halo views alias the block itself and must be replaced:
    lower ghosts clamp to the first row; upper ghosts follow `hi`:
    'clamp' (cell-indexed axis), 'zero' (dropped wall face), 'top'
    (the 2-D atmosphere plane `top2d`)."""
    ext = jnp.concatenate([prev2[:, :, :], cur[:, :, :], next2[:, :, :]], 0)
    pos = _idx(ext.shape, 0)
    row0 = ext[_H : _H + 1]
    ext = jnp.where(jnp.logical_and(first, pos < _H), row0, ext)
    if hi == "clamp":
        hi_val = ext[_H + SLAB - 1 : _H + SLAB]
    elif hi == "zero":
        hi_val = jnp.zeros_like(row0)
    else:  # 'top'
        hi_val = top2d[:, :, None][_H + SLAB - 1 : _H + SLAB]
    return jnp.where(jnp.logical_and(last, pos >= _H + SLAB), hi_val, ext)


def _extend_x2d(prev2, cur, next2, first, last):
    """Extended (EXT, ny) top plane from (·, ny, 1) views (the singleton
    z keeps the BlockSpec tiling legal; clamped ends)."""
    ext = jnp.concatenate(
        [prev2[:, :, 0], cur[:, :, 0], next2[:, :, 0]], 0
    )
    pos = _idx(ext.shape, 0)
    ext = jnp.where(jnp.logical_and(first, pos < _H), ext[_H : _H + 1], ext)
    return jnp.where(
        jnp.logical_and(last, pos >= _H + SLAB),
        ext[_H + SLAB - 1 : _H + SLAB], ext,
    )


class _F:
    """Extended-slab field with shift helpers.

    `hi`/`top` define the upper boundary value along axes 1/2 when the
    field's own face axis is transverse-shifted past the end; the x axis
    boundary policy is baked into the extension ghosts."""

    def __init__(self, ext, hi_y="clamp", hi_z="clamp", top_z=None):
        self.a = ext
        self.hi_y = hi_y
        self.hi_z = hi_z
        self.top_z = top_z     # (EXT, ny) plane for hi_z == 'top'

    def sx(self, k):
        """value at x−k (ghost rows absorb all boundary policy)."""
        if k == 0:
            return self.a
        if k > 0:
            pad = self.a[:1]
            body = jnp.concatenate([pad] * k + [self.a[:-k]], 0)
        else:
            pad = self.a[-1:]
            body = jnp.concatenate([self.a[-k:]] + [pad] * (-k), 0)
        return body

    def _roll(self, axis, k, hi):
        a = self.a
        n = a.shape[axis]
        pos = _idx(a.shape, axis)
        r = pltpu.roll(a, k % n, axis)
        if k > 0:   # value at idx−k: clamp the first k rows to row 0
            return jnp.where(pos >= k, r, _row(a, axis, 0))
        kk = -k     # value at idx+k: apply the hi policy to the last rows
        if hi == "clamp":
            hi_val = _row(a, axis, n - 1)
        elif hi == "zero":
            hi_val = jnp.zeros_like(_row(a, axis, 0))
        else:       # 'top'
            hi_val = self.top_z[:, :, None]
        return jnp.where(pos < n - kk, r, hi_val)

    def sy(self, k):
        return self.a if k == 0 else self._roll(1, k, self.hi_y)

    def sz(self, k):
        return self.a if k == 0 else self._roll(2, k, self.hi_z)

    def s(self, axis, k):
        return (self.sx, self.sy, self.sz)[axis](k)


def _vanleer_centers(q: _F, g, P):
    """Limited face value at cell centers c (between packed faces c, c+1)
    of the face field q along its own axis P, upwinded by g.

    q.s(P, -1) at the last row resolves to the field's upper boundary
    value (0 wall / w_top) via the ghost policy."""
    qm1 = q.s(P, 1)
    qp1 = q.s(P, -1)
    qp2 = q.s(P, -2)
    below = q.a + 0.5 * _limited(q.a - qm1, qp1 - q.a)
    above = qp1 - 0.5 * _limited(qp2 - qp1, qp1 - q.a)
    return jnp.where(g >= 0.0, below, above)


def _vanleer_faces(q: _F, g, d):
    """Limited value at d-faces f (between cells f−1, f) of the
    cell-indexed (along d) field q, upwinded by g."""
    qm1 = q.s(d, 1)
    qm2 = q.s(d, 2)
    qp1 = q.s(d, -1)
    below = qm1 + 0.5 * _limited(qm1 - qm2, q.a - qm1)
    above = q.a - 0.5 * _limited(qp1 - q.a, q.a - qm1)
    return jnp.where(g >= 0.0, below, above)


def _shift_zero(a, axis, k):
    """Plain shift with ZERO fill (flux arrays' zero-padded ends).
    Valid along y/z (full axis in-slab) and along x on EXTENDED arrays
    whose ghost rows carry the correct neighbor values."""
    if axis == 0:
        if k > 0:
            z = jnp.zeros_like(a[:1])
            return jnp.concatenate([z] * k + [a[:-k]], 0)
        z = jnp.zeros_like(a[:1])
        return jnp.concatenate([a[-k:]] + [z] * (-k), 0)
    pos = _idx(a.shape, axis)
    n = a.shape[axis]
    r = pltpu.roll(a, k % n, axis)
    if k > 0:
        return jnp.where(pos >= k, r, 0.0)
    return jnp.where(pos < n + k, r, 0.0)


def _component_rhs(P, q: _F, RP, MU: _F, rpztop, spacing):
    """visc − conv on the extended slab for the component with parallel
    axis P. `rpztop` is the (EXT, ny) atmosphere mass-flux plane."""
    out = jnp.zeros_like(q.a)
    dt = q.a.dtype
    nz = q.a.shape[2]
    posz = _idx(q.a.shape, 2)

    # ---- parallel direction: flux at cells, divergence at packed faces.
    rp = RP[P]
    g_c = 0.5 * (rp.a + rp.s(P, -1))   # rp upper ghost: 0 wall / rpz_top
    qf_c = _vanleer_centers(q, g_c, P)
    F = g_c * qf_c
    # out[f] −= (F[f] − F[f−1])/h; F[−1] = 0 only at the global start —
    # which is always a closed wall face, masked downstream. Along x the
    # extended ghosts carry the true neighbor F (recomputed from halo);
    # along y/z zero-fill matches the zero-padded flux ends.
    if P == 0:
        Fm1 = jnp.concatenate([jnp.zeros_like(F[:1]), F[:-1]], 0)
    else:
        Fm1 = _shift_zero(F, P, 1)
    out = out - (F - Fm1) / spacing[P]

    # parallel viscous: μ·∂q at cells, divergence at faces.
    dq = (q.s(P, -1) - q.a) / spacing[P]
    Fv = MU.a * dq
    if P == 0:
        Fvm1 = jnp.concatenate([jnp.zeros_like(Fv[:1]), Fv[:-1]], 0)
    else:
        Fvm1 = _shift_zero(Fv, P, 1)
    out = out + (Fv - Fvm1) / spacing[P]

    # ---- transverse directions.
    for d in range(3):
        if d == P:
            continue
        h = spacing[d]
        # g at (P-face, d-face) edges: rhoPhi_d averaged along P (clamped
        # at the P start by the ghost rows / roll clamp).
        g = 0.5 * (RP[d].s(P, 1) + RP[d].a)
        qf = _vanleer_faces(q, g, d)
        flux = g * qf
        if d == 0:
            flux_up = jnp.concatenate(
                [flux[1:], jnp.zeros_like(flux[:1])], 0
            )
        else:
            flux_up = _shift_zero(flux, d, -1)
        if d == 2:
            # Atmosphere d-face nz: flux = g_top · q[nz−1] (the clamped
            # vanLeer value at the top face — the zero upper slope kills
            # the MUSCL correction either way, see module docstring).
            # g_top = rpz_top averaged to P-faces (clamped at the start;
            # x clamping is carried by the extended ghost rows).
            if P == 0:
                g_top = 0.5 * (
                    jnp.concatenate([rpztop[:1], rpztop[:-1]], 0) + rpztop
                )
            else:  # P == 1: average along y with edge clamp
                shifted = jnp.concatenate(
                    [rpztop[:, :1], rpztop[:, :-1]], 1
                )
                g_top = 0.5 * (shifted + rpztop)
            top_flux = g_top[:, :, None] * q.a
            flux_up = jnp.where(posz == nz - 1, top_flux, flux_up)
        out = out - (flux_up - flux) / h

        # transverse viscous: 4-pt edge μ × boundary-face-zero gradient
        # (the shift's edge clamp makes the face-0 gradient vanish; the
        # face-n gradient is the zero fill of fv_up below).
        mu_P = 0.5 * (MU.s(P, 1) + MU.a)
        mu_edge = 0.5 * (_clamp_shift(mu_P, d, 1) + mu_P)
        dqd = (q.a - q.s(d, 1)) / h
        fv = mu_edge * dqd
        if d == 0:
            fv_up = jnp.concatenate([fv[1:], jnp.zeros_like(fv[:1])], 0)
        else:
            fv_up = _shift_zero(fv, d, -1)
        out = out + (fv_up - fv) / h
    return out


def _row(a, axis, i):
    """Static one-row slice along `axis` (kept broadcastable)."""
    sl = [slice(None)] * a.ndim
    sl[axis] = slice(i, i + 1)
    return a[tuple(sl)]


def _clamp_shift(a, axis, k):
    """Edge-clamped shift of a raw array (x via extended ghosts already
    in `a` when axis == 0 — plain slice; y/z via roll + clamp)."""
    if axis == 0:
        return jnp.concatenate([a[:1]] * k + [a[:-k]], 0)
    pos = _idx(a.shape, axis)
    r = pltpu.roll(a, k % a.shape[axis], axis)
    return jnp.where(pos >= k, r, _row(a, axis, 0))


def _make_kernel(spacing):
    hx, hy, hz = (float(s) for s in spacing)

    def kernel(*refs):
        # 7 fields × 3 views, then wtop/rpztop × 3 views, then 3 outputs.
        i = pl.program_id(0)
        n = pl.num_programs(0)
        first = (i == 0)
        last = (i == n - 1)
        views = [refs[3 * f : 3 * f + 3] for f in range(9)]
        au_ref, av_ref, aw_ref = refs[27], refs[28], refs[29]

        wtop = _extend_x2d(*views[7], first, last)
        rpztop = _extend_x2d(*views[8], first, last)

        U = _F(_extend_x(*views[0], first, last, hi="zero"))
        V = _F(_extend_x(*views[1], first, last, hi="clamp"), hi_y="zero")
        W = _F(_extend_x(*views[2], first, last, hi="clamp"),
               hi_z="top", top_z=wtop)
        RPX = _F(_extend_x(*views[3], first, last, hi="zero"))
        RPY = _F(_extend_x(*views[4], first, last, hi="clamp"), hi_y="zero")
        RPZ = _F(_extend_x(*views[5], first, last, hi="clamp"),
                 hi_z="top", top_z=rpztop)
        MU = _F(_extend_x(*views[6], first, last, hi="clamp"))
        RP = (RPX, RPY, RPZ)
        sp = (hx, hy, hz)

        au = _component_rhs(0, U, RP, MU, rpztop, sp)
        av = _component_rhs(1, V, RP, MU, rpztop, sp)
        aw = _component_rhs(2, W, RP, MU, rpztop, sp)
        au_ref[:, :, :] = au[_H : _H + SLAB]
        av_ref[:, :, :] = av[_H : _H + SLAB]
        aw_ref[:, :, :] = aw[_H : _H + SLAB]

    return kernel


@functools.partial(jax.jit, static_argnames=("spacing", "interpret"))
def momentum_rhs_packed(u, v, w, rpx, rpy, rpz, mu, w_top, rpz_top,
                        spacing, interpret=False):
    """(au, av, aw) = visc − conv on PACKED cell-shaped fields.

    All 3-D inputs are (nx, ny, nz) packed (lower faces); `w_top` and
    `rpz_top` are the (nx, ny) atmosphere planes (zeros for closed
    tanks). nx must be a SLAB multiple."""
    nx, ny, nz = u.shape
    assert nx % SLAB == 0, f"nx={nx} not a multiple of SLAB={SLAB}"
    nblocks = nx // SLAB
    hb = nblocks * (SLAB // _H) - 1  # tail/head blocks in _H units

    def blk3(index_map):
        return pl.BlockSpec((_H, ny, nz), index_map,
                            memory_space=pltpu.VMEM)

    def cur3():
        return pl.BlockSpec((SLAB, ny, nz), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def blk2(index_map):
        return pl.BlockSpec((_H, ny, 1), index_map,
                            memory_space=pltpu.VMEM)

    def cur2():
        return pl.BlockSpec((SLAB, ny, 1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    r = SLAB // _H
    prev3 = blk3(lambda i: (jnp.maximum(i * r - 1, 0), 0, 0))
    next3 = blk3(lambda i: (jnp.minimum(i * r + r, hb), 0, 0))
    prev2 = blk2(lambda i: (jnp.maximum(i * r - 1, 0), 0, 0))
    next2 = blk2(lambda i: (jnp.minimum(i * r + r, hb), 0, 0))

    in_specs = []
    args = []
    for a in (u, v, w, rpx, rpy, rpz, mu):
        in_specs += [prev3, cur3(), next3]
        args += [a, a, a]
    for a in (w_top, rpz_top):
        a3 = a[:, :, None]
        in_specs += [prev2, cur2(), next2]
        args += [a3, a3, a3]

    out = pl.pallas_call(
        _make_kernel(spacing),
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((SLAB, ny, nz), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        out_shape=[jax.ShapeDtypeStruct(u.shape, u.dtype) for _ in range(3)],
        interpret=interpret,
    )(*args)
    return tuple(out)


_VMEM_BUDGET = 13 * 1024 * 1024


def supported(shape, dtype=jnp.float32) -> bool:
    """f32 grids with nx a SLAB multiple and a slab working set that
    fits VMEM (7 inputs × (SLAB+4) planes + 3 outputs + temporaries)."""
    nx, ny, nz = shape
    if nx % SLAB or dtype != jnp.float32 or min(ny, nz) < 8:
        return False
    nz_pad = -(-nz // 128) * 128
    plane = ny * nz_pad * 4
    working = (7 * (SLAB + 2 * _H) + 3 * SLAB) * plane
    return 2 * working <= _VMEM_BUDGET


def momentum_rhs_mac(u, v, w, rho_phi, mu, spacing, interpret=False):
    """MAC-layout adapter: full (n+1)-face arrays in, (visc − conv) MAC
    arrays out. The dropped top w-plane is computed by `w_top_rhs` in jnp
    (a single 2-D slab)."""
    rpx, rpy, rpz = rho_phi
    au, av, aw = momentum_rhs_packed(
        u[:-1], v[:, :-1], w[:, :, :-1],
        rpx[:-1], rpy[:, :-1], rpz[:, :, :-1],
        mu, w[:, :, -1], rpz[:, :, -1],
        tuple(float(s) for s in spacing), interpret=interpret,
    )
    zx = jnp.zeros_like(au[:1])
    zy = jnp.zeros_like(av[:, :1])
    top = w_top_rhs(u, v, w, rho_phi, mu, spacing)
    return (
        jnp.concatenate([au, zx], 0),
        jnp.concatenate([av, zy], 1),
        jnp.concatenate([aw, top[:, :, None]], 2),
    )


def w_top_rhs(u, v, w, rho_phi, mu, spacing):
    """visc − conv for the single top w-plane (atmosphere face), jnp.

    Matches solver/momentum.py's full-array result at face nz exactly
    (derivation in the module docstring); all inputs are MAC arrays."""
    from openfoam_tpp_tpu.ops import stencil as st

    hx, hy, hz = (float(s) for s in spacing)
    rpx, rpy, rpz = rho_phi
    nz = w.shape[2] - 1

    # --- parallel z at face nz: conv_z = (F_pad[nz+1]=0 − F[nz−1])/hz,
    #     visc_z likewise with Fv[nz−1] = μ[nz−1]·(w[nz]−w[nz−1])/hz.
    g_c = 0.5 * (rpz[:, :, nz - 1] + rpz[:, :, nz])
    # vanLeer at cell nz−1 between faces nz−1 and nz (face nz+1 clamps,
    # so the donor-above MUSCL correction vanishes):
    dm = w[:, :, nz - 1] - w[:, :, nz - 2]
    dmid = w[:, :, nz] - w[:, :, nz - 1]
    below = w[:, :, nz - 1] + 0.5 * _limited(dm, dmid)
    qf = jnp.where(g_c >= 0.0, below, w[:, :, nz])
    acc = jnp.zeros_like(g_c)
    acc = acc - (0.0 - g_c * qf) / hz                      # −conv_z
    acc = acc + (0.0 - mu[:, :, nz - 1] * dmid / hz) / hz  # +visc_z

    # --- transverse x/y at the fixed top plane.
    wt = w[:, :, nz]
    for d, (rp, h) in enumerate(((rpx, hx), (rpy, hy))):
        # g: rho_phi[d] averaged along z — at face nz this clamps to the
        # top cell layer; values live on d-faces already.
        gl = rp[:, :, nz - 1]   # (nx+1, ny) for d=0 / (nx, ny+1) for d=1
        qf2 = st.vanleer_faces(wt[..., None], gl[..., None], d)[..., 0]
        flux = gl * qf2
        sl_hi = [slice(None)] * 2
        sl_lo = [slice(None)] * 2
        sl_hi[d] = slice(1, None)
        sl_lo[d] = slice(0, -1)
        acc = acc - (flux[tuple(sl_hi)] - flux[tuple(sl_lo)]) / h

        # viscous: mu edge (avg along z clamp → layer nz−1, then along d).
        mu_z = mu[:, :, nz - 1]
        mu_e = st.cells_to_faces_avg(mu_z[..., None], d)[..., 0]
        dq = st.gradient_at_faces(wt[..., None], d, h)[..., 0]
        fvt = mu_e * dq
        acc = acc + (fvt[tuple(sl_hi)] - fvt[tuple(sl_lo)]) / h
    return acc
