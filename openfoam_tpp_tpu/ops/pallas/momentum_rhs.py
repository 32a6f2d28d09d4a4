"""Fused momentum RHS (visc + dev2 − conv for all three MAC components) —
Pallas TPU kernel.

The jnp momentum path (solver/momentum.py) evaluates, per component q ∈
{u, v, w} and direction d:

    A_q = Σ_d [ ∂_d(μ ∂_d q) + ∂_d(μ ∂_q u_d − δ_qd (2/3) μ ∇·U)
                − ∂_d(rhoPhi_d · q̃_d) ]

as ~45 shifted-concat stencil passes (vanLeer MUSCL reconstruction per
(q, d) pair, variable-μ Laplacian, and the dev2 transpose stress of
fvSchemes:32). XLA fuses chains within each pass but still streams the
velocity/flux/μ fields from HBM many times per step. This kernel
computes all three components' full RHS in ONE pass over
(u, v, w, rhoPhi×3, μ, ∇·U): ~10 slab streams + thin halo planes.

This is the second attempt at this phase: the r2 "momentum megakernel"
(momentum3.py, deleted in r3) packed/unpacked layouts and used
roll-with-iota-mask shifts, and measured SLOWER than XLA fusion. This
version copies the infrastructure of the kernels that WON in r3
(ops/pallas/mules_flux.py / mules_fct.py): cell-shaped lower-face
layout, clamped index-map halo planes (no packing, no rolls), y/z axes
fully slab-resident. Gated OFF by default (OFTPP_MOM_PALLAS=1) until
the TPU A/B — win or delete.

Layout: face arrays are passed as CELL-shaped "lower-face" slices
(`u[:-1]`, `v[:, :-1]`, `w[:, :, :-1]`) — entry [i, j, k] is the face
between cells (i−1, j, k) and (i, j, k) for the x set, etc. The dropped
upper-boundary rows are exact zeros in the solver state (wall faces,
masked every step) EXCEPT w's open-top plane and rhoPhi_z's top plane,
which are passed separately (`w_top`, `rpz_top`). The returned RHS
arrays are likewise cell-shaped; the wrapper reassembles full face
arrays with zero wall rows and computes the open-top w plane via the
jnp helpers on a thin z-window (4 cells — the top plane's stencil is
window-exact).

Boundary equivalences (why clamped index maps reproduce the jnp path
bitwise):
  * cell-indexed axes (v/w/μ/∇·U along x; u along y/z; …): the jnp
    shifts are edge-clamped; an aliased halo view IS the clamp.
  * `cells_to_faces_avg` edge faces take the edge cell; the aliased
    average 0.5·(a0 + a0) = a0 reproduces it exactly.
  * `gradient_at_faces` zero boundary faces: (a0 − a0)/h = 0 via alias.
  * u along x (face-indexed): the array's own top row u[nx] is the
    dropped WALL row (exact 0) and the clamp beyond it is therefore
    also 0 — synthesized by zeroing the p1/p2 views on the last block.
    The bottom row u[0] is IN the cell-shaped array, so bottom clamps
    alias correctly with no fixup.
  * rhoPhi_x[nx] (wall) = 0: same last-block zeroing.
  * the zero-padded parallel-flux ends (`_zero_pad_axis`) fall out
    automatically: the padded flux at the domain-bottom face multiplies
    the wall rhoPhi (= 0) or is built with an explicit zero fill.

Reference analog: the momentum assembly inside `foamRun
incompressibleVoF` (SURVEY.md §3.2; fvSchemes:29 vanLeerV, :32 dev2).
Parity: tests/test_pallas_momentum.py asserts agreement with
solver/momentum.py's jnp path in interpret mode.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SLAB = int(_os.environ.get("OFTPP_MOM_SLAB", "4"))

_EPS = 1e-30


def _vl(delta_up, delta_down):
    """van Leer limited slope φ(r)·Δdown (ops/stencil.py vanleer_faces)."""
    r = delta_up / jnp.where(jnp.abs(delta_down) > _EPS, delta_down,
                             jnp.where(delta_down >= 0, _EPS, -_EPS))
    phi = (r + jnp.abs(r)) / (1.0 + jnp.abs(r))
    return phi * delta_down


# ---- slab-resident y/z shift helpers (exactly the jnp clamped shifts) ---

def _dn(a, ax):
    """a[.., j-1, ..] edge-clamped (shift_down)."""
    if ax == 1:
        return jnp.concatenate([a[:, :1], a[:, :-1]], 1)
    return jnp.concatenate([a[:, :, :1], a[:, :, :-1]], 2)


def _up(a, ax):
    """a[.., j+1, ..] edge-clamped (shift_up)."""
    if ax == 1:
        return jnp.concatenate([a[:, 1:], a[:, -1:]], 1)
    return jnp.concatenate([a[:, :, 1:], a[:, :, -1:]], 2)


def _upz(a, ax):
    """a[.., j+1, ..] with ZERO fill past the top (implicit zero face)."""
    if ax == 1:
        return jnp.concatenate([a[:, 1:], jnp.zeros_like(a[:, :1])], 1)
    return jnp.concatenate([a[:, :, 1:], jnp.zeros_like(a[:, :, :1])], 2)


def _dnz(a, ax):
    """a[.., j-1, ..] with ZERO fill below the bottom."""
    if ax == 1:
        return jnp.concatenate([jnp.zeros_like(a[:, :1]), a[:, :-1]], 1)
    return jnp.concatenate([jnp.zeros_like(a[:, :, :1]), a[:, :, :-1]], 2)


def _avg_lo(a, ax):
    """cells_to_faces_avg in lower-face cell layout: face j = 0.5·(a[j−1]
    + a[j]), edge face j=0 = a[0] (the aliased clamp average)."""
    return 0.5 * (_dn(a, ax) + a)


def _vanleer_lo(q, g, ax):
    """vanleer_faces along in-slab axis `ax` in lower-face layout on a
    CELL-indexed (along ax) array q: face j between cells j−1 and j,
    upwinded by g (same layout). Edge clamps match jnp's shift_down/up."""
    dm = q - _dn(q, ax)
    dp = _up(q, ax) - q
    up_plus = q + 0.5 * _vl(dm, dp)     # donor below face j+1 (cell j)
    up_minus = q - 0.5 * _vl(dp, dm)    # donor above face j   (cell j)
    return jnp.where(g >= 0.0, _dn(up_plus, ax), up_minus)


def _vanleer_full(q, g, ax):
    """vanleer_faces along `ax` on a FULL (n+1 entries: n cells plus one)
    slab-resident extent — used where the face set includes the top
    face (z with the open-top plane appended). q has n entries along ax,
    g has n+1; returns n+1 faces (jnp face_lr clamps at both ends)."""
    dm = q - _dn(q, ax)
    dp = _up(q, ax) - q
    up_plus = q + 0.5 * _vl(dm, dp)
    up_minus = q - 0.5 * _vl(dp, dm)
    if ax == 1:
        fl = jnp.concatenate([up_plus[:, :1], up_plus], 1)
        fr = jnp.concatenate([up_minus, up_minus[:, -1:]], 1)
    else:
        fl = jnp.concatenate([up_plus[:, :, :1], up_plus], 2)
        fr = jnp.concatenate([up_minus, up_minus[:, :, -1:]], 2)
    return jnp.where(g >= 0.0, fl, fr)


def _kernel(hx, hy, hz, dev2,
            u_m2, u_m1, u_c, u_p1, u_p2,
            v_m2, v_m1, v_c, v_p1, v_p2,
            w_m2, w_m1, w_c, w_p1, w_p2,
            wt_m1, wt_c,
            rx_m1, rx_c, rx_p1,
            ry_m1, ry_c,
            rz_m1, rz_c,
            rzt_m1, rzt_c,
            mu_m1, mu_c, mu_p1,
            du_m1, du_c,
            au, av, aw):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    s = au.shape[0]

    (u_m2, u_m1, u_c, u_p1, u_p2, v_m2, v_m1, v_c, v_p1, v_p2,
     w_m2, w_m1, w_c, w_p1, w_p2, wt_m1, wt_c,
     rx_m1, rx_c, rx_p1, ry_m1, ry_c, rz_m1, rz_c, rzt_m1, rzt_c,
     mu_m1, mu_c, mu_p1, du_m1, du_c) = (
        r[...] for r in (
            u_m2, u_m1, u_c, u_p1, u_p2, v_m2, v_m1, v_c, v_p1, v_p2,
            w_m2, w_m1, w_c, w_p1, w_p2, wt_m1, wt_c,
            rx_m1, rx_c, rx_p1, ry_m1, ry_c, rz_m1, rz_c, rzt_m1, rzt_c,
            mu_m1, mu_c, mu_p1, du_m1, du_c))

    # Last-block synthesis: u's dropped wall row (and its clamp) and
    # rhoPhi_x's dropped wall row are exact zeros.
    end = jnp.where(i == n - 1, 0.0, 1.0)

    # Extended x ranges (global rows, S = slab, b = i*S):
    #   ue:  b−2 … b+S+1   (S+4)     ve/we: same, plain clamps
    #   rxe/mue: b−1 … b+S (S+2)     rye/rze/due/wte/rzte: b−1 … b+S−1
    ue = jnp.concatenate([u_m2, u_m1, u_c, u_p1 * end, u_p2 * end], 0)
    ve = jnp.concatenate([v_m2, v_m1, v_c, v_p1, v_p2], 0)
    we = jnp.concatenate([w_m2, w_m1, w_c, w_p1, w_p2], 0)
    rxe = jnp.concatenate([rx_m1, rx_c, rx_p1 * end], 0)
    rye = jnp.concatenate([ry_m1, ry_c], 0)
    mue = jnp.concatenate([mu_m1, mu_c, mu_p1], 0)
    due = jnp.concatenate([du_m1, du_c], 0)
    # z faces 0..nz (top plane appended), x rows b−1 … b+S−1:
    rzf = jnp.concatenate(
        [jnp.concatenate([rz_m1, rz_c], 0),
         jnp.concatenate([rzt_m1, rzt_c], 0)], 2)

    # ---- shared face-interpolated coefficients -------------------------
    # μ at x-faces if = b−1+t, t = 0 … S+1 (aliased edge average at the
    # global ends reproduces cells_to_faces_avg's edge-take).
    mx = 0.5 * (jnp.concatenate([mue[:1], mue[:-1]], 0) + mue)
    mx_f = mx[1:]                      # x-faces b … b+S  (S+1)
    me01 = _avg_lo(mx_f, 1)            # (x-face, y-face) edges, lower-face
    me02 = _avg_lo(mx_f, 2)            # (x-face, z-face) edges
    me02_top = mx_f[:, :, -1:]         # z-face nz (edge clamp)
    m12y = _avg_lo(mu_c, 1)            # avg(mu, 1) at blk rows
    me12 = _avg_lo(m12y, 2)            # (y-face, z-face) edges
    me12_top = m12y[:, :, -1:]

    # Mass-flux interpolants.
    gcx = 0.5 * (rxe[:-1] + rxe[1:])       # x-centers b−1 … b+S−1  (S+1)
    rx_f = rxe[1:]                         # x-faces  b … b+S      (S+1)
    gxy = _avg_lo(rx_f, 1)                 # rpx at (x-face, y-face)
    gxz = _avg_lo(rx_f, 2)                 # rpx at (x-face, z-face)
    gyx = 0.5 * (rye[:-1] + rye[1:])       # rpy at u x-rows b … b+S−1 (S)
    gyz = _avg_lo(rye[1:], 2)              # rpy at (y-face, z-face), blk
    gzx = 0.5 * (rzf[:-1] + rzf[1:])       # rpz at u x-rows, z 0..nz (S)
    rzf_b = rzf[1:]                        # blk rows, z faces 0..nz
    gzy = _avg_lo(rzf_b, 1)                # rpz at (y-face, z-face 0..nz)
    ry_b = rye[1:]                         # rpy blk rows (lower y-faces)
    gcy = 0.5 * (ry_b + _upz(ry_b, 1))     # rpy at y-centers (rpy[ny]=0)
    gcz = 0.5 * (rzf_b[:, :, :-1] + rzf_b[:, :, 1:])   # rpz at z-centers

    # Extended advected fields for the parallel terms.
    vey = jnp.concatenate([v_c, jnp.zeros_like(v_c[:, :1])], 1)
    wez = jnp.concatenate([w_c, wt_c], 2)
    wte = jnp.concatenate([wt_m1, wt_c], 0)          # rows b−1 … b+S−1

    # ======================= component u =================================
    # conv d=0: center fluxes fc[c] = gcx[c]·qf(face c+1), c = b−1 … b+S−1.
    D = ue[1:] - ue[:-1]                       # D[t] = u[b−2+t+1] − u[…]
    up_p = ue[1:-2] + 0.5 * _vl(D[:-2], D[1:-1])    # donor below, cells
    up_m = ue[2:-1] - 0.5 * _vl(D[2:], D[1:-1])     # donor above
    qf = jnp.where(gcx >= 0.0, up_p, up_m)          # faces c+1, S+1 rows
    fc = gcx * qf
    conv_u = (fc[1:] - fc[:-1]) / hx                # rows b … b+S−1
    # conv d=1: g = rpy averaged to u x-rows, lower y-faces; top face = 0.
    flx = gyx * _vanleer_lo(u_c, gyx, 1)
    conv_u += (_upz(flx, 1) - flx) / hy
    # conv d=2: g = rpz averaged to u x-rows, z faces 0..nz.
    flx = gzx * _vanleer_full(u_c, gzx, 2)
    conv_u += (flx[:, :, 1:] - flx[:, :, :-1]) / hz

    # visc d=0: center fluxes mu[c]·(u[c+1] − u[c])/hx, c = b−1 … b+S−1.
    du_dx = (ue[2:-1] - ue[1:-2]) / hx             # centers, S+1 rows
    fv = mue[:-1] * du_dx
    visc_u = (fv[1:] - fv[:-1]) / hx
    # visc d=1 / d=2: zero-gradient boundary faces come out automatically
    # from the clamped shifts; top-face flux is zero via _upz / explicit 0.
    dq = (u_c - _dn(u_c, 1)) / hy
    dq = jnp.concatenate([jnp.zeros_like(dq[:, :1]), dq[:, 1:]], 1)
    flx = me01[:-1] * dq
    visc_u += (_upz(flx, 1) - flx) / hy
    dq = (u_c - _dn(u_c, 2)) / hz
    dq = jnp.concatenate([jnp.zeros_like(dq[:, :, :1]), dq[:, :, 1:]], 2)
    flx = me02[:-1] * dq
    visc_u += (_upz(flx, 2) - flx) / hz

    a_u = visc_u - conv_u

    if dev2:
        # d=0: mu[c]·((u[c+1]−u[c])/hx − (2/3)∇·U[c]) at centers. The jnp
        # path zero-pads the center-flux ends; unlike the pure-gradient
        # visc flux (zero by aliasing), the −(2/3)∇·U part does NOT
        # vanish at the below-domain center — zero it explicitly on the
        # first block.
        begin = jnp.where(i == 0, 0.0, 1.0)
        fd = mue[:-1] * (du_dx - (2.0 / 3.0) * due)
        fd = jnp.concatenate([fd[:1] * begin, fd[1:]], 0)
        d2 = (fd[1:] - fd[:-1]) / hx
        # d=1: me01 · ∂v/∂x at (x-face b…b+S−1? faces live on u rows) —
        # flux rows are u positions (x-faces b … b+S−1), y faces 0..ny−1
        # lower-face; top y-face flux = 0 (v[ny] = 0).
        dv_dx = (ve[2:-2] - ve[1:-3]) / hx          # x-faces b … b+S−1 (S)
        flx = me01[:-1] * dv_dx
        d2 += (_upz(flx, 1) - flx) / hy
        # d=2: me02 · ∂w/∂x at z faces 0..nz (top = w_top's x-gradient).
        dw_dx = (we[2:-2] - we[1:-3]) / hx
        dwt_dx = (wte[1:] - wte[:-1]) / hx          # u rows b … b+S−1 (S)
        flx = jnp.concatenate(
            [me02[:-1] * dw_dx,
             jnp.broadcast_to(me02_top[:-1], dwt_dx.shape) * dwt_dx], 2)
        d2 += (flx[:, :, 1:] - flx[:, :, :-1]) / hz
        a_u += d2

    au[:, :, :] = a_u

    # ======================= component v =================================
    # conv d=0: fluxes at x-faces if = b … b+S (S+1 rows).
    D = ve[1:] - ve[:-1]
    up_p = ve[1:-2] + 0.5 * _vl(D[:-2], D[1:-1])    # cells b−1 … b+S−1
    up_m = ve[2:-1] - 0.5 * _vl(D[2:], D[1:-1])     # cells b … b+S
    qf = jnp.where(gxy >= 0.0, up_p, up_m)          # faces b … b+S
    flx = gxy * qf
    conv_v = (flx[1:] - flx[:-1]) / hx
    # conv d=1 (parallel, y): center fluxes on the zero-extended vey.
    vey_up = jnp.concatenate([vey[:, 1:], vey[:, -1:]], 1)
    vey_dn = jnp.concatenate([vey[:, :1], vey[:, :-1]], 1)
    dm = vey - vey_dn
    dp = vey_up - vey
    up_p = vey + 0.5 * _vl(dm, dp)
    up_m = vey_up - 0.5 * _vl(
        jnp.concatenate([dp[:, 1:], jnp.zeros_like(dp[:, -1:])], 1), dp)
    # centers c = 0 … ny−1 sit between vey[c] and vey[c+1]:
    qf = jnp.where(gcy >= 0.0, up_p[:, :-1], up_m[:, :-1])
    fc = gcy * qf
    conv_v += (fc - _dnz(fc, 1)) / hy
    # conv d=2: g = rpz at (y-face, z 0..nz).
    flx = gzy * _vanleer_full(v_c, gzy, 2)
    conv_v += (flx[:, :, 1:] - flx[:, :, :-1]) / hz

    # visc d=0: me01 · ∂v/∂x at x-faces b … b+S (zero ends via alias).
    dv_dx = (ve[2:-1] - ve[1:-2]) / hx              # faces b … b+S (S+1)
    flx = me01 * dv_dx
    visc_v = (flx[1:] - flx[:-1]) / hx
    # visc d=1 (parallel): mu[c]·(vey[c+1] − vey[c])/hy at y-centers.
    dv_dy = (vey[:, 1:] - vey[:, :-1]) / hy         # centers 0 … ny−1
    fv = mu_c * dv_dy
    visc_v += (fv - _dnz(fv, 1)) / hy
    # visc d=2: me12 · ∂v/∂z (zero top/bottom faces via clamps).
    dq = (v_c - _dn(v_c, 2)) / hz
    dq = jnp.concatenate([jnp.zeros_like(dq[:, :, :1]), dq[:, :, 1:]], 2)
    flx = me12 * dq
    visc_v += (_upz(flx, 2) - flx) / hz

    a_v = visc_v - conv_v

    if dev2:
        # d=0: me01 · ∂u/∂y at u rows (x-faces b … b+S): u's synthetic
        # top row is already zero in ue.
        u_f = ue[2:-1]                              # u rows b … b+S (S+1)
        duy = (u_f - _dn(u_f, 1)) / hy
        duy = jnp.concatenate(
            [jnp.zeros_like(duy[:, :1]), duy[:, 1:]], 1)
        flx = me01 * duy
        d2 = (flx[1:] - flx[:-1]) / hx
        # d=1 (parallel): mu[c]·(dv_dy − (2/3)∇·U) at y-centers.
        fd = mu_c * (dv_dy - (2.0 / 3.0) * du_c)
        d2 += (fd - _dnz(fd, 1)) / hy
        # d=2: me12 · ∂w/∂y at (y-face, z-face 0..nz).
        dwy = (wez - _dn(wez, 1)) / hy
        dwy = jnp.concatenate(
            [jnp.zeros_like(dwy[:, :1]), dwy[:, 1:]], 1)
        flx = jnp.concatenate([me12, me12_top], 2) * dwy
        d2 += (flx[:, :, 1:] - flx[:, :, :-1]) / hz
        a_v += d2

    av[:, :, :] = a_v

    # ======================= component w =================================
    # conv d=0: fluxes at x-faces b … b+S.
    D = we[1:] - we[:-1]
    up_p = we[1:-2] + 0.5 * _vl(D[:-2], D[1:-1])
    up_m = we[2:-1] - 0.5 * _vl(D[2:], D[1:-1])
    qf = jnp.where(gxz >= 0.0, up_p, up_m)
    flx = gxz * qf
    conv_w = (flx[1:] - flx[:-1]) / hx
    # conv d=1: g = rpy at (y-face, z-face 0..nz−1 kept rows).
    flx = gyz * _vanleer_lo(w_c, gyz, 1)
    conv_w += (_upz(flx, 1) - flx) / hy
    # conv d=2 (parallel, z): center fluxes on wez (w[nz] = w_top).
    wez_up = jnp.concatenate([wez[:, :, 1:], wez[:, :, -1:]], 2)
    wez_dn = jnp.concatenate([wez[:, :, :1], wez[:, :, :-1]], 2)
    dm = wez - wez_dn
    dp = wez_up - wez
    up_p = wez + 0.5 * _vl(dm, dp)
    up_m = wez_up - 0.5 * _vl(
        jnp.concatenate([dp[:, :, 1:], jnp.zeros_like(dp[:, :, -1:])], 2),
        dp)
    qf = jnp.where(gcz >= 0.0, up_p[:, :, :-1], up_m[:, :, :-1])
    fc = gcz * qf
    conv_w += (fc - _dnz(fc, 2)) / hz

    # visc d=0: me02 · ∂w/∂x at x-faces b … b+S, z rows 0..nz−1.
    dw_dx = (we[2:-1] - we[1:-2]) / hx
    flx = me02 * dw_dx
    visc_w = (flx[1:] - flx[:-1]) / hx
    # visc d=1: me12 · ∂w/∂y.
    dq = (w_c - _dn(w_c, 1)) / hy
    dq = jnp.concatenate([jnp.zeros_like(dq[:, :1]), dq[:, 1:]], 1)
    flx = me12 * dq
    visc_w += (_upz(flx, 1) - flx) / hy
    # visc d=2 (parallel): mu[c]·(wez[c+1] − wez[c])/hz at z-centers.
    dw_dz = (wez[:, :, 1:] - wez[:, :, :-1]) / hz
    fv = mu_c * dw_dz
    visc_w += (fv - _dnz(fv, 2)) / hz

    a_w = visc_w - conv_w

    if dev2:
        # d=0: me02 · ∂u/∂z at u rows (x-faces b … b+S).
        u_f = ue[2:-1]
        duz = (u_f - _dn(u_f, 2)) / hz
        duz = jnp.concatenate(
            [jnp.zeros_like(duz[:, :, :1]), duz[:, :, 1:]], 2)
        flx = me02 * duz
        d2 = (flx[1:] - flx[:-1]) / hx
        # d=1: me12 · ∂v/∂z at (y-face 0..ny−1, z rows); top y flux = 0.
        dvz = (v_c - _dn(v_c, 2)) / hz
        dvz = jnp.concatenate(
            [jnp.zeros_like(dvz[:, :, :1]), dvz[:, :, 1:]], 2)
        flx = me12 * dvz
        d2 += (_upz(flx, 1) - flx) / hy
        # d=2 (parallel): mu[c]·(dw_dz − (2/3)∇·U) at z-centers.
        fd = mu_c * (dw_dz - (2.0 / 3.0) * du_c)
        d2 += (fd - _dnz(fd, 2)) / hz
        a_w += d2

    aw[:, :, :] = a_w


@functools.partial(jax.jit,
                   static_argnames=("spacing", "dev2", "open_top",
                                    "interpret"))
def momentum_rhs(u, v, w, rho_phi, mu, div_u, spacing, dev2=True,
                 open_top=True, interpret=False):
    """Full momentum RHS (visc [+ dev2] − conv) for all three components.

    Takes the FULL face arrays (as solver/timestep.py holds them) and
    returns full face arrays; wall boundary rows are zero (they are
    masked downstream either way) and w's open-top plane is computed via
    the jnp helpers on a 4-cell z-window (window-exact for the top
    plane's stencil).
    """
    from openfoam_tpp_tpu.solver import momentum as mom

    nx, ny, nz = mu.shape
    assert nx % SLAB == 0
    nblocks = nx // SLAB
    rpx, rpy, rpz = rho_phi
    if div_u is None:
        div_u = jnp.zeros_like(mu)

    def blk():
        return pl.BlockSpec((SLAB, ny, nz), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def blk2():
        return pl.BlockSpec((SLAB, ny, 1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    last = nx - 1

    def plane(index_map, zw=nz):
        return pl.BlockSpec((1, ny, zw), index_map,
                            memory_space=pltpu.VMEM)

    m2 = lambda i: (jnp.maximum(i * SLAB - 2, 0), 0, 0)          # noqa: E731
    m1 = lambda i: (jnp.maximum(i * SLAB - 1, 0), 0, 0)          # noqa: E731
    p1 = lambda i: (jnp.minimum((i + 1) * SLAB, last), 0, 0)     # noqa: E731
    p2 = lambda i: (jnp.minimum((i + 1) * SLAB + 1, last), 0, 0)  # noqa: E731

    def face5():
        return [plane(m2), plane(m1), blk(), plane(p1), plane(p2)]

    hx, hy, hz = (float(s) for s in spacing)
    kern = functools.partial(_kernel, hx, hy, hz, bool(dev2))

    au, av, aw = pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=(face5() + face5() + face5()
                  + [plane(m1, 1), blk2()]                      # w_top
                  + [plane(m1), blk(), plane(p1)]               # rpx
                  + [plane(m1), blk()]                          # rpy
                  + [plane(m1), blk()]                          # rpz
                  + [plane(m1, 1), blk2()]                      # rpz top
                  + [plane(m1), blk(), plane(p1)]               # mu
                  + [plane(m1), blk()]),                        # div_u
        out_specs=[blk(), blk(), blk()],
        out_shape=[jax.ShapeDtypeStruct((nx, ny, nz), mu.dtype)
                   for _ in range(3)],
        interpret=interpret,
    )(u[:-1], u[:-1], u[:-1], u[:-1], u[:-1],
      v[:, :-1], v[:, :-1], v[:, :-1], v[:, :-1], v[:, :-1],
      w[:, :, :-1], w[:, :, :-1], w[:, :, :-1], w[:, :, :-1], w[:, :, :-1],
      w[:, :, -1:], w[:, :, -1:],
      rpx[:-1], rpx[:-1], rpx[:-1],
      rpy[:, :-1], rpy[:, :-1],
      rpz[:, :, :-1], rpz[:, :, :-1],
      rpz[:, :, -1:], rpz[:, :, -1:],
      mu, mu, mu,
      div_u, div_u)

    zx = jnp.zeros((1, ny, nz), mu.dtype)
    zy = jnp.zeros((nx, 1, nz), mu.dtype)
    au_full = jnp.concatenate([au, zx], 0)
    av_full = jnp.concatenate([av, zy], 1)

    if open_top:
        # Top w plane via the jnp helpers on a 4-cell z-window: the top
        # face's stencil reads cells nz−3 … nz−1 and clamps above — all
        # inside the window, so the plane is exact (see module docstring).
        K = 4
        u_w, v_w = u[:, :, -K:], v[:, :, -K:]
        w_w = w[:, :, -(K + 1):]
        mu_w = mu[:, :, -K:]
        rp_w = (rpx[:, :, -K:], rpy[:, :, -K:], rpz[:, :, -(K + 1):])
        edges_w = mom.edge_viscosities(mu_w)
        vc_top = (mom.viscous_face_field(w_w, 2, mu_w, spacing, edges_w)
                  - mom.convect_face_field(w_w, 2, rp_w, spacing))
        if dev2:
            vc_top = vc_top + mom.transpose_viscous_face_field(
                (u_w, v_w, w_w), 2, mu_w, spacing, edges_w,
                div_u[:, :, -K:])
        top = vc_top[:, :, -1:]
    else:
        top = jnp.zeros((nx, ny, 1), mu.dtype)
    aw_full = jnp.concatenate([aw, top], 2)
    return au_full, av_full, aw_full


_VMEM_BUDGET = 14 * 1024 * 1024


def supported(shape, dtype=jnp.float32) -> bool:
    """Conservative VMEM / layout feasibility check (mirrors
    mules_flux.supported)."""
    if len(shape) != 3:
        return False               # batched sweep layouts use the jnp path
    nx, ny, nz = shape
    if nx % SLAB or min(ny, nz) < 8 or dtype != jnp.float32:
        return False
    plane_bytes = ny * _round_up(nz, 128) * 4
    # Double-buffered streams: 8 slab inputs + 3 slab outputs + ~16 halo
    # planes, plus ~12 live extended-slab temps for the MUSCL chains.
    need = ((11 * SLAB + 16) * 2 + 12 * (SLAB + 4)) * plane_bytes
    return need <= _VMEM_BUDGET


def _round_up(n, m):
    return -(-n // m) * m
