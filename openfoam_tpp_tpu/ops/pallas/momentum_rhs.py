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
(ops/pallas/mules_flux.py / mules_fct.py) — clamped index-map halo
planes over an x-slab grid, y/z axes fully slab-resident — with one
improvement over those: the FULL face arrays are passed (no `[:-1]`
slicing into a cell layout), so no slice copies are materialized in
front of the pallas_call, the staggered top planes (w's open-top row,
rhoPhi_z's atmosphere flux) arrive for free, and the kernel emits the
COMPLETE v / w face arrays including their boundary rows. Measured in
the r3 TPU A/B (200-step steady window, 1M-cell flagship): 186.2M vs
160.4M cell-updates/s (+16%) — now ON by default wherever use_pallas
is on (OFTPP_MOM_PALLAS=0 to disable; vmapped sweeps pin it off via
SolverControls.mom_pallas=False, single-grid design).

Boundary equivalences (why clamped index maps reproduce the jnp path
bitwise):
  * the jnp shifts are edge-clamped; an aliased halo view IS the clamp.
    For u along x the clamp beyond the top wall row is the wall row
    itself — a real array row here, so even the face-indexed axis needs
    no synthesized ghosts.
  * `cells_to_faces_avg` edge faces take the edge cell; the aliased
    average 0.5·(a0 + a0) = a0 reproduces it exactly.
  * `gradient_at_faces` zero boundary faces: explicit zero pads in the
    in-slab axes, (a0 − a0)/h = 0 via aliasing along x.
  * `_zero_pad_axis` parallel-flux ends: explicit zero pads (the one
    subtlety is dev2's −(2/3)∇·U term at the below-domain x-center,
    zeroed on the first block — the pure-gradient fluxes vanish there
    by aliasing, that term does not).

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


# ---- slab-resident y/z helpers (exactly the jnp stencil primitives) ----

def _dn(a, ax):
    """a[.., j−1, ..] edge-clamped (stencil.shift_down)."""
    if ax == 1:
        return jnp.concatenate([a[:, :1], a[:, :-1]], 1)
    return jnp.concatenate([a[:, :, :1], a[:, :, :-1]], 2)


def _up(a, ax):
    """a[.., j+1, ..] edge-clamped (stencil.shift_up)."""
    if ax == 1:
        return jnp.concatenate([a[:, 1:], a[:, -1:]], 1)
    return jnp.concatenate([a[:, :, 1:], a[:, :, -1:]], 2)


def _favg(c, ax):
    """cells_to_faces_avg: n cells → n+1 faces, edge faces take the edge
    cell."""
    mid = 0.5 * (_dn(c, ax) + c)
    if ax == 1:
        return jnp.concatenate([mid, c[:, -1:]], 1)
    return jnp.concatenate([mid, c[:, :, -1:]], 2)


def _gradf(c, ax, h):
    """gradient_at_faces: n cells → n+1 faces, zero at both boundary
    faces."""
    if ax == 1:
        d = (c[:, 1:] - c[:, :-1]) / h
        z = jnp.zeros_like(c[:, :1])
        return jnp.concatenate([z, d, z], 1)
    d = (c[:, :, 1:] - c[:, :, :-1]) / h
    z = jnp.zeros_like(c[:, :, :1])
    return jnp.concatenate([z, d, z], 2)


def _padz(f, ax):
    """_zero_pad_axis: zero plane on both ends of `ax`."""
    if ax == 1:
        z = jnp.zeros_like(f[:, :1])
        return jnp.concatenate([z, f, z], 1)
    z = jnp.zeros_like(f[:, :, :1])
    return jnp.concatenate([z, f, z], 2)


def _vanleer(q, g, ax):
    """vanleer_faces along in-slab axis `ax`: q has n entries (cell-like
    for this axis), g has n+1 faces; returns n+1 upwinded MUSCL face
    values (face_lr clamps at both ends, exactly stencil.vanleer_faces)."""
    dm = q - _dn(q, ax)
    dp = _up(q, ax) - q
    up_p = q + 0.5 * _vl(dm, dp)
    up_m = q - 0.5 * _vl(dp, dm)
    if ax == 1:
        fl = jnp.concatenate([up_p[:, :1], up_p], 1)
        fr = jnp.concatenate([up_m, up_m[:, -1:]], 1)
    else:
        fl = jnp.concatenate([up_p[:, :, :1], up_p], 2)
        fr = jnp.concatenate([up_m, up_m[:, :, -1:]], 2)
    return jnp.where(g >= 0.0, fl, fr)


def _diff(f, ax, h):
    """(f[j+1] − f[j]) / h along `ax` (n+1 faces → n cells)."""
    if ax == 0:
        return (f[1:] - f[:-1]) / h
    if ax == 1:
        return (f[:, 1:] - f[:, :-1]) / h
    return (f[:, :, 1:] - f[:, :, :-1]) / h


def _center_div(fc, ax, h):
    """Divergence of zero-padded center fluxes back at the face points:
    out[f] = (F[f+1] − F[f])/h with F = [0, fc, 0] (n centers → n+1
    faces)."""
    return _diff(_padz(fc, ax), ax, h)


def _kernel(hx, hy, hz, dev2,
            u_m2, u_m1, u_c, u_p1, u_p2,
            v_m2, v_m1, v_c, v_p1, v_p2,
            w_m2, w_m1, w_c, w_p1, w_p2,
            rx_m1, rx_c, rx_p1,
            ry_m1, ry_c,
            rz_m1, rz_c,
            mu_m1, mu_c, mu_p1,
            du_m1, du_c,
            au, av, aw):
    i = pl.program_id(0)

    (u_m2, u_m1, u_c, u_p1, u_p2, v_m2, v_m1, v_c, v_p1, v_p2,
     w_m2, w_m1, w_c, w_p1, w_p2,
     rx_m1, rx_c, rx_p1, ry_m1, ry_c, rz_m1, rz_c,
     mu_m1, mu_c, mu_p1, du_m1, du_c) = (
        r[...] for r in (
            u_m2, u_m1, u_c, u_p1, u_p2, v_m2, v_m1, v_c, v_p1, v_p2,
            w_m2, w_m1, w_c, w_p1, w_p2,
            rx_m1, rx_c, rx_p1, ry_m1, ry_c, rz_m1, rz_c,
            mu_m1, mu_c, mu_p1, du_m1, du_c))

    # Extended x ranges (global rows; b = i·S). All clamps at the global
    # ends are index-map aliases of REAL rows (walls included), so no
    # ghost synthesis is needed anywhere.
    #   ue/ve/we: b−2 … b+S+1 (S+4)   rxe/mue: b−1 … b+S (S+2)
    #   rye/rze/due:          b−1 … b+S−1 (S+1)
    ue = jnp.concatenate([u_m2, u_m1, u_c, u_p1, u_p2], 0)
    ve = jnp.concatenate([v_m2, v_m1, v_c, v_p1, v_p2], 0)
    we = jnp.concatenate([w_m2, w_m1, w_c, w_p1, w_p2], 0)
    rxe = jnp.concatenate([rx_m1, rx_c, rx_p1], 0)
    rye = jnp.concatenate([ry_m1, ry_c], 0)
    rze = jnp.concatenate([rz_m1, rz_c], 0)
    mue = jnp.concatenate([mu_m1, mu_c, mu_p1], 0)
    due = jnp.concatenate([du_m1, du_c], 0)

    # The jnp path zero-pads dev2's x-flux ends and the −(2/3)∇·U part
    # does NOT vanish at the below-domain center — zero it on block 0.
    begin = jnp.where(i == 0, 0.0, 1.0)
    _mom_core(hx, hy, hz, dev2, begin, ue, ve, we, rxe, rye, rze, mue,
              due, au, av, aw)


def _kernel_h(hx, hy, hz, dev2,
              h_ulo, h_uhi, h_vlo, h_vhi, h_wlo, h_whi,
              h_rxlo, h_rxhi, h_rylo, h_rzlo, h_mulo, h_muhi, h_dulo,
              u_m2, u_m1, u_c, u_p1, u_p2,
              v_m2, v_m1, v_c, v_p1, v_p2,
              w_m2, w_m1, w_c, w_p1, w_p2,
              rx_m1, rx_c, rx_p1,
              ry_m1, ry_c,
              rz_m1, rz_c,
              mu_m1, mu_c, mu_p1,
              du_m1, du_c,
              au, av, aw):
    """Per-shard halo variant (parallel/spmd.py momentum_rhs): the ±2
    planes of u/v/w, ±1 of rpx/μ and −1 of rpy/rpz/∇·U come from the
    ppermute halos at the end grid steps. Global edges: clamp everywhere
    EXCEPT u/rpx hi (the sealed face-nx plane, zeros — inputs arrive
    PACKED to cell x-extent) and ∇·U lo (zero — reproduces the dev2
    below-domain zeroing the single-device kernel does with its `begin`
    flag, which this variant therefore drops)."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    first, last = i == 0, i == n - 1

    def sel(flag, halo, view):
        return jnp.where(flag, halo, view[...])

    u_m2 = sel(first, h_ulo[0:1], u_m2)
    u_m1 = sel(first, h_ulo[1:2], u_m1)
    u_p1 = sel(last, h_uhi[0:1], u_p1)
    u_p2 = sel(last, h_uhi[1:2], u_p2)
    v_m2 = sel(first, h_vlo[0:1], v_m2)
    v_m1 = sel(first, h_vlo[1:2], v_m1)
    v_p1 = sel(last, h_vhi[0:1], v_p1)
    v_p2 = sel(last, h_vhi[1:2], v_p2)
    w_m2 = sel(first, h_wlo[0:1], w_m2)
    w_m1 = sel(first, h_wlo[1:2], w_m1)
    w_p1 = sel(last, h_whi[0:1], w_p1)
    w_p2 = sel(last, h_whi[1:2], w_p2)
    rx_m1 = sel(first, h_rxlo[...], rx_m1)
    rx_p1 = sel(last, h_rxhi[...], rx_p1)
    ry_m1 = sel(first, h_rylo[...], ry_m1)
    rz_m1 = sel(first, h_rzlo[...], rz_m1)
    mu_m1 = sel(first, h_mulo[...], mu_m1)
    mu_p1 = sel(last, h_muhi[...], mu_p1)
    du_m1 = sel(first, h_dulo[...], du_m1)

    (u_c, v_c, w_c, rx_c, ry_c, rz_c, mu_c, du_c) = (
        r[...] for r in (u_c, v_c, w_c, rx_c, ry_c, rz_c, mu_c, du_c))

    ue = jnp.concatenate([u_m2, u_m1, u_c, u_p1, u_p2], 0)
    ve = jnp.concatenate([v_m2, v_m1, v_c, v_p1, v_p2], 0)
    we = jnp.concatenate([w_m2, w_m1, w_c, w_p1, w_p2], 0)
    rxe = jnp.concatenate([rx_m1, rx_c, rx_p1], 0)
    rye = jnp.concatenate([ry_m1, ry_c], 0)
    rze = jnp.concatenate([rz_m1, rz_c], 0)
    mue = jnp.concatenate([mu_m1, mu_c, mu_p1], 0)
    due = jnp.concatenate([du_m1, du_c], 0)

    _mom_core(hx, hy, hz, dev2, 1.0, ue, ve, we, rxe, rye, rze, mue,
              due, au, av, aw)


def _mom_core(hx, hy, hz, dev2, begin, ue, ve, we, rxe, rye, rze, mue,
              due, au, av, aw):
    """RHS math on the MATERIALIZED extended-x arrays (shared by the
    single-device kernel and the per-shard halo variant)."""
    u_b, v_b, w_b = ue[2:-2], ve[2:-2], we[2:-2]    # blk rows b … b+S−1
    mu_b = mue[1:-1]
    du_b = due[1:]
    rx_f = rxe[1:]                                  # x-faces b … b+S
    ry_b = rye[1:]
    rz_b = rze[1:]

    # ---- shared face-interpolated coefficients -------------------------
    mx_f = 0.5 * (mue[:-1] + mue[1:])   # μ at x-faces b … b+S (S+1)
    me01 = _favg(mx_f, 1)               # (x-face, y-face) edges
    me02 = _favg(mx_f, 2)               # (x-face, z-face) edges
    me12 = _favg(_favg(mu_b, 1), 2)     # (y-face, z-face) edges, blk rows

    # Mass-flux interpolants.
    gcx = 0.5 * (rxe[:-1] + rxe[1:])    # rpx at x-centers b−1 … b+S−1
    gxy = _favg(rx_f, 1)                # rpx at (x-face, y-face)
    gxz = _favg(rx_f, 2)                # rpx at (x-face, z-face)
    gyx = 0.5 * (rye[:-1] + rye[1:])    # rpy at u rows b … b+S−1 (S)
    gyz = _favg(ry_b, 2)                # rpy at (y-face, z-face), blk
    gzx = 0.5 * (rze[:-1] + rze[1:])    # rpz at u rows, z-faces 0..nz
    gzy = _favg(rz_b, 1)                # rpz at (y-face, z-face 0..nz)
    gcy = 0.5 * (ry_b[:, :-1] + ry_b[:, 1:])        # rpy at y-centers
    gcz = 0.5 * (rz_b[:, :, :-1] + rz_b[:, :, 1:])  # rpz at z-centers

    # Shared transverse gradients (visc_v d2 == dev2_w d1's flux core;
    # visc_w d1 == dev2_v d2's).
    dvz = _gradf(v_b, 2, hz)            # ∂v/∂z at (y-row, z-face)
    dwy = _gradf(w_b, 1, hy)            # ∂w/∂y at (y-face, z-row)

    # ======================= component u ================================
    # conv d=0: center fluxes fc[c] = gcx[c]·qf(face c+1), c = b−1…b+S−1.
    D = ue[1:] - ue[:-1]
    up_p = ue[1:-2] + 0.5 * _vl(D[:-2], D[1:-1])
    up_m = ue[2:-1] - 0.5 * _vl(D[2:], D[1:-1])
    fc = gcx * jnp.where(gcx >= 0.0, up_p, up_m)
    conv = _diff(fc, 0, hx)
    conv += _diff(gyx * _vanleer(u_b, gyx, 1), 1, hy)
    conv += _diff(gzx * _vanleer(u_b, gzx, 2), 2, hz)

    # visc d=0: center fluxes μ[c]·(u[c+1] − u[c])/hx (the below-domain
    # pad is zero by aliasing: u[0] − u[−1→0] = 0).
    du_dx = (ue[2:-1] - ue[1:-2]) / hx              # centers b−1 … b+S−1
    visc = _diff(mue[:-1] * du_dx, 0, hx)
    visc += _diff(me01[:-1] * _gradf(u_b, 1, hy), 1, hy)
    visc += _diff(me02[:-1] * _gradf(u_b, 2, hz), 2, hz)

    a = visc - conv
    if dev2:
        # d=0: μ[c]·(du_dx − (2/3)∇·U[c]) at centers; `begin` zeroes the
        # below-domain center on the global-first block (halo variant:
        # always 1 — the zero rides in the ∇·U halo content instead).
        fd = mue[:-1] * (du_dx - (2.0 / 3.0) * due)
        fd = jnp.concatenate([fd[:1] * begin, fd[1:]], 0)
        a += _diff(fd, 0, hx)
        dv_dx = (ve[2:-2] - ve[1:-3]) / hx          # u rows b … b+S−1
        a += _diff(me01[:-1] * dv_dx, 1, hy)
        dw_dx = (we[2:-2] - we[1:-3]) / hx
        a += _diff(me02[:-1] * dw_dx, 2, hz)

    au[:, :, :] = a

    # ======================= component v ================================
    D = ve[1:] - ve[:-1]
    up_p = ve[1:-2] + 0.5 * _vl(D[:-2], D[1:-1])
    up_m = ve[2:-1] - 0.5 * _vl(D[2:], D[1:-1])
    conv = _diff(gxy * jnp.where(gxy >= 0.0, up_p, up_m), 0, hx)
    # parallel y: center fluxes between v[c], v[c+1].
    dm = v_b - _dn(v_b, 1)
    dp = _up(v_b, 1) - v_b
    up_p = v_b + 0.5 * _vl(dm, dp)
    um = v_b - 0.5 * _vl(dp, dm)
    fc = gcy * jnp.where(gcy >= 0.0, up_p[:, :-1], um[:, 1:])
    conv += _center_div(fc, 1, hy)
    conv += _diff(gzy * _vanleer(v_b, gzy, 2), 2, hz)

    dv_dx = (ve[2:-1] - ve[1:-2]) / hx              # x-faces b … b+S
    visc = _diff(me01 * dv_dx, 0, hx)
    dv_dy = (v_b[:, 1:] - v_b[:, :-1]) / hy         # y-centers 0 … ny−1
    visc += _center_div(mu_b * dv_dy, 1, hy)
    visc += _diff(me12 * dvz, 2, hz)

    a = visc - conv
    if dev2:
        u_f = ue[2:-1]                              # u rows b … b+S
        a += _diff(me01 * _gradf(u_f, 1, hy), 0, hx)
        a += _center_div(mu_b * (dv_dy - (2.0 / 3.0) * du_b), 1, hy)
        a += _diff(me12 * dwy, 2, hz)

    av[:, :, :] = a

    # ======================= component w ================================
    D = we[1:] - we[:-1]
    up_p = we[1:-2] + 0.5 * _vl(D[:-2], D[1:-1])
    up_m = we[2:-1] - 0.5 * _vl(D[2:], D[1:-1])
    conv = _diff(gxz * jnp.where(gxz >= 0.0, up_p, up_m), 0, hx)
    conv += _diff(gyz * _vanleer(w_b, gyz, 1), 1, hy)
    # parallel z: center fluxes between w[c], w[c+1].
    dm = w_b - _dn(w_b, 2)
    dp = _up(w_b, 2) - w_b
    up_p = w_b + 0.5 * _vl(dm, dp)
    um = w_b - 0.5 * _vl(dp, dm)
    fc = gcz * jnp.where(gcz >= 0.0, up_p[:, :, :-1], um[:, :, 1:])
    conv += _center_div(fc, 2, hz)

    dw_dx = (we[2:-1] - we[1:-2]) / hx
    visc = _diff(me02 * dw_dx, 0, hx)
    visc += _diff(me12 * dwy, 1, hy)
    dw_dz = (w_b[:, :, 1:] - w_b[:, :, :-1]) / hz   # z-centers 0 … nz−1
    visc += _center_div(mu_b * dw_dz, 2, hz)

    a = visc - conv
    if dev2:
        u_f = ue[2:-1]
        a += _diff(me02 * _gradf(u_f, 2, hz), 0, hx)
        a += _diff(me12 * dvz, 1, hy)
        a += _center_div(mu_b * (dw_dz - (2.0 / 3.0) * du_b), 2, hz)

    aw[:, :, :] = a


@functools.partial(jax.jit,
                   static_argnames=("spacing", "dev2", "interpret"))
def momentum_rhs(u, v, w, rho_phi, mu, div_u, spacing, dev2=True,
                 interpret=False):
    """Full momentum RHS (visc [+ dev2] − conv) for all three components.

    Takes and returns the FULL face arrays as solver/timestep.py holds
    them. v and w come back complete (their boundary rows are computed
    by the kernel — including w's open-top plane); u's top wall row is
    outside the x grid and returned as zeros (it is masked downstream
    either way).
    """
    nx, ny, nz = mu.shape
    assert nx % SLAB == 0
    nblocks = nx // SLAB
    rpx, rpy, rpz = rho_phi
    if div_u is None:
        div_u = jnp.zeros_like(mu)

    def blk(ey=0, ez=0):
        return pl.BlockSpec((SLAB, ny + ey, nz + ez), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def plane(index_map, ey=0, ez=0):
        return pl.BlockSpec((1, ny + ey, nz + ez), index_map,
                            memory_space=pltpu.VMEM)

    def m2(last):
        return lambda i: (jnp.maximum(i * SLAB - 2, 0), 0, 0)

    def m1(last):
        return lambda i: (jnp.maximum(i * SLAB - 1, 0), 0, 0)

    def p1(last):
        return lambda i: (jnp.minimum((i + 1) * SLAB, last), 0, 0)

    def p2(last):
        return lambda i: (jnp.minimum((i + 1) * SLAB + 1, last), 0, 0)

    def face5(last, ey=0, ez=0):
        return [plane(m2(last), ey, ez), plane(m1(last), ey, ez),
                blk(ey, ez), plane(p1(last), ey, ez),
                plane(p2(last), ey, ez)]

    hx, hy, hz = (float(s) for s in spacing)
    kern = functools.partial(_kernel, hx, hy, hz, bool(dev2))

    au, av, aw = pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=(face5(nx)                    # u: clamp at the wall row
                  + face5(nx - 1, ey=1)        # v (cell-indexed along x)
                  + face5(nx - 1, ez=1)        # w
                  + [plane(m1(nx)), blk(), plane(p1(nx))]      # rpx
                  + [plane(m1(nx - 1), ey=1), blk(ey=1)]       # rpy
                  + [plane(m1(nx - 1), ez=1), blk(ez=1)]       # rpz
                  + [plane(m1(nx - 1)), blk(), plane(p1(nx - 1))]  # mu
                  + [plane(m1(nx - 1)), blk()]),               # div_u
        out_specs=[blk(), blk(ey=1), blk(ez=1)],
        out_shape=[jax.ShapeDtypeStruct((nx, ny, nz), mu.dtype),
                   jax.ShapeDtypeStruct((nx, ny + 1, nz), mu.dtype),
                   jax.ShapeDtypeStruct((nx, ny, nz + 1), mu.dtype)],
        interpret=interpret,
    )(u, u, u, u, u,
      v, v, v, v, v,
      w, w, w, w, w,
      rpx, rpx, rpx,
      rpy, rpy,
      rpz, rpz,
      mu, mu, mu,
      div_u, div_u)

    au_full = jnp.concatenate([au, jnp.zeros((1, ny, nz), mu.dtype)], 0)
    return au_full, av, aw


@functools.partial(jax.jit,
                   static_argnames=("spacing", "dev2", "interpret"))
def momentum_rhs_h(u_p, v, w, rpx_p, rpy, rpz, mu, div_u, halos, spacing,
                   dev2=True, interpret=False):
    """Per-shard momentum RHS (shard_map island body, parallel/spmd.py).

    x-extent inputs are PACKED to cells (`u_p = u[:-1]`, `rpx_p =
    rpx[:-1]` — the dropped global face-nx planes are the sealed wall,
    zeros, and ride in the halos at the global top). `halos` =
    (ulo, uhi, vlo, vhi, wlo, whi, rxlo, rxhi, rylo, rzlo, mulo, muhi,
    dulo) exchanged planes (u/v/w width 2, rest width 1). Returns
    (au cells, av, aw) — the caller re-appends u's zero wall plane."""
    nx, ny, nz = mu.shape
    assert nx % SLAB == 0
    nblocks = nx // SLAB

    def blk(ey=0, ez=0):
        return pl.BlockSpec((SLAB, ny + ey, nz + ez), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def plane(index_map, ey=0, ez=0):
        return pl.BlockSpec((1, ny + ey, nz + ez), index_map,
                            memory_space=pltpu.VMEM)

    def const(w=1, ey=0, ez=0):
        return pl.BlockSpec((w, ny + ey, nz + ez), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    last = nx - 1
    m2 = lambda i: (jnp.maximum(i * SLAB - 2, 0), 0, 0)
    m1 = lambda i: (jnp.maximum(i * SLAB - 1, 0), 0, 0)
    p1 = lambda i: (jnp.minimum((i + 1) * SLAB, last), 0, 0)
    p2 = lambda i: (jnp.minimum((i + 1) * SLAB + 1, last), 0, 0)

    def face5(ey=0, ez=0):
        return [plane(m2, ey, ez), plane(m1, ey, ez), blk(ey, ez),
                plane(p1, ey, ez), plane(p2, ey, ez)]

    hx, hy, hz = (float(s) for s in spacing)
    kern = functools.partial(_kernel_h, hx, hy, hz, bool(dev2))

    halo_specs = [const(2), const(2),                 # u lo/hi
                  const(2, ey=1), const(2, ey=1),     # v
                  const(2, ez=1), const(2, ez=1),     # w
                  const(), const(),                   # rpx lo/hi
                  const(ey=1), const(ez=1),           # rpy, rpz lo
                  const(), const(),                   # mu lo/hi
                  const()]                            # div_u lo

    au, av, aw = pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=(halo_specs
                  + face5()                            # u (cells)
                  + face5(ey=1)                        # v
                  + face5(ez=1)                        # w
                  + [plane(m1), blk(), plane(p1)]      # rpx (cells)
                  + [plane(m1, ey=1), blk(ey=1)]       # rpy
                  + [plane(m1, ez=1), blk(ez=1)]       # rpz
                  + [plane(m1), blk(), plane(p1)]      # mu
                  + [plane(m1), blk()]),               # div_u
        out_specs=[blk(), blk(ey=1), blk(ez=1)],
        out_shape=[jax.ShapeDtypeStruct((nx, ny, nz), mu.dtype),
                   jax.ShapeDtypeStruct((nx, ny + 1, nz), mu.dtype),
                   jax.ShapeDtypeStruct((nx, ny, nz + 1), mu.dtype)],
        interpret=interpret,
    )(*halos,
      u_p, u_p, u_p, u_p, u_p,
      v, v, v, v, v,
      w, w, w, w, w,
      rpx_p, rpx_p, rpx_p,
      rpy, rpy,
      rpz, rpz,
      mu, mu, mu,
      div_u, div_u)
    return au, av, aw


_VMEM_BUDGET = 14 * 1024 * 1024


def supported(shape, dtype=jnp.float32) -> bool:
    """Conservative VMEM / layout feasibility check (mirrors
    mules_flux.supported)."""
    if len(shape) != 3:
        return False               # batched sweep layouts use the jnp path
    nx, ny, nz = shape
    if nx % SLAB or min(ny, nz) < 8 or dtype != jnp.float32:
        return False
    plane_bytes = (ny + 1) * _round_up(nz + 1, 128) * 4
    # Double-buffered streams: 8 slab inputs + 3 slab outputs + ~16 halo
    # planes, plus ~12 live extended-slab temps for the MUSCL chains.
    need = ((11 * SLAB + 16) * 2 + 12 * (SLAB + 4)) * plane_bytes
    return need <= _VMEM_BUDGET


def _round_up(n, m):
    return -(-n // m) * m
