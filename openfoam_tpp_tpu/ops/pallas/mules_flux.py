"""Fused MULES flux construction — Pallas TPU kernel.

One subcycle's flux build (ops/mules.py `_face_fluxes`) is ~30 dense
stencil passes in jnp: per axis a donor-cell upwind low-order flux, a
van Leer MUSCL reconstruction upwinded by the volumetric flux, a SECOND
van Leer reconstruction upwinded by the interface-compression velocity,
and the antidiffusive difference. Run 3 subcycles per solver step, the
chain re-streams alpha/phi/u_c from HBM a dozen times. This kernel
evaluates ALL SIX flux arrays (low, anti) × (x, y, z) in a single pass
over x-slabs: 7 inputs streamed once, 6 outputs written once.

Layout: identical to ops/pallas/mules_fct.py — face quantities are
CELL-shaped "lower-face" arrays (entry [i, j, k] is the face between
cells (i−1, j, k) and (i, j, k) for the x set; global upper-boundary
faces are implicit zeros: walls have zero aperture ⇒ zero phi, and the
open-top z face is rewritten by the inletOutlet fixup in mules.py
either way).

Halo handling: an x-face value needs alpha at cells (i−2 … i+1), so
alpha is passed as (plane −2, plane −1, slab, plane +1) views with
index maps clamped at the global ends. The clamps reproduce the jnp
path's edge-clamped shifts exactly: at the bottom they make the
upwind slope dm ≡ 0 (van Leer limiter kills the correction), at the
top dp ≡ 0 likewise — bitwise the same arithmetic as
stencil.vanleer_faces / upwind_faces (tests/test_pallas_mules.py).

y/z axes are fully slab-resident: plain edge-clamped shifts, exactly
the jnp formulas.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SLAB = 4  # x-planes per grid step (7 streamed inputs, 6 outputs —
#           13 double-buffered slabs must fit VMEM; 8 busts the budget)

_EPS = 1e-30


def _limited(delta_up, delta_down):
    """van Leer limiter: φ(r)·Δdown, r = Δup/Δdown (stencil.py:110-114)."""
    r = delta_up / jnp.where(jnp.abs(delta_down) > _EPS, delta_down,
                             jnp.where(delta_down >= 0, _EPS, -_EPS))
    phi = (r + jnp.abs(r)) / (1.0 + jnp.abs(r))
    return phi * delta_down


def _flux_core(a_m2, a_m1, a_c, a_p1, phx, phy, phz, ucx, ucy, ucz,
               olx, oax, oly, oay, olz, oaz):
    """Flux math on MATERIALIZED arrays (shared by the single-device
    kernel and the per-shard halo variant)."""
    s = olx.shape[0]
    ny, nz = olx.shape[1], olx.shape[2]

    def fluxes(phi, uc, lo_donor, hi_donor, fl, fr):
        """(low, anti) from donor values and MUSCL face reconstructions."""
        uc = uc.astype(phi.dtype)  # bf16 compression flux upcast in-VMEM
        low = phi * jnp.where(phi >= 0.0, lo_donor, hi_donor)
        high = phi * jnp.where(phi >= 0.0, fl, fr)
        ac = jnp.where(uc >= 0.0, fl, fr)
        high = high + uc * ac * (1.0 - ac)
        return low, high - low

    # ---- x axis: extended planes  ae[q] = alpha[start−2+q],  q = 0…s+2.
    ae = jnp.concatenate([a_m2, a_m1, a_c, a_p1], axis=0)
    D = ae[1:] - ae[:-1]                    # D[q] = a[start−2+q+1] − a[…+q]
    # Face i (between cells start+i−1 and start+i), i = 0…s−1:
    #   donor below = ae[i+1], donor above = ae[i+2],
    #   dm_b = D[i], dp_b = dm_t = D[i+1], dp_t = D[i+2].
    b = ae[1 : s + 1]
    t = ae[2 : s + 2]
    fl = b + 0.5 * _limited(D[:s], D[1 : s + 1])
    fr = t - 0.5 * _limited(D[2 : s + 2], D[1 : s + 1])
    low_x, anti_x = fluxes(phx, ucx, b, t, fl, fr)
    olx[:, :, :] = low_x
    oax[:, :, :] = anti_x.astype(oax.dtype)  # bf16 antidiffusive stream

    # ---- y/z axes: slab-resident, exactly the jnp edge-clamped shifts.
    def dn(a, ax, n):
        if ax == 1:
            return jnp.concatenate([a[:, :1, :], a[:, : n - 1, :]], 1)
        return jnp.concatenate([a[:, :, :1], a[:, :, : n - 1]], 2)

    def up(a, ax, n):
        if ax == 1:
            return jnp.concatenate([a[:, 1:, :], a[:, n - 1 :, :]], 1)
        return jnp.concatenate([a[:, :, 1:], a[:, :, n - 1 :]], 2)

    a = a_c
    for ax, n, phi, uc, ol, oa in ((1, ny, phy, ucy, oly, oay),
                                   (2, nz, phz, ucz, olz, oaz)):
        dm = a - dn(a, ax, n)
        dp = up(a, ax, n) - a
        up_plus = a + 0.5 * _limited(dm, dp)
        up_minus = a - 0.5 * _limited(dp, dm)
        # Face j ↔ cells (j−1, j): donor-below values arrive via the
        # same edge-clamped down-shift (face 0 clamp is harmless — wall
        # apertures zero phi there).
        low, anti = fluxes(
            phi, uc, dn(a, ax, n), a, dn(up_plus, ax, n), up_minus)
        ol[:, :, :] = low
        oa[:, :, :] = anti.astype(oa.dtype)


def _kernel(a_m2, a_m1, a_c, a_p1, phx, phy, phz, ucx, ucy, ucz,
            olx, oax, oly, oay, olz, oaz):
    args = [r[...] for r in (a_m2, a_m1, a_c, a_p1, phx, phy, phz,
                             ucx, ucy, ucz)]
    _flux_core(*args, olx, oax, oly, oay, olz, oaz)


def _kernel_h(h_lo, h_hi, a_m2, a_m1, a_c, a_p1, phx, phy, phz,
              ucx, ucy, ucz, olx, oax, oly, oay, olz, oaz):
    """Per-shard halo variant: alpha's −2/−1/+1 x-planes come from the
    ppermute halos at the end grid steps (h_lo = (2, ny, nz) ghost rows
    −2, −1; h_hi = (1, ny, nz) ghost row nxl). Global edges clamp —
    exactly the single-device kernel's index-map clamps."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    am2 = jnp.where(i == 0, h_lo[0:1], a_m2[...])
    am1 = jnp.where(i == 0, h_lo[1:2], a_m1[...])
    ap1 = jnp.where(i == n - 1, h_hi[...], a_p1[...])
    rest = [r[...] for r in (a_c, phx, phy, phz, ucx, ucy, ucz)]
    _flux_core(am2, am1, rest[0], ap1, *rest[1:],
               olx, oax, oly, oay, olz, oaz)


@functools.partial(jax.jit, static_argnames=("anti_dtype", "interpret"))
def flux_all(alpha, phis, ucs, anti_dtype=None, interpret=False):
    """All-axis (low, anti) MULES fluxes in one fused pass.

    `phis`/`ucs`: per-axis volumetric / compression fluxes in CELL
    lower-face layout (face arrays sliced [:-1] along their axis).
    Returns (lows, antis) tuples in the same layout. `ucs` may be bf16
    (upcast in-VMEM). `anti_dtype` (e.g. bf16) narrows the antidiffusive
    outputs — the FCT limiter's dominant HBM stream; the low-order
    fluxes stay full precision so the bulk advection (and mass
    telescoping accuracy) is unchanged.
    """
    nx, ny, nz = alpha.shape
    assert nx % SLAB == 0
    nblocks = nx // SLAB

    def blk():
        return pl.BlockSpec((SLAB, ny, nz), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def plane(index_map):
        return pl.BlockSpec((1, ny, nz), index_map,
                            memory_space=pltpu.VMEM)

    last = nx - 1
    a_m2 = plane(lambda i: (jnp.maximum(i * SLAB - 2, 0), 0, 0))
    a_m1 = plane(lambda i: (jnp.maximum(i * SLAB - 1, 0), 0, 0))
    a_p1 = plane(lambda i: (jnp.minimum((i + 1) * SLAB, last), 0, 0))

    a_dt = anti_dtype or alpha.dtype
    out = pl.pallas_call(
        _kernel,
        grid=(nblocks,),
        in_specs=[a_m2, a_m1, blk(), a_p1] + [blk() for _ in range(6)],
        out_specs=[blk() for _ in range(6)],
        out_shape=[jax.ShapeDtypeStruct(alpha.shape,
                                        a_dt if i % 2 else alpha.dtype)
                   for i in range(6)],
        interpret=interpret,
    )(alpha, alpha, alpha, alpha, *phis, *ucs)
    lx, ax_, ly, ay_, lz, az_ = out
    return (lx, ly, lz), (ax_, ay_, az_)


@functools.partial(jax.jit, static_argnames=("anti_dtype", "interpret"))
def flux_all_h(alpha, h_lo, h_hi, phis, ucs, anti_dtype=None,
               interpret=False):
    """Per-shard flux_all (shard_map island body, parallel/spmd.py):
    `h_lo` (2, ny, nz) / `h_hi` (1, ny, nz) are alpha's exchanged halo
    planes. phis/ucs are local lower-face cell-layout blocks (their
    x-face values only feed faces of THIS shard's cells)."""
    nx, ny, nz = alpha.shape
    assert nx % SLAB == 0
    nblocks = nx // SLAB

    def blk():
        return pl.BlockSpec((SLAB, ny, nz), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def plane(index_map, w=1):
        return pl.BlockSpec((w, ny, nz), index_map,
                            memory_space=pltpu.VMEM)

    last = nx - 1
    a_m2 = plane(lambda i: (jnp.maximum(i * SLAB - 2, 0), 0, 0))
    a_m1 = plane(lambda i: (jnp.maximum(i * SLAB - 1, 0), 0, 0))
    a_p1 = plane(lambda i: (jnp.minimum((i + 1) * SLAB, last), 0, 0))
    h2 = plane(lambda i: (0, 0, 0), w=2)
    h1 = plane(lambda i: (0, 0, 0), w=1)

    a_dt = anti_dtype or alpha.dtype
    out = pl.pallas_call(
        _kernel_h,
        grid=(nblocks,),
        in_specs=[h2, h1, a_m2, a_m1, blk(), a_p1]
        + [blk() for _ in range(6)],
        out_specs=[blk() for _ in range(6)],
        out_shape=[jax.ShapeDtypeStruct(alpha.shape,
                                        a_dt if i % 2 else alpha.dtype)
                   for i in range(6)],
        interpret=interpret,
    )(h_lo, h_hi, alpha, alpha, alpha, alpha, *phis, *ucs)
    lx, ax_, ly, ay_, lz, az_ = out
    return (lx, ly, lz), (ax_, ay_, az_)


_VMEM_BUDGET = 14 * 1024 * 1024


def supported(shape, dtype=jnp.float32) -> bool:
    if len(shape) != 3:
        return False           # batched sweep layouts use the jnp path
    nx, ny, nz = shape
    if nx % SLAB or min(ny, nz) < 8 or dtype != jnp.float32:
        return False
    plane_bytes = ny * _round_up(nz, 128) * 4
    # Double-buffered fetches: 7 slab inputs + 3 plane halos + 6 outputs,
    # plus ~8 live slab temps for the fused MUSCL chains.
    need = ((13 * SLAB + 3) * 2 + 8 * (SLAB + 3)) * plane_bytes
    return need <= _VMEM_BUDGET


def _round_up(n, m):
    return -(-n // m) * m
