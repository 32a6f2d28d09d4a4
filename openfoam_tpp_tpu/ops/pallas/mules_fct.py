"""Fused Zalesak/FCT limiter iteration — Pallas TPU kernel.

One MULES limiter iteration (ops/mules.py `_fct_limiter` body) is ~20
dense stencil passes in jnp: per-face applied/remaining antidiffusive
fluxes, the provisional update a_work, the P± in/outflow sums, the R±
acceptance ratios, and the per-face λ update. Run 3 iterations × 3
subcycles per solver step, that chain dominates the MULES cost (~3.3 ms
of the r3 step). This kernel evaluates ONE ENTIRE ITERATION in a single
pass over x-slabs: 10 inputs streamed once, 3 λ outputs written once.

Layout: all face quantities are CELL-shaped "lower-face" arrays —
entry [i, j, k] is the face between cells (i−1, j, k) and (i, j, k) for
the x set (similarly y/z); the global upper-boundary faces (index n)
are identically zero (walls / zeroed top antidiffusive flux —
ops/mules.py) and are represented implicitly. mules.py converts from
its (n+1)-face arrays at the limiter-loop boundary (one slice each way).

Halo handling: λ'[slab] needs R± at cells (slab ∪ slab−1), which need
face values at planes (slab−1 ∪ slab ∪ slab+1) and cell values at
(slab−1 ∪ slab). Face inputs are passed as (prev-plane, slab,
next-plane) views, cell inputs as (prev-plane, slab) — index maps
clamped at the ends. The clamp at the global TOP would alias a real
face value where the implicit zero boundary face belongs, so the
next-plane contribution is multiplied by 0 on the last grid step
(`pl.program_id`-derived flag); at the global BOTTOM the stale values
only feed λ' of zero-antidiffusive boundary faces (harmless).

Parity: bitwise-equivalent arithmetic to `_fct_limiter` (same eps, same
clip order); tests/test_pallas_mules.py checks exact agreement in
interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SLAB = 4  # x-planes per grid step (13 streamed arrays — keep VMEM modest)


def _fct_core(hx, hy, hz, n_eps,
              lx_m, lx_c, lx_p, ly_m, ly_c, lz_m, lz_c,
              ax_m, ax_c, ax_p, ay_m, ay_c, az_m, az_c,
              al_m, al_c, amax_m, amax_c, amin_m, amin_c, div_m, div_c,
              ox, oy, oz):
    """One FCT limiter iteration on MATERIALIZED extended-slab arrays
    (shared by the single-device kernel and the per-shard halo variant).

    l* = λ per axis, a* = antidiffusive flux per axis (lower-face cell
    layout), al = alpha_low, amax/amin = FCT bounds, div = dt·inv_vol.
    Extended cell range: plane −1 (prev) + the SLAB planes. `lx_p`/`ax_p`
    are the NEXT x-plane values with the beyond-domain zeroing already
    applied by the caller (the implicit zero boundary face / the
    neighbor shard's junction face)."""
    s = ox.shape[0]
    ny, nz = ox.shape[1], ox.shape[2]

    def ext(m, c):           # cells −1..s−1 (length s+1)
        return jnp.concatenate([m, c], axis=0)

    def hi_x(c, p):          # upper x-face of cells −1..s−1
        return jnp.concatenate([c, p], axis=0)

    def hi_y(f):             # upper y-face (implicit zero at j=ny−1)
        return jnp.concatenate([f[:, 1:, :], jnp.zeros_like(f[:, :1, :])], 1)

    def hi_z(f):
        return jnp.concatenate(
            [f[:, :, 1:], jnp.zeros_like(f[:, :, :1])], 2)

    # Extended (s+1)-plane face arrays: lower faces of cells −1..s−1.
    lxe, axe = ext(lx_m, lx_c), ext(ax_m, ax_c)
    lye, aye = ext(ly_m, ly_c), ext(ay_m, ay_c)
    lze, aze = ext(lz_m, lz_c), ext(az_m, az_c)
    # Upper-face per extended cell.
    lx_hi, ax_hi = hi_x(lx_c, lx_p), hi_x(ax_c, ax_p)
    ly_hi, ay_hi = hi_y(lye), hi_y(aye)
    lz_hi, az_hi = hi_z(lze), hi_z(aze)

    ale = ext(al_m, al_c)
    amaxe = ext(amax_m, amax_c)
    amine = ext(amin_m, amin_c)
    dive = ext(div_m, div_c)

    # Provisional update with the currently applied antidiffusion.
    appl_div = (
        (lx_hi * ax_hi - lxe * axe) / hx
        + (ly_hi * ay_hi - lye * aye) / hy
        + (lz_hi * az_hi - lze * aze) / hz
    )
    a_work = ale - dive * appl_div

    # Remaining antidiffusive in/outflow sums P±.
    rxl, rxh = (1.0 - lxe) * axe, (1.0 - lx_hi) * ax_hi
    ryl, ryh = (1.0 - lye) * aye, (1.0 - ly_hi) * ay_hi
    rzl, rzh = (1.0 - lze) * aze, (1.0 - lz_hi) * az_hi
    zero = jnp.zeros_like(rxl)
    p_in = (
        (jnp.maximum(rxl, zero) - jnp.minimum(rxh, zero)) / hx
        + (jnp.maximum(ryl, zero) - jnp.minimum(ryh, zero)) / hy
        + (jnp.maximum(rzl, zero) - jnp.minimum(rzh, zero)) / hz
    )
    p_out = (
        (jnp.maximum(rxh, zero) - jnp.minimum(rxl, zero)) / hx
        + (jnp.maximum(ryh, zero) - jnp.minimum(ryl, zero)) / hy
        + (jnp.maximum(rzh, zero) - jnp.minimum(rzl, zero)) / hz
    )
    one = jnp.ones_like(a_work)
    r_plus = jnp.clip((amaxe - a_work) / (dive * p_in + n_eps), zero, one)
    r_minus = jnp.clip((a_work - amine) / (dive * p_out + n_eps), zero, one)

    # λ' per face of the CURRENT slab (cells 0..s−1): acceptor/donor R±.
    def upd(lam_f, rem_f, rp_l, rp_r, rm_l, rm_r):
        c = jnp.where(rem_f >= 0.0,
                      jnp.minimum(rm_l, rp_r),
                      jnp.minimum(rp_l, rm_r))
        return jnp.clip(lam_f + (1.0 - lam_f) * c, 0.0, 1.0)

    # x faces: left cell = ext[c], right cell = ext[c+1].
    ox[:, :, :] = upd(lx_c, rxl[1:], r_plus[:s], r_plus[1:],
                      r_minus[:s], r_minus[1:]).astype(ox.dtype)
    # y faces: within-slab shift (edge clamp harmless — zero antis there).
    rp_s, rm_s = r_plus[1:], r_minus[1:]

    def dn_y(a):
        return jnp.concatenate([a[:, :1, :], a[:, : ny - 1, :]], 1)

    def dn_z(a):
        return jnp.concatenate([a[:, :, :1], a[:, :, : nz - 1]], 2)

    oy[:, :, :] = upd(ly_c, ryl[1:], dn_y(rp_s), rp_s,
                      dn_y(rm_s), rm_s).astype(oy.dtype)
    oz[:, :, :] = upd(lz_c, rzl[1:], dn_z(rp_s), rp_s,
                      dn_z(rm_s), rm_s).astype(oz.dtype)


def _kernel(hx, hy, hz, n_eps,
            lx_m, lx_c, lx_p, ly_m, ly_c, ly_p, lz_m, lz_c, lz_p,
            ax_m, ax_c, ax_p, ay_m, ay_c, ay_p, az_m, az_c, az_p,
            al_m, al_c, amax_m, amax_c, amin_m, amin_c, div_m, div_c,
            ox, oy, oz):
    """Single-device entry. The λ/anti face streams may arrive bf16 (the
    FCT pipeline's bandwidth lever); ALL arithmetic runs in the cell
    dtype (f32). The next-plane views are zeroed on the last grid step
    (the implicit zero boundary face beyond the domain); y/z next planes
    are unused (in-slab shifts serve them) but fetched for symmetry."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    f32 = al_c.dtype
    (lx_m, lx_c, lx_p, ly_m, ly_c, lz_m, lz_c,
     ax_m, ax_c, ax_p, ay_m, ay_c, az_m, az_c) = (
        r[...].astype(f32) for r in (
            lx_m, lx_c, lx_p, ly_m, ly_c, lz_m, lz_c,
            ax_m, ax_c, ax_p, ay_m, ay_c, az_m, az_c))
    (al_m, al_c, amax_m, amax_c, amin_m, amin_c, div_m, div_c) = (
        r[...] for r in (
            al_m, al_c, amax_m, amax_c, amin_m, amin_c, div_m, div_c))
    end = jnp.where(i == n - 1, 0.0, 1.0)
    _fct_core(hx, hy, hz, n_eps,
              lx_m, lx_c, lx_p * end, ly_m, ly_c, lz_m, lz_c,
              ax_m, ax_c, ax_p * end, ay_m, ay_c, az_m, az_c,
              al_m, al_c, amax_m, amax_c, amin_m, amin_c, div_m, div_c,
              ox, oy, oz)


def _kernel_h(hx, hy, hz, n_eps,
              h_lxm, h_lym, h_lzm, h_axm, h_aym, h_azm,
              h_lxp, h_axp,
              h_alm, h_amaxm, h_aminm, h_divm,
              lx_m, lx_c, lx_p, ly_m, ly_c,
              lz_m, lz_c,
              ax_m, ax_c, ax_p, ay_m, ay_c, az_m, az_c,
              al_m, al_c, amax_m, amax_c, amin_m, amin_c, div_m, div_c,
              ox, oy, oz):
    """Per-shard halo variant (parallel/spmd.py fct_iters): the −1
    planes of every face/cell stream and the +1 planes of the x streams
    come from the ppermute halos at the end grid steps. The global-top
    zeroing of the next plane is carried BY the halo content (zero-edged
    exchange), not a flag."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    first, last = i == 0, i == n - 1
    f32 = al_c.dtype

    def sel(flag, halo, view):
        return jnp.where(flag, halo[...], view[...]).astype(f32)

    lx_m = sel(first, h_lxm, lx_m)
    ly_m = sel(first, h_lym, ly_m)
    lz_m = sel(first, h_lzm, lz_m)
    ax_m = sel(first, h_axm, ax_m)
    ay_m = sel(first, h_aym, ay_m)
    az_m = sel(first, h_azm, az_m)
    lx_p = sel(last, h_lxp, lx_p)
    ax_p = sel(last, h_axp, ax_p)
    al_m = jnp.where(first, h_alm[...], al_m[...])
    amax_m = jnp.where(first, h_amaxm[...], amax_m[...])
    amin_m = jnp.where(first, h_aminm[...], amin_m[...])
    div_m = jnp.where(first, h_divm[...], div_m[...])
    (lx_c, ly_c, lz_c, ax_c, ay_c, az_c) = (
        r[...].astype(f32) for r in (lx_c, ly_c, lz_c, ax_c, ay_c, az_c))
    (al_c, amax_c, amin_c, div_c) = (
        r[...] for r in (al_c, amax_c, amin_c, div_c))
    _fct_core(hx, hy, hz, n_eps,
              lx_m, lx_c, lx_p, ly_m, ly_c, lz_m, lz_c,
              ax_m, ax_c, ax_p, ay_m, ay_c, az_m, az_c,
              al_m, al_c, amax_m, amax_c, amin_m, amin_c, div_m, div_c,
              ox, oy, oz)


@functools.partial(jax.jit,
                   static_argnames=("spacing", "eps", "interpret"))
def fct_iter(lams, antis, alpha_low, amax, amin, dt_iv, spacing,
             eps=1e-12, interpret=False):
    """One limiter iteration: cell-layout (λx, λy, λz) → updated tuple.
    All arrays cell-shaped (see module docstring)."""
    nx, ny, nz = alpha_low.shape
    assert nx % SLAB == 0
    nblocks = nx // SLAB

    def blk(index_map=lambda i: (i, 0, 0)):
        return pl.BlockSpec((SLAB, ny, nz), index_map,
                            memory_space=pltpu.VMEM)

    def plane(index_map):
        return pl.BlockSpec((1, ny, nz), index_map,
                            memory_space=pltpu.VMEM)

    last = nx - 1
    prev = plane(lambda i: (jnp.maximum(i * SLAB - 1, 0), 0, 0))
    nxt = plane(lambda i: (jnp.minimum((i + 1) * SLAB, last), 0, 0))

    face_specs, face_args = [], []
    for f in (*lams, *antis):
        face_specs += [prev, blk(), nxt]
        face_args += [f, f, f]
    cell_specs, cell_args = [], []
    for c in (alpha_low, amax, amin, dt_iv):
        cell_specs += [prev, blk()]
        cell_args += [c, c]

    hx, hy, hz = spacing
    out = pl.pallas_call(
        functools.partial(_kernel, hx, hy, hz, eps),
        grid=(nblocks,),
        in_specs=face_specs + cell_specs,
        out_specs=[blk(), blk(), blk()],
        out_shape=[jax.ShapeDtypeStruct(alpha_low.shape, lams[0].dtype)
                   for _ in range(3)],
        interpret=interpret,
    )(*face_args, *cell_args)
    return tuple(out)


@functools.partial(jax.jit,
                   static_argnames=("spacing", "eps", "interpret"))
def fct_iter_h(lams, lam_halos, antis, anti_halos, cell_lo_halos,
               alpha_low, amax, amin, dt_iv, spacing,
               eps=1e-12, interpret=False):
    """Per-shard limiter iteration (shard_map island body).

    `lam_halos`/`anti_halos`: per axis (lo, hi_x) exchanged planes — hi
    only for the x streams (y/z upper faces are in-slab); for y/z pass
    (lo, None). `cell_lo_halos`: (alpha_low, amax, amin, dt_iv) −1
    planes. Global edges: face/cell lo = clamp (harmless, zero
    antidiffusive boundary faces), x hi = zero (the implicit zero
    boundary face — carried by the halo content)."""
    nx, ny, nz = alpha_low.shape
    assert nx % SLAB == 0
    nblocks = nx // SLAB

    def blk(index_map=lambda i: (i, 0, 0)):
        return pl.BlockSpec((SLAB, ny, nz), index_map,
                            memory_space=pltpu.VMEM)

    def plane(index_map):
        return pl.BlockSpec((1, ny, nz), index_map,
                            memory_space=pltpu.VMEM)

    last = nx - 1
    prev = plane(lambda i: (jnp.maximum(i * SLAB - 1, 0), 0, 0))
    nxt = plane(lambda i: (jnp.minimum((i + 1) * SLAB, last), 0, 0))
    const = plane(lambda i: (0, 0, 0))

    lx, ly, lz = lams
    ax_, ay_, az_ = antis
    halo_args = [lam_halos[0][0], lam_halos[1][0], lam_halos[2][0],
                 anti_halos[0][0], anti_halos[1][0], anti_halos[2][0],
                 lam_halos[0][1], anti_halos[0][1]] + list(cell_lo_halos)
    face_specs = ([prev, blk(), nxt]          # lx: m, c, p
                  + [prev, blk()]             # ly: m, c
                  + [prev, blk()]             # lz
                  + [prev, blk(), nxt]        # ax
                  + [prev, blk()]             # ay
                  + [prev, blk()])            # az
    face_args = [lx, lx, lx, ly, ly, lz, lz,
                 ax_, ax_, ax_, ay_, ay_, az_, az_]
    cell_specs, cell_args = [], []
    for c in (alpha_low, amax, amin, dt_iv):
        cell_specs += [prev, blk()]
        cell_args += [c, c]

    hx, hy, hz = spacing
    out = pl.pallas_call(
        functools.partial(_kernel_h, hx, hy, hz, eps),
        grid=(nblocks,),
        in_specs=[const] * 12 + face_specs + cell_specs,
        out_specs=[blk(), blk(), blk()],
        out_shape=[jax.ShapeDtypeStruct(alpha_low.shape, lams[0].dtype)
                   for _ in range(3)],
        interpret=interpret,
    )(*halo_args, *face_args, *cell_args)
    return tuple(out)


_VMEM_BUDGET = 14 * 1024 * 1024


def supported(shape, dtype=jnp.float32) -> bool:
    if len(shape) != 3:
        return False           # batched sweep layouts use the jnp path
    nx, ny, nz = shape
    if nx % SLAB or min(ny, nz) < 8 or dtype != jnp.float32:
        return False
    plane_bytes = ny * _round_up(nz, 128) * 4
    # Double-buffered block fetches: 13 slab inputs + 26 plane halos +
    # 3 outputs; Mosaic's fused intermediates add ~5 live slab temps
    # (measured to fit the flagship 112^3 at SLAB=4).
    need = ((13 * SLAB + 26 + 3 * SLAB) * 2 + 5 * (SLAB + 1)) * plane_bytes
    return need <= _VMEM_BUDGET


def _round_up(n, m):
    return -(-n // m) * m
