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
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SLAB = 4  # x-planes per grid step (13 streamed arrays — keep VMEM modest)


def _kernel(hx, hy, hz, n_eps,
            lx_m, lx_c, lx_p, ly_m, ly_c, ly_p, lz_m, lz_c, lz_p,
            ax_m, ax_c, ax_p, ay_m, ay_c, ay_p, az_m, az_c, az_p,
            al_m, al_c, amax_m, amax_c, amin_m, amin_c, div_m, div_c,
            ox, oy, oz):
    """One FCT limiter iteration on an extended slab.

    l* = λ per axis, a* = antidiffusive flux per axis (lower-face cell
    layout), al = alpha_low, amax/amin = FCT bounds, div = dt·inv_vol.
    Extended cell range: plane −1 (prev) + the SLAB planes."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    s = ox.shape[0]
    ny, nz = ox.shape[1], ox.shape[2]
    # Materialize the block refs (Pallas refs are not arrays).
    (lx_m, lx_c, lx_p, ly_m, ly_c, ly_p, lz_m, lz_c, lz_p,
     ax_m, ax_c, ax_p, ay_m, ay_c, ay_p, az_m, az_c, az_p,
     al_m, al_c, amax_m, amax_c, amin_m, amin_c, div_m, div_c) = (
        r[...] for r in (
            lx_m, lx_c, lx_p, ly_m, ly_c, ly_p, lz_m, lz_c, lz_p,
            ax_m, ax_c, ax_p, ay_m, ay_c, ay_p, az_m, az_c, az_p,
            al_m, al_c, amax_m, amax_c, amin_m, amin_c, div_m, div_c))
    # Zero the next-plane view on the last grid step (implicit zero
    # boundary face beyond the domain).
    end = jnp.where(i == n - 1, 0.0, 1.0)

    def ext(m, c):           # cells −1..s−1 (length s+1)
        return jnp.concatenate([m, c], axis=0)

    def hi_x(c, p):          # upper x-face of cells −1..s−1
        return jnp.concatenate([c, p * end], axis=0)

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
                      r_minus[:s], r_minus[1:])
    # y faces: within-slab shift (edge clamp harmless — zero antis there).
    rp_s, rm_s = r_plus[1:], r_minus[1:]

    def dn_y(a):
        return jnp.concatenate([a[:, :1, :], a[:, : ny - 1, :]], 1)

    def dn_z(a):
        return jnp.concatenate([a[:, :, :1], a[:, :, : nz - 1]], 2)

    oy[:, :, :] = upd(ly_c, ryl[1:], dn_y(rp_s), rp_s, dn_y(rm_s), rm_s)
    oz[:, :, :] = upd(lz_c, rzl[1:], dn_z(rp_s), rp_s, dn_z(rm_s), rm_s)


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
        out_shape=[jax.ShapeDtypeStruct(alpha_low.shape, alpha_low.dtype)
                   for _ in range(3)],
        interpret=interpret,
    )(*face_args, *cell_args)
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


# ---------------------------------------------------------------------------
# Slab-resident multi-iteration limiter: ALL n_limiter_iters Zalesak
# iterations in ONE pass over x-slabs (overlapped tiling, halo = n_iters
# planes each side). Because every subcycle enters the limiter with
# lambda = 0 (ops/mules.py), the kernel carries (applied, remaining)
# antidiffusive flux pairs instead of lambda:
#     lambda' = lambda + (1-lambda)*c   <=>   app' = app + rem*c
#                                             rem' = rem*(1-c)
# so the inputs shrink to the 3 antidiffusive flux arrays (app0 = 0,
# rem0 = anti) + 4 cell arrays, and the outputs ARE the limited fluxes
# (lambda*anti) the caller wants — the separate per-iteration kernel
# launches re-streamed ~13 arrays each, and mules.py paid one more
# multiply pass for lambda*anti afterwards.
#
# Validity shrinks by one plane per side per iteration (standard
# overlapped tiling); with halo h = n_iters the central SLAB planes are
# exact. Clamped halo planes at the global bottom alias plane 0 and at
# the top alias plane nx-1 — safe by the same zero-anti boundary-face
# invariant as the single-iteration kernel (wall faces carry exactly
# zero antidiffusive flux, so stale lambda/R values there multiply
# zeros), EXCEPT the implicit zero faces at/above plane nx, which are
# explicitly zero-masked per next-plane (they can alias real interior
# values when SLAB < n_iters + 1).
# ---------------------------------------------------------------------------

RSLAB = int(_os.environ.get("OFTPP_FCT_RSLAB", "2"))
# x-planes per grid step: the resident working set is ~3x the
# single-iteration kernel's, so the slab is narrower by default; wider
# slabs amortize the halo better (traffic/plane 29 -> 19.5 at RSLAB=4
# with h=3) if Mosaic can still allocate the VMEM (env-tunable for the
# hardware A/B).


def _kernel_resident(hx, hy, hz, n_eps, h, s, *refs):
    """All `h` limiter iterations on an extended slab.

    refs layout: 3 face arrays (anti x/y/z) x (h prev planes, slab,
    h next planes), then 4 cell arrays (alpha_low, amax, amin, dt_iv)
    x (h prev planes, slab, h-1 next planes), then outputs (ox, oy, oz).
    """
    i = pl.program_id(0)
    n = pl.num_programs(0)
    nxt_planes = 2 * h + 1
    cell_planes = 2 * h
    face_args, pos = [], 0
    for _ in range(3):
        face_args.append([r[...] for r in refs[pos:pos + nxt_planes]])
        pos += nxt_planes
    cell_args = []
    for _ in range(4):
        cell_args.append([r[...] for r in refs[pos:pos + cell_planes]])
        pos += cell_planes
    ox, oy, oz = refs[pos:pos + 3]
    ny, nz = ox.shape[1], ox.shape[2]

    # Zero-mask the next face planes that lie at/above the global top
    # (face plane nx and beyond are the implicit zero boundary faces).
    def face_ext(parts):
        prevs, blk, nxts = parts[:h], parts[h], parts[h + 1:]
        masked = [
            jnp.where((i + 1) * s + k >= n * s, 0.0, 1.0) * p
            for k, p in enumerate(nxts)
        ]
        return jnp.concatenate(prevs + [blk] + masked, axis=0)

    def cell_ext(parts):
        return jnp.concatenate(parts, axis=0)

    rem = [face_ext(f) for f in face_args]          # m_f = s + 2h planes
    ale, amaxe, amine, dive = (cell_ext(c) for c in cell_args)  # m_c = s+2h-1
    m_f = s + 2 * h
    m_c = m_f - 1
    app = [jnp.zeros_like(r) for r in rem]

    def dn_y(a):
        return jnp.concatenate([a[:, :1, :], a[:, : ny - 1, :]], 1)

    def hi_y(a):
        return jnp.concatenate([a[:, 1:, :], jnp.zeros_like(a[:, :1, :])], 1)

    def dn_z(a):
        return jnp.concatenate([a[:, :, :1], a[:, :, : nz - 1]], 2)

    def hi_z(a):
        return jnp.concatenate(
            [a[:, :, 1:], jnp.zeros_like(a[:, :, :1])], 2)

    zero = jnp.zeros((m_c, ny, nz), ale.dtype)
    one = jnp.ones_like(zero)

    for _ in range(h):
        ax_lo, ax_hi = app[0][:m_c], app[0][1:]
        ay, az = app[1][:m_c], app[2][:m_c]
        appl_div = (
            (ax_hi - ax_lo) / hx
            + (hi_y(ay) - ay) / hy
            + (hi_z(az) - az) / hz
        )
        a_work = ale - dive * appl_div

        rx_lo, rx_hi = rem[0][:m_c], rem[0][1:]
        ry, rz_ = rem[1][:m_c], rem[2][:m_c]
        ry_hi, rz_hi = hi_y(ry), hi_z(rz_)
        p_in = (
            (jnp.maximum(rx_lo, zero) - jnp.minimum(rx_hi, zero)) / hx
            + (jnp.maximum(ry, zero) - jnp.minimum(ry_hi, zero)) / hy
            + (jnp.maximum(rz_, zero) - jnp.minimum(rz_hi, zero)) / hz
        )
        p_out = (
            (jnp.maximum(rx_hi, zero) - jnp.minimum(rx_lo, zero)) / hx
            + (jnp.maximum(ry_hi, zero) - jnp.minimum(ry, zero)) / hy
            + (jnp.maximum(rz_hi, zero) - jnp.minimum(rz_, zero)) / hz
        )
        r_plus = jnp.clip((amaxe - a_work) / (dive * p_in + n_eps),
                          zero, one)
        r_minus = jnp.clip((a_work - amine) / (dive * p_out + n_eps),
                           zero, one)

        # x faces f in [1, m_f-2]: left cell f-1, right cell f.
        remx_i = rem[0][1 : m_f - 1]
        cx = jnp.where(remx_i >= 0.0,
                       jnp.minimum(r_minus[: m_c - 1], r_plus[1:]),
                       jnp.minimum(r_plus[: m_c - 1], r_minus[1:]))
        app[0] = jnp.concatenate(
            [app[0][:1], app[0][1 : m_f - 1] + remx_i * cx,
             app[0][m_f - 1 :]], axis=0)
        rem[0] = jnp.concatenate(
            [rem[0][:1], remx_i * (1.0 - cx), rem[0][m_f - 1 :]], axis=0)

        # y/z faces live on cell planes [0, m_c).
        def upd_inplane(k, dn):
            rem_i = rem[k][:m_c]
            c = jnp.where(rem_i >= 0.0,
                          jnp.minimum(dn(r_minus), r_plus),
                          jnp.minimum(dn(r_plus), r_minus))
            app_k = jnp.concatenate(
                [app[k][:m_c] + rem_i * c, app[k][m_c:]], axis=0)
            rem_k = jnp.concatenate(
                [rem_i * (1.0 - c), rem[k][m_c:]], axis=0)
            return app_k, rem_k

        app[1], rem[1] = upd_inplane(1, dn_y)
        app[2], rem[2] = upd_inplane(2, dn_z)

    ox[:, :, :] = app[0][h : h + s]
    oy[:, :, :] = app[1][h : h + s]
    oz[:, :, :] = app[2][h : h + s]


@functools.partial(jax.jit,
                   static_argnames=("spacing", "n_iters", "eps",
                                    "interpret"))
def fct_limited(antis, alpha_low, amax, amin, dt_iv, spacing, n_iters=3,
                eps=1e-12, interpret=False):
    """All `n_iters` limiter iterations fused: cell-layout antidiffusive
    fluxes -> cell-layout LIMITED fluxes (lambda*anti), one pass."""
    nx, ny, nz = alpha_low.shape
    h = int(n_iters)
    s = RSLAB
    assert nx % s == 0 and h >= 1
    nblocks = nx // s

    def blk(index_map=lambda i: (i, 0, 0)):
        return pl.BlockSpec((s, ny, nz), index_map,
                            memory_space=pltpu.VMEM)

    def plane(index_map):
        return pl.BlockSpec((1, ny, nz), index_map,
                            memory_space=pltpu.VMEM)

    last = nx - 1

    def prev_k(k):  # k-th previous plane, k = h..1
        return plane(lambda i, _k=k: (jnp.maximum(i * s - _k, 0), 0, 0))

    def next_k(k):  # k-th next plane, k = 0..h-1 (clamped; kernel masks)
        return plane(lambda i, _k=k: (jnp.minimum((i + 1) * s + _k, last),
                                      0, 0))

    specs, args = [], []
    for f in antis:
        specs += [prev_k(k) for k in range(h, 0, -1)]
        specs += [blk()]
        specs += [next_k(k) for k in range(h)]
        args += [f] * (2 * h + 1)
    for c in (alpha_low, amax, amin, dt_iv):
        specs += [prev_k(k) for k in range(h, 0, -1)]
        specs += [blk()]
        specs += [next_k(k) for k in range(h - 1)]
        args += [c] * (2 * h)

    hx, hy, hz = spacing
    out = pl.pallas_call(
        functools.partial(_kernel_resident, hx, hy, hz, eps, h, s),
        grid=(nblocks,),
        in_specs=specs,
        out_specs=[blk(), blk(), blk()],
        out_shape=[jax.ShapeDtypeStruct(alpha_low.shape, alpha_low.dtype)
                   for _ in range(3)],
        interpret=interpret,
    )(*args)
    return tuple(out)


def resident_supported(shape, n_iters=3, dtype=jnp.float32) -> bool:
    """VMEM fit for the resident kernel at RSLAB: inputs (double
    buffered) + the persistent app/rem extended arrays + per-iteration
    transients (~6 extended cell temps)."""
    if len(shape) != 3:
        return False
    nx, ny, nz = shape
    h = int(n_iters)
    if nx % RSLAB or min(ny, nz) < 8 or dtype != jnp.float32 or h < 1:
        return False
    plane_bytes = ny * _round_up(nz, 128) * 4
    m_f = RSLAB + 2 * h
    inputs = 3 * m_f + 4 * (m_f - 1)
    live = 6 * m_f + 6 * (m_f - 1)
    need = (2 * (inputs + 3 * RSLAB) + live) * plane_bytes
    return need <= _VMEM_BUDGET
