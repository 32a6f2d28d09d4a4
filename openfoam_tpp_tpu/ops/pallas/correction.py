"""Fused projection epilogue — velocity correction + divergence max.

After the pressure solve, solver/timestep.py corrects the three MAC
velocities with the operator's gradient,

    q_c = (q_s − dt·β_f·∂dp/∂n) · [aperture > 0]       (+ the open-top
    half-cell Dirichlet row for w),

then computes the post-correction divergence error
max|∇·(A·u_c)|·fluid. On the jnp path that is ~4 streamed passes that
read dp three times and re-read all three corrected velocities for the
div. This kernel does the whole epilogue in ONE pass over
(dp, u, v, w, β×3, A×3, vfrac): each x-slab computes its corrected
faces AND its partial divergence max (SMEM, like
seven_point.apply_dot_7pt's partial dot), so dp streams once and the
corrected velocities never round-trip HBM before the div.

Boundary equivalences (bitwise vs the jnp path):
  * gradient_at_faces zero boundary faces: x ends via clamped halo
    aliasing ((dp0 − dp0)/h = 0), y/z via explicit zero planes.
  * masks = aperture > 0 exactly (solver/timestep.py:169).
  * open top: w's face-nz row adds dt·β_top·2·dp[…,−1]/hz where
    top_open > 0 (solver/poisson.py half-cell Dirichlet analog).
  * u's face-nx wall row is emitted as zeros outside the kernel
    (aperture-masked in every geometry — the x boundary is sealed).

Used on the last PIMPLE corrector only (earlier correctors feed the
next b-build and stay jnp). Gated by OFTPP_CORR_PALLAS; parity:
tests/test_pallas_correction.py (interpret mode).

Reference analog: the pEqn reconstruct + continuity-error report inside
`foamRun incompressibleVoF` (SURVEY.md §3.2).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SLAB = int(_os.environ.get("OFTPP_CORR_SLAB", "4"))


def _corr_core(hx, hy, hz, open_top, dt,
               dp_m1, dp, dp_p1, u_b, u_p1, bx_b, bx_p1, axap_b, axap_p1,
               v_b, by_b, ayap_b, w_b, bz_b, azap_b, vf_b, topo_b, rhot_b,
               ou, ov, ow, opart):
    """Epilogue math on MATERIALIZED plane/slab arrays (shared by the
    single-device kernel and the per-shard halo variant below)."""
    s = dp.shape[0]

    # --- x faces b … b+S (S+1 planes; ends alias-clamped → zero grad) ---
    dp_ext = jnp.concatenate([dp_m1, dp, dp_p1], 0)
    gx = (dp_ext[1:] - dp_ext[:-1]) / hx                   # S+1 faces
    u_ext = jnp.concatenate([u_b, u_p1], 0)
    bx_ext = jnp.concatenate([bx_b, bx_p1], 0)
    ax_ext = jnp.concatenate([axap_b, axap_p1], 0)
    uc = jnp.where(ax_ext > 0.0, u_ext - dt * bx_ext * gx, 0.0)
    ou[:, :, :] = uc[:s]

    # --- y faces 0 … ny (zero boundary-face gradients) ------------------
    ay = ayap_b[:, :, :]
    zy = jnp.zeros_like(dp[:, :1])
    gy = jnp.concatenate([zy, (dp[:, 1:] - dp[:, :-1]) / hy, zy], 1)
    vc = jnp.where(ay > 0.0, v_b[:, :, :] - dt * by_b[:, :, :] * gy, 0.0)
    ov[:, :, :] = vc

    # --- z faces 0 … nz (+ open-top half-cell Dirichlet row) ------------
    az = azap_b[:, :, :]
    zz = jnp.zeros_like(dp[:, :, :1])
    gz = jnp.concatenate([zz, (dp[:, :, 1:] - dp[:, :, :-1]) / hz, zz], 2)
    wc = w_b[:, :, :] - dt * bz_b[:, :, :] * gz
    if open_top:
        # Dim-preserving slices only: integer indexing (a[:, :, -1])
        # lowers to dynamic_slice, unimplemented in the Mosaic TC path.
        beta_top = jnp.where(topo_b[:, :, :1] > 0.0,
                             1.0 / rhot_b[:, :, :1], 0.0)
        w_top = (wc[:, :, -1:]
                 + dt * beta_top * 2.0 * dp[:, :, -1:] / hz)
        wc = jnp.concatenate([wc[:, :, :-1], w_top], 2)
    wc = jnp.where(az > 0.0, wc, 0.0)
    ow[:, :, :] = wc

    # --- partial divergence max over this slab's fluid cells ------------
    phix = ax_ext * uc
    phiy = ay * vc
    phiz = az * wc
    div = ((phix[1:] - phix[:-1]) / hx
           + (phiy[:, 1:] - phiy[:, :-1]) / hy
           + (phiz[:, :, 1:] - phiz[:, :, :-1]) / hz)
    opart[pl.program_id(0)] = jnp.max(
        jnp.abs(div) * (vf_b[:, :, :] > 0.0).astype(div.dtype))


def _kernel(hx, hy, hz, open_top,
            dt_ref,
            dp_m1, dp_b, dp_p1,
            u_b, u_p1, bx_b, bx_p1, axap_b, axap_p1,
            v_b, by_b, ayap_b,
            w_b, bz_b, azap_b,
            vf_b, topo_b, rhot_b,
            ou, ov, ow, opart):
    args = [r[...] for r in (
        dp_m1, dp_b, dp_p1, u_b, u_p1, bx_b, bx_p1, axap_b, axap_p1,
        v_b, by_b, ayap_b, w_b, bz_b, azap_b, vf_b, topo_b, rhot_b)]
    _corr_core(hx, hy, hz, open_top, dt_ref[0], *args,
               ou, ov, ow, opart)


def _kernel_h(hx, hy, hz, open_top,
              dt_ref,
              h_dp_lo, h_dp_hi, h_u, h_bx, h_ax,
              dp_m1, dp_b, dp_p1,
              u_b, u_p1, bx_b, bx_p1, axap_b, axap_p1,
              v_b, by_b, ayap_b,
              w_b, bz_b, azap_b,
              vf_b, topo_b, rhot_b,
              ou, ov, ow, opart):
    """Per-shard halo variant (parallel/spmd.py): the ±1 dp planes and
    the +1 face planes of (u, βx, ax) come from the ppermute halos at the
    end grid steps. All inputs are CELL-x-extent (packed); at the global
    top the halos carry the sealed face nx (zeros), reproducing the
    single-device kernel's real-row reads bitwise."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    first, last = i == 0, i == n - 1
    dp_m1 = jnp.where(first, h_dp_lo[...], dp_m1[...])
    dp_p1 = jnp.where(last, h_dp_hi[...], dp_p1[...])
    u_p1 = jnp.where(last, h_u[...], u_p1[...])
    bx_p1 = jnp.where(last, h_bx[...], bx_p1[...])
    axap_p1 = jnp.where(last, h_ax[...], axap_p1[...])
    args = [r[...] for r in (
        dp_b, u_b, bx_b, axap_b,
        v_b, by_b, ayap_b, w_b, bz_b, azap_b, vf_b, topo_b, rhot_b)]
    (dp_b, u_b, bx_b, axap_b, v_b, by_b, ayap_b, w_b, bz_b, azap_b,
     vf_b, topo_b, rhot_b) = args
    _corr_core(hx, hy, hz, open_top, dt_ref[0],
               dp_m1, dp_b, dp_p1, u_b, u_p1, bx_b, bx_p1, axap_b, axap_p1,
               v_b, by_b, ayap_b, w_b, bz_b, azap_b, vf_b, topo_b, rhot_b,
               ou, ov, ow, opart)


@functools.partial(jax.jit,
                   static_argnames=("spacing", "open_top", "interpret"))
def correct_divmax(dp, u_s, v_s, w_s, beta_f, ax_ap, ay_ap, az_ap,
                   vfrac, top_open, rho_top, dt, spacing,
                   open_top=True, interpret=False):
    """(u_c, v_c, w_c, div_max): aperture-masked corrected MAC velocities
    and max|∇·(A·u_c)| over fluid cells, one fused pass.

    Takes the full face arrays as solver/timestep.py holds them; u_c's
    face-nx wall row comes back as zeros (aperture-masked in every
    geometry). `dt` is a traced scalar (adaptive stepping)."""
    nx, ny, nz = dp.shape
    assert nx % SLAB == 0
    nblk = nx // SLAB
    bx, by, bz = beta_f

    def blk(ey=0, ez=0):
        return pl.BlockSpec((SLAB, ny + ey, nz + ez), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def plane(index_map, ey=0, ez=0):
        return pl.BlockSpec((1, ny + ey, nz + ez), index_map,
                            memory_space=pltpu.VMEM)

    m1 = lambda i: (jnp.maximum(i * SLAB - 1, 0), 0, 0)
    # dp's +1 halo clamps at the last cell; face arrays' +1 plane is real.
    p1c = lambda i: (jnp.minimum((i + 1) * SLAB, nx - 1), 0, 0)
    p1f = lambda i: ((i + 1) * SLAB, 0, 0)

    # (nx, ny) planes ride as (nx, ny, 1) — 2-D blocks violate the
    # Mosaic (8, 128) sublane/lane tiling; a trailing unit dim is exempt.
    blk2 = pl.BlockSpec((SLAB, ny, 1), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    smem1 = pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM)

    kern = functools.partial(
        _kernel, *(float(s) for s in spacing), bool(open_top))
    dt_arr = jnp.reshape(jnp.asarray(dt, dp.dtype), (1,))

    uc, vc, wc, partials = pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[smem1,
                  plane(m1), blk(), plane(p1c),            # dp
                  blk(), plane(p1f),                       # u (faces)
                  blk(), plane(p1f),                       # beta_x
                  blk(), plane(p1f),                       # ax aperture
                  blk(ey=1), blk(ey=1), blk(ey=1),         # v, beta_y, ay
                  blk(ez=1), blk(ez=1), blk(ez=1),         # w, beta_z, az
                  blk(), blk2, blk2],                      # vfrac, topo, rho
        out_specs=(blk(), blk(ey=1), blk(ez=1),
                   pl.BlockSpec((nblk,), lambda i: (0,),
                                memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((nx, ny, nz), dp.dtype),
                   jax.ShapeDtypeStruct((nx, ny + 1, nz), dp.dtype),
                   jax.ShapeDtypeStruct((nx, ny, nz + 1), dp.dtype),
                   jax.ShapeDtypeStruct((nblk,), jnp.float32)),
        interpret=interpret,
    )(dt_arr,
      dp, dp, dp,
      u_s, u_s, bx, bx, ax_ap, ax_ap,
      v_s, by, ay_ap,
      w_s, bz, az_ap,
      vfrac, top_open[:, :, None], rho_top[:, :, None])

    u_full = jnp.concatenate(
        [uc, jnp.zeros((1, ny, nz), dp.dtype)], 0)
    return u_full, vc, wc, jnp.max(partials)


@functools.partial(jax.jit,
                   static_argnames=("spacing", "open_top", "interpret"))
def correct_divmax_h(dp, h_dp_lo, h_dp_hi, u_p, h_u, v_s, w_s,
                     bx_p, h_bx, by, bz, ax_p, h_ax, ay_ap, az_ap,
                     vfrac, top_open, rho_top, dt, spacing,
                     open_top=True, interpret=False):
    """Per-shard fused epilogue (shard_map island body, parallel/spmd.py).

    x-extent inputs are PACKED to cells (`u_p = u[:-1]` etc. — the global
    face-nx plane is the sealed wall, zeros); `h_*` are the exchanged
    halo planes (dp ±1 clamp-edged; u/βx/ax +1 zero-edged — the true
    global face-nx values). Returns (u_c cells, v_c, w_c, LOCAL div-max);
    the caller pmaxes the scalar and re-appends u's zero wall plane."""
    nx, ny, nz = dp.shape
    assert nx % SLAB == 0
    nblk = nx // SLAB

    def blk(ey=0, ez=0):
        return pl.BlockSpec((SLAB, ny + ey, nz + ez), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def plane(index_map):
        return pl.BlockSpec((1, ny, nz), index_map,
                            memory_space=pltpu.VMEM)

    m1 = lambda i: (jnp.maximum(i * SLAB - 1, 0), 0, 0)
    p1c = lambda i: (jnp.minimum((i + 1) * SLAB, nx - 1), 0, 0)
    const = plane(lambda i: (0, 0, 0))

    blk2 = pl.BlockSpec((SLAB, ny, 1), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    smem1 = pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM)

    kern = functools.partial(
        _kernel_h, *(float(s) for s in spacing), bool(open_top))
    dt_arr = jnp.reshape(jnp.asarray(dt, dp.dtype), (1,))

    uc, vc, wc, partials = pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[smem1,
                  const, const, const, const, const,      # halo planes
                  plane(m1), blk(), plane(p1c),            # dp
                  blk(), plane(p1c),                       # u (cells)
                  blk(), plane(p1c),                       # beta_x
                  blk(), plane(p1c),                       # ax aperture
                  blk(ey=1), blk(ey=1), blk(ey=1),         # v, beta_y, ay
                  blk(ez=1), blk(ez=1), blk(ez=1),         # w, beta_z, az
                  blk(), blk2, blk2],                      # vfrac, topo, rho
        out_specs=(blk(), blk(ey=1), blk(ez=1),
                   pl.BlockSpec((nblk,), lambda i: (0,),
                                memory_space=pltpu.SMEM)),
        out_shape=(jax.ShapeDtypeStruct((nx, ny, nz), dp.dtype),
                   jax.ShapeDtypeStruct((nx, ny + 1, nz), dp.dtype),
                   jax.ShapeDtypeStruct((nx, ny, nz + 1), dp.dtype),
                   jax.ShapeDtypeStruct((nblk,), jnp.float32)),
        interpret=interpret,
    )(dt_arr,
      h_dp_lo, h_dp_hi, h_u, h_bx, h_ax,
      dp, dp, dp,
      u_p, u_p, bx_p, bx_p, ax_p, ax_p,
      v_s, by, ay_ap,
      w_s, bz, az_ap,
      vfrac, top_open[:, :, None], rho_top[:, :, None])
    return uc, vc, wc, jnp.max(partials)


_VMEM_BUDGET = 14 * 1024 * 1024


def supported(shape, dtype=jnp.float32) -> bool:
    """VMEM / layout feasibility (mirrors momentum_rhs.supported)."""
    if len(shape) != 3:
        return False
    nx, ny, nz = shape
    if nx % SLAB or min(ny, nz) < 8 or dtype != jnp.float32:
        return False
    plane_bytes = (ny + 1) * _round_up(nz + 1, 128) * 4
    # 11 slab streams + ~8 halo planes, double-buffered, + ~6 live temps.
    need = ((11 * SLAB + 8) * 2 + 6 * (SLAB + 2)) * plane_bytes
    return need <= _VMEM_BUDGET


def _round_up(n, m):
    return -(-n // m) * m
