"""Fused momentum finish — the explicit update's last mile.

After the fused momentum RHS kernel (ops/pallas/momentum_rhs.py)
produces vc = visc [+ dev2] − conv, solver/timestep.py finishes each
MAC component with

    q* = (ρ_f(old)·q + dt·vc) / ρ_f(new) + dt·G_ax,   masked to walls,

where ρ_f is the arithmetic face mean of the cell densities. On the
jnp path that is three fused-per-axis chains that each re-read BOTH
cell density arrays (to face-average them), the velocity, the RHS and
the aperture: ~15 reads + 3 writes. This kernel does all three
components in ONE pass — the densities stream once and are face-
averaged in VMEM for all three axes: 11 reads + 3 writes.

Scope: the analytic-orbital single-grid path (scalar G components, no
rotating frame, σ = 0 — rotation/CSF sources and 3-D forcing fields
are ADDED AFTER the division in the jnp path but BEFORE the wall mask,
so they cannot be bolted onto a masked kernel output; those paths stay
jnp). Boundary equivalences: cells_to_faces_avg edge faces take the
edge cell — reproduced by the m1-clamped halo plane along x
(0.5·(ρ0+ρ0) = ρ0) and edge-clamped shifts along y/z; u's face-nx wall
row is emitted as zeros outside the kernel (aperture-masked in every
geometry).

Gated by OFTPP_FINISH_PALLAS (timestep._finish_pallas_enabled); parity:
tests/test_pallas_finish.py. Reference analog: the UEqn H/A update in
`foamRun incompressibleVoF` (SURVEY.md §3.2).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SLAB = int(_os.environ.get("OFTPP_FINISH_SLAB", "4"))


def _favg_dn(a, ax):
    """0.5·(a + shift_down(a)) edge-clamped — cells_to_faces_avg's
    interior faces along an in-slab axis, edges = edge cell."""
    if ax == 1:
        dn = jnp.concatenate([a[:, :1], a[:, :-1]], 1)
        lo, hi = a[:, :1], a[:, -1:]
        mid = 0.5 * (a[:, 1:] + dn[:, 1:])
        return jnp.concatenate([lo, mid, hi], 1)
    dn = jnp.concatenate([a[:, :, :1], a[:, :, :-1]], 2)
    lo, hi = a[:, :, :1], a[:, :, -1:]
    mid = 0.5 * (a[:, :, 1:] + dn[:, :, 1:])
    return jnp.concatenate([lo, mid, hi], 2)


def _kernel(sc_ref,
            ro_m1, ro_b, rn_m1, rn_b,
            u_b, vcx_b, axap_b,
            v_b, vcy_b, ayap_b,
            w_b, vcz_b, azap_b,
            ou, ov, ow):
    dt, gx, gy, gz = sc_ref[0], sc_ref[1], sc_ref[2], sc_ref[3]
    ro = ro_b[:, :, :]
    rn = rn_b[:, :, :]

    # --- x faces b … b+S−1: face mean of cells (i−1, i), m1-clamped ----
    ro_ext = jnp.concatenate([ro_m1[:, :, :], ro], 0)
    rn_ext = jnp.concatenate([rn_m1[:, :, :], rn], 0)
    rof = 0.5 * (ro_ext[:-1] + ro_ext[1:])
    rnf = 0.5 * (rn_ext[:-1] + rn_ext[1:])
    q = (rof * u_b[:, :, :] + dt * vcx_b[:, :, :]) / rnf + dt * gx
    ou[:, :, :] = jnp.where(axap_b[:, :, :] > 0.0, q, 0.0)

    # --- y faces 0 … ny ------------------------------------------------
    q = ((_favg_dn(ro, 1) * v_b[:, :, :] + dt * vcy_b[:, :, :])
         / _favg_dn(rn, 1) + dt * gy)
    ov[:, :, :] = jnp.where(ayap_b[:, :, :] > 0.0, q, 0.0)

    # --- z faces 0 … nz ------------------------------------------------
    q = ((_favg_dn(ro, 2) * w_b[:, :, :] + dt * vcz_b[:, :, :])
         / _favg_dn(rn, 2) + dt * gz)
    ow[:, :, :] = jnp.where(azap_b[:, :, :] > 0.0, q, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def momentum_finish(u, v, w, vc, rho_old, rho_new, ax_ap, ay_ap, az_ap,
                    dt, G, interpret=False):
    """(u*, v*, w*) = ((ρ_f·q + dt·vc)/ρ_f' + dt·G) · [aperture > 0] for
    all three MAC components in one fused pass. `vc` is the momentum-RHS
    kernel's (au, av, aw) triple (au cell-shaped along x — its face-nx
    wall row is zeros, emitted here the same way); `G` the three scalar
    acceleration components; `dt` a traced scalar."""
    nx, ny, nz = rho_old.shape
    assert nx % SLAB == 0
    nblk = nx // SLAB
    vcx, vcy, vcz = vc

    def blk(ey=0, ez=0):
        return pl.BlockSpec((SLAB, ny + ey, nz + ez), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def plane(index_map, ey=0, ez=0):
        return pl.BlockSpec((1, ny + ey, nz + ez), index_map,
                            memory_space=pltpu.VMEM)

    m1 = lambda i: (jnp.maximum(i * SLAB - 1, 0), 0, 0)
    smem = pl.BlockSpec((4,), lambda i: (0,), memory_space=pltpu.SMEM)

    dtype = rho_old.dtype
    sc = jnp.stack([jnp.asarray(dt, dtype)]
                   + [jnp.asarray(g, dtype) for g in G])

    us, vs, ws = pl.pallas_call(
        _kernel,
        grid=(nblk,),
        in_specs=[smem,
                  plane(m1), blk(), plane(m1), blk(),    # rho old/new
                  blk(), blk(), blk(),                   # u, vcx, ax
                  blk(ey=1), blk(ey=1), blk(ey=1),       # v, vcy, ay
                  blk(ez=1), blk(ez=1), blk(ez=1)],      # w, vcz, az
        out_specs=(blk(), blk(ey=1), blk(ez=1)),
        out_shape=(jax.ShapeDtypeStruct((nx, ny, nz), dtype),
                   jax.ShapeDtypeStruct((nx, ny + 1, nz), dtype),
                   jax.ShapeDtypeStruct((nx, ny, nz + 1), dtype)),
        interpret=interpret,
    )(sc,
      rho_old, rho_old, rho_new, rho_new,
      u[:-1], vcx, ax_ap[:-1],
      v, vcy, ay_ap,
      w, vcz, az_ap)

    u_full = jnp.concatenate([us, jnp.zeros((1, ny, nz), dtype)], 0)
    return u_full, vs, ws


_VMEM_BUDGET = 14 * 1024 * 1024


def supported(shape, dtype=jnp.float32) -> bool:
    """VMEM / layout feasibility (mirrors correction.supported)."""
    if len(shape) != 3:
        return False
    nx, ny, nz = shape
    if nx % SLAB or min(ny, nz) < 8 or dtype != jnp.float32:
        return False
    plane_bytes = (ny + 1) * _round_up(nz + 1, 128) * 4
    # 13 slab streams + 2 halo planes, double-buffered, + ~6 live temps.
    need = ((13 * SLAB + 2) * 2 + 6 * (SLAB + 1)) * plane_bytes
    return need <= _VMEM_BUDGET


def _round_up(n, m):
    return -(-n // m) * m
