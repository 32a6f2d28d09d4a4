"""Halo-plane variants of the fused 7-point kernels (seven_point.py) for
per-shard execution under shard_map (parallel/spmd.py).

The single-device kernels fetch the x-neighbor planes of `p` through
index maps CLAMPED at the global ends — correct there because domain-
boundary faces carry zero weight. Per shard, the planes beyond the local
block are the NEIGHBOR SHARD's rows: the wrapper exchanges them with
`lax.ppermute` and passes them as dedicated (1, ny, nz) inputs with
constant index maps (fetched once, kept resident by Mosaic's revisiting
optimization — a few planes of extra traffic per whole apply). The
kernel bodies are the single-device ones (`seven_point._nb_sum`) with
the prev/next plane selected against `pl.program_id`: interior grid
steps read the in-shard views, the end steps read the halo inputs. At
the global domain ends the wrapper fills the halos with the edge-clamp
planes, reproducing the single-device clamp semantics bitwise.

Face-lite weights (seven_point.py module docstring): only the LOW-face
coefficient arrays (wxl, wyl, wzl) are streamed; wxh is recovered as the
one-plane-down shift of wxl whose final plane comes from the +SLAB view
in-shard and, at the shard's last block, from the `wx_hi` halo input —
the NEXT shard's first wxl plane (zero at the global end: the sealed
wall's boundary-face weight). wyh/wzh are in-plane shifts with exact
zero boundary-face fills, identical to the single-device kernels.

Only the unit-diagonal forms are provided: under SPMD the kernels serve
the scaled top level of the CG/V-cycle (solver/poisson.py); coarse
levels run the dense jnp path under GSPMD (1/8-and-down traffic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openfoam_tpp_tpu.ops.pallas.seven_point import SLAB, _nb_core


def _sel(h_lo, h_hi, p_prev, p_next):
    """Select halo inputs at the end grid steps, in-shard views between."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    pm = jnp.where(i == 0, h_lo[...], p_prev[...])
    pp = jnp.where(i == n - 1, h_hi[...], p_next[...])
    return pm, pp


def _nb_sum_h(h_lo, h_hi, wx_hi, p_prev, p_cur, p_next,
              wxl, wxh_p, wyl, wzl, s, ny, nz):
    """Per-shard face-lite neighbor sum: halo-select p's edge planes and
    the slab's last high-x face weight plane, then the shared
    product-shift core."""
    pm, pp = _sel(h_lo, h_hi, p_prev, p_next)
    last = jnp.where(pl.program_id(0) == pl.num_programs(0) - 1,
                     wx_hi[...], wxh_p[0:1, :, :])
    return _nb_core(p_cur[:, :, :], pm, pp, wxl[:, :, :], wyl[:, :, :],
                    wzl[:, :, :], last, s, ny, nz)


def _kernel_unit_h(h_lo, h_hi, wx_hi, p_prev, p_cur, p_next,
                   wxl, wxh_p, wyl, wzl, out):
    s, ny, nz = out.shape
    nb = _nb_sum_h(h_lo, h_hi, wx_hi, p_prev, p_cur, p_next,
                   wxl, wxh_p, wyl, wzl, s, ny, nz)
    out[:, :, :] = p_cur[:, :, :] - nb


def _kernel_h(h_lo, h_hi, wx_hi, p_prev, p_cur, p_next,
              wxl, wxh_p, wyl, wzl, diag, out):
    s, ny, nz = out.shape
    nb = _nb_sum_h(h_lo, h_hi, wx_hi, p_prev, p_cur, p_next,
                   wxl, wxh_p, wyl, wzl, s, ny, nz)
    out[:, :, :] = diag[:, :, :] * p_cur[:, :, :] - nb


def _kernel_resid_unit_h(h_lo, h_hi, wx_hi, p_prev, p_cur, p_next,
                         wxl, wxh_p, wyl, wzl, b, out):
    s, ny, nz = out.shape
    nb = _nb_sum_h(h_lo, h_hi, wx_hi, p_prev, p_cur, p_next,
                   wxl, wxh_p, wyl, wzl, s, ny, nz)
    out[:, :, :] = b[:, :, :] - (p_cur[:, :, :] - nb)


def _kernel_resid_h(h_lo, h_hi, wx_hi, p_prev, p_cur, p_next,
                    wxl, wxh_p, wyl, wzl, diag, b, out):
    s, ny, nz = out.shape
    d = diag[:, :, :]
    nb = _nb_sum_h(h_lo, h_hi, wx_hi, p_prev, p_cur, p_next,
                   wxl, wxh_p, wyl, wzl, s, ny, nz)
    out[:, :, :] = (b[:, :, :] - (d * p_cur[:, :, :] - nb)) / d


def _kernel_apply_dot_h(h_lo, h_hi, wx_hi, p_prev, p_cur, p_next,
                        wxl, wxh_p, wyl, wzl, out, partial):
    s, ny, nz = out.shape
    c = p_cur[:, :, :]
    nb = _nb_sum_h(h_lo, h_hi, wx_hi, p_prev, p_cur, p_next,
                   wxl, wxh_p, wyl, wzl, s, ny, nz)
    ap = c - nb
    out[:, :, :] = ap
    partial[pl.program_id(0)] = jnp.sum(c * ap, dtype=jnp.float32)


def _specs_h(nx, ny, nz):
    """(const-plane, p_prev, p_next/wxh, slab-factory) specs. The
    in-shard prev/next views clamp at the LOCAL ends — the end grid
    steps ignore them in favor of the halo inputs."""

    def blk(index_map=lambda i: (i, 0, 0)):
        return pl.BlockSpec((SLAB, ny, nz), index_map,
                            memory_space=pltpu.VMEM)

    def plane(index_map):
        return pl.BlockSpec((1, ny, nz), index_map,
                            memory_space=pltpu.VMEM)

    last = nx - 1
    const = plane(lambda i: (0, 0, 0))
    prev = plane(lambda i: (jnp.maximum(i * SLAB - 1, 0), 0, 0))
    nxt = plane(lambda i: (jnp.minimum((i + 1) * SLAB, last), 0, 0))
    return const, prev, nxt, blk


def _check(p, h_lo, h_hi, wx_hi):
    nx, ny, nz = p.shape
    assert nx % SLAB == 0, f"local nx={nx} not a multiple of SLAB={SLAB}"
    assert h_lo.shape == (1, ny, nz) and h_hi.shape == (1, ny, nz)
    assert wx_hi.shape == (1, ny, nz)
    return nx, ny, nz


def _w_operands(split, blk, nxt):
    wxl, wyl, wzl = split
    return ([blk(), nxt, blk(), blk()], [wxl, wxl, wyl, wzl])


@functools.partial(jax.jit, static_argnames=("interpret",))
def apply_7pt_h(p, h_lo, h_hi, wx_hi, split, diag=None, interpret=False):
    """A(p) per shard; `h_lo`/`h_hi` the exchanged ±1 x-plane halos of p,
    `wx_hi` the neighbor's first wxl plane (zero at the global end)."""
    nx, ny, nz = _check(p, h_lo, h_hi, wx_hi)
    const, prev, nxt, blk = _specs_h(nx, ny, nz)
    w_specs, w_args = _w_operands(split, blk, nxt)
    extra = () if diag is None else (diag,)
    return pl.pallas_call(
        _kernel_unit_h if diag is None else _kernel_h,
        grid=(nx // SLAB,),
        in_specs=[const, const, const, prev, blk(), nxt] + w_specs
        + [blk() for _ in extra],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
        interpret=interpret,
    )(h_lo, h_hi, wx_hi, p, p, p, *w_args, *extra)


@functools.partial(jax.jit, static_argnames=("interpret",))
def resid_scaled_7pt_h(p, h_lo, h_hi, wx_hi, split, b, diag=None,
                       interpret=False):
    """(b − A·p)/diag (b − Â·p when diag=None) per shard, ±1 halo."""
    nx, ny, nz = _check(p, h_lo, h_hi, wx_hi)
    const, prev, nxt, blk = _specs_h(nx, ny, nz)
    w_specs, w_args = _w_operands(split, blk, nxt)
    extra = (b,) if diag is None else (diag, b)
    return pl.pallas_call(
        _kernel_resid_unit_h if diag is None else _kernel_resid_h,
        grid=(nx // SLAB,),
        in_specs=[const, const, const, prev, blk(), nxt] + w_specs
        + [blk() for _ in extra],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
        interpret=interpret,
    )(h_lo, h_hi, wx_hi, p, p, p, *w_args, *extra)


@functools.partial(jax.jit, static_argnames=("interpret",))
def apply_dot_7pt_h(p, h_lo, h_hi, wx_hi, split, interpret=False):
    """(Â·p, local partial p·Â·p) per shard — caller psums the scalar."""
    nx, ny, nz = _check(p, h_lo, h_hi, wx_hi)
    const, prev, nxt, blk = _specs_h(nx, ny, nz)
    w_specs, w_args = _w_operands(split, blk, nxt)
    nblk = nx // SLAB
    ap, partials = pl.pallas_call(
        _kernel_apply_dot_h,
        grid=(nblk,),
        in_specs=[const, const, const, prev, blk(), nxt] + w_specs,
        out_specs=(
            blk(),
            pl.BlockSpec((nblk,), lambda i: (0,), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(p.shape, p.dtype),
            jax.ShapeDtypeStruct((nblk,), jnp.float32),
        ),
        interpret=interpret,
    )(h_lo, h_hi, wx_hi, p, p, p, *w_args)
    return ap, jnp.sum(partials)
