"""Batch-native (case-trailing, rank-4) variants of the fused 7-point
stencil kernels — the sweep-mode answer to VERDICT r4 #3.

Under `jax.vmap` the single-grid kernels (seven_point.py) lower through
the Pallas batching rule as one grid program PER CASE, so each block
carries the per-case nz (≈28-50 for the default sweep boxes) in the
LANE dimension — padded to 128, a 2.5-4.6× waste that made
kernels-under-vmap LOSE to the jnp path (130.0M vs 142.1M aggregate,
docs/ROADMAP.md §3b). These variants instead take the batched arrays in
their native sweep layout — case axis TRAILING, i.e. in the lanes
(parallel/sweep.py stacks batch minor so (nz, case) vectorizes) — as
rank-4 blocks `(slab, ny, nz, bc)`: the (nz, case) tail matches the
stored tiling exactly (no relayout), lanes are full, and the case
dimension is untouched by every stencil shift, so there is no
cross-case coupling at all (not even the zero-boundary-weight argument
— the case axis simply never shifts).

The grid is 2-D: x-slabs × case-chunks of `bc` lanes (128 when the
batch divides, else the whole batch), so VMEM stays bounded for any
batch size; the slab adapts (8 → 4 → 2 → 1) until the working set
fits. Exposed to the solver through `jax.custom_batching.custom_vmap`
wrappers in seven_point.py (`*_v`); weight layout is face-lite
product-shift, identical math to seven_point._nb_core. The CG
curvature dot is PER CASE: the kernel emits `(nblk, 1, 1, B)` partials
that the wrapper reduces over blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024
_WORKSET = 8 * 2  # arrays in flight (worst kernel ~7 slabs + out) ×
                  # double buffering — the VMEM-fit criterion


def _round_up(n, m):
    return -(-n // m) * m


def _case_chunk(b: int) -> int:
    return 128 if b % 128 == 0 else b


def _fit_slab(nx, ny, nz, b, itemsize):
    """Largest slab in (8, 4, 2, 1) that divides nx and fits VMEM."""
    bc = _case_chunk(b)
    for slab in (8, 4, 2, 1):
        if nx % slab:
            continue
        bytes_ = slab * ny * _round_up(nz, 8) * _round_up(bc, 128) * itemsize
        if _WORKSET * bytes_ <= _VMEM_BUDGET:
            return slab
    return None


def supported4(shape4, dtype=jnp.float32) -> bool:
    """Feasibility on the BATCHED (nx, ny, nz, B) shape."""
    nx, ny, nz, b = shape4
    if min(ny, nz) < 4:
        return False
    if dtype == jnp.float32:
        itemsize = 4
    elif dtype == jnp.bfloat16:
        itemsize = 2
    else:
        return False
    return _fit_slab(nx, ny, nz, b, itemsize) is not None


def _wxh_last4(wxh_p):
    v = wxh_p[0:1, :, :, :]
    return jnp.where(pl.program_id(0) == pl.num_programs(0) - 1,
                     jnp.zeros_like(v), v)


def _nb_core4(c, pm, pp, wl, wy_, wz_, wxh_last, s, ny, nz):
    """Rank-4 product-shift neighbor sum (case lanes untouched) —
    the exact analogue of seven_point._nb_core."""
    xm = jnp.concatenate([pm, c[: s - 1]], axis=0)
    tx = wl * c
    xh = jnp.concatenate([tx[1:], wxh_last * pp], axis=0)
    ym = jnp.concatenate([c[:, :1], c[:, : ny - 1]], axis=1)
    ty = wy_ * c
    yh = jnp.concatenate([ty[:, 1:], jnp.zeros_like(ty[:, :1])], axis=1)
    zm = jnp.concatenate([c[:, :, :1], c[:, :, : nz - 1]], axis=2)
    tz = wz_ * c
    zh = jnp.concatenate(
        [tz[:, :, 1:], jnp.zeros_like(tz[:, :, :1])], axis=2)
    return wl * xm + xh + wy_ * ym + yh + wz_ * zm + zh


def _nb4(p_prev, p_cur, p_next, wxl, wxh_p, wyl, wzl, s, ny, nz):
    return _nb_core4(p_cur[...], p_prev[0:1], p_next[0:1],
                     wxl[...], wyl[...], wzl[...], _wxh_last4(wxh_p),
                     s, ny, nz)


def _kernel_unit4(p_prev, p_cur, p_next, wxl, wxh_p, wyl, wzl, out):
    s, ny, nz, _ = out.shape
    out[...] = p_cur[...] - _nb4(p_prev, p_cur, p_next,
                                 wxl, wxh_p, wyl, wzl, s, ny, nz)


def _kernel_diag4(p_prev, p_cur, p_next, wxl, wxh_p, wyl, wzl, diag, out):
    s, ny, nz, _ = out.shape
    nb = _nb4(p_prev, p_cur, p_next, wxl, wxh_p, wyl, wzl, s, ny, nz)
    out[...] = diag[...] * p_cur[...] - nb


def _kernel_resid_unit4(p_prev, p_cur, p_next, wxl, wxh_p, wyl, wzl,
                        b, out):
    s, ny, nz, _ = out.shape
    nb = _nb4(p_prev, p_cur, p_next, wxl, wxh_p, wyl, wzl, s, ny, nz)
    out[...] = b[...] - (p_cur[...] - nb)


def _kernel_resid4(p_prev, p_cur, p_next, wxl, wxh_p, wyl, wzl,
                   diag, b, out):
    s, ny, nz, _ = out.shape
    d = diag[...]
    nb = _nb4(p_prev, p_cur, p_next, wxl, wxh_p, wyl, wzl, s, ny, nz)
    out[...] = (b[...] - (d * p_cur[...] - nb)) / d


def _kernel_apply_dot4(p_prev, p_cur, p_next, wxl, wxh_p, wyl, wzl,
                       out, partial):
    s, ny, nz, _ = out.shape
    c = p_cur[...]
    nb = _nb4(p_prev, p_cur, p_next, wxl, wxh_p, wyl, wzl, s, ny, nz)
    ap = c - nb
    out[...] = ap
    # Per-CASE partial: reduce the slab's cells, keep the lane (case)
    # axis — a (1, 1, 1, bc) VMEM row per grid step.
    partial[...] = jnp.sum(c * ap, axis=(0, 1, 2), dtype=jnp.float32)[
        None, None, None, :]


def _grid_specs(p):
    nx, ny, nz, b = p.shape
    from openfoam_tpp_tpu.ops.pallas.seven_point import pick_slab

    slab = _fit_slab(nx, ny, nz, b, jnp.dtype(p.dtype).itemsize)
    assert slab is not None and pick_slab(nx), (
        f"batched shape {p.shape} not kernel-feasible")
    bc = _case_chunk(b)
    grid = (nx // slab, b // bc)

    def blk(index_map=lambda i, j: (i, 0, 0, j)):
        return pl.BlockSpec((slab, ny, nz, bc), index_map,
                            memory_space=pltpu.VMEM)

    def plane(index_map):
        return pl.BlockSpec((1, ny, nz, bc), index_map,
                            memory_space=pltpu.VMEM)

    last = nx - 1
    prev = plane(lambda i, j: (jnp.maximum(i * slab - 1, 0), 0, 0, j))
    nxt = plane(lambda i, j: (jnp.minimum((i + 1) * slab, last), 0, 0, j))
    return grid, prev, blk(), nxt, blk, bc


def _w_ops4(split, blk, wxh_plane):
    wxl, wyl, wzl = split
    return ([blk(), wxh_plane, blk(), blk()], [wxl, wxl, wyl, wzl])


@functools.partial(jax.jit, static_argnames=("interpret",))
def apply_7pt_nb(p, split, diag=None, interpret=False):
    """A(p) on the batched (nx, ny, nz, B) layout."""
    grid, prev, cur, nxt, blk, _ = _grid_specs(p)
    w_specs, w_args = _w_ops4(split, blk, nxt)
    extra_specs = [] if diag is None else [blk()]
    extra = () if diag is None else (diag,)
    return pl.pallas_call(
        _kernel_unit4 if diag is None else _kernel_diag4,
        grid=grid,
        in_specs=[prev, cur, nxt] + w_specs + extra_specs,
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
        interpret=interpret,
    )(p, p, p, *w_args, *extra)


@functools.partial(jax.jit, static_argnames=("interpret",))
def resid_scaled_7pt_nb(p, split, diag, b, interpret=False):
    """(b − A·p)/diag (b − Â·p when diag=None) on the batched layout."""
    grid, prev, cur, nxt, blk, _ = _grid_specs(p)
    w_specs, w_args = _w_ops4(split, blk, nxt)
    if diag is None:
        return pl.pallas_call(
            _kernel_resid_unit4,
            grid=grid,
            in_specs=[prev, cur, nxt] + w_specs + [blk()],
            out_specs=blk(),
            out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
            interpret=interpret,
        )(p, p, p, *w_args, b)
    return pl.pallas_call(
        _kernel_resid4,
        grid=grid,
        in_specs=[prev, cur, nxt] + w_specs + [blk(), blk()],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
        interpret=interpret,
    )(p, p, p, *w_args, diag, b)


@functools.partial(jax.jit, static_argnames=("interpret",))
def apply_dot_7pt_nb(p, split, interpret=False):
    """(Â·p, per-case p·Â·p (B,)) on the batched layout."""
    grid, prev, cur, nxt, blk, bc = _grid_specs(p)
    w_specs, w_args = _w_ops4(split, blk, nxt)
    nblk, _ = grid
    b = p.shape[-1]
    ap, partials = pl.pallas_call(
        _kernel_apply_dot4,
        grid=grid,
        in_specs=[prev, cur, nxt] + w_specs,
        out_specs=(
            blk(),
            pl.BlockSpec((1, 1, 1, bc), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(p.shape, p.dtype),
            jax.ShapeDtypeStruct((nblk, 1, 1, b), jnp.float32),
        ),
        interpret=interpret,
    )(p, p, p, *w_args)
    return ap, jnp.sum(partials, axis=(0, 1, 2))
