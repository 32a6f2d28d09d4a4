"""Uniform-shape state packing for sharded jit boundaries.

JAX requires array dims to divide evenly over the device-mesh axis at the
jit/device_put boundary (`pjit_check_aval_sharding`), but MAC face arrays
are (n+1)-sized along their normal. PackedState stores every field with
the *cell* shape (nx, ny, nz):

  * u, v, w keep faces 0..n-1 (the "lower" face of each cell); the dropped
    upper-boundary face is identically zero for u/v (walls, aperture 0 —
    mesh/geometry.py `_finalize`) and is carried separately for w as the
    (nx, ny) `w_top` atmosphere-face plane.

pack/unpack are O(boundary) slice/concat ops; under sharded jit XLA keeps
the interior sharded and the concatenated boundary slab is a negligible
halo-sized operation. This is also the layout Pallas kernels prefer
(uniform tiles, no ragged edge).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from openfoam_tpp_tpu.core.state import SimState


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PackedState:
    """SimState with uniform (nx, ny, nz) field shapes (sharding-friendly)."""

    alpha: jax.Array   # (nx, ny, nz)
    u: jax.Array       # (nx, ny, nz)  x-faces 0..nx-1 (face nx == 0, wall)
    v: jax.Array       # (nx, ny, nz)  y-faces 0..ny-1 (face ny == 0, wall)
    w: jax.Array       # (nx, ny, nz)  z-faces 0..nz-1
    w_top: jax.Array   # (nx, ny)      z-face nz (open atmosphere patch)
    p: jax.Array       # (nx, ny, nz)
    t: jax.Array
    dt: jax.Array
    step: jax.Array


def pack(state: SimState) -> PackedState:
    return PackedState(
        alpha=state.alpha,
        u=state.u[..., :-1, :, :],
        v=state.v[..., :, :-1, :],
        w=state.w[..., :, :, :-1],
        w_top=state.w[..., :, :, -1],
        p=state.p,
        t=state.t,
        dt=state.dt,
        step=state.step,
    )


def unpack(ps: PackedState) -> SimState:
    zx = jnp.zeros_like(ps.u[..., :1, :, :])
    zy = jnp.zeros_like(ps.v[..., :, :1, :])
    return SimState(
        alpha=ps.alpha,
        u=jnp.concatenate([ps.u, zx], axis=-3),
        v=jnp.concatenate([ps.v, zy], axis=-2),
        w=jnp.concatenate([ps.w, ps.w_top[..., :, :, None]], axis=-1),
        p=ps.p,
        t=ps.t,
        dt=ps.dt,
        step=ps.step,
    )


def packed_fn(step_fn):
    """Wrap a step(state, params) -> (state, diag) to operate on
    PackedState at the jit boundary."""

    def fn(ps: PackedState, params):
        new_state, diag = step_fn(unpack(ps), params)
        return pack(new_state), diag

    return fn
