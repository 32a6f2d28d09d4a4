"""True Galerkin RAP coarse operators with trilinear transfers.

The production MG hierarchy (solver/poisson.py) uses piecewise-constant
transfers, for which the face-weight-summed 7-point coarse operator IS
the exact Galerkin RAP (see _prolong_cells). This module builds the
LINEAR-interpolation alternative the roadmap names (docs/ROADMAP.md §3,
VERDICT r2 next-round #1c): COLLOCATED coarsening — coarse node J sits
on fine cell 2J — with linear full-weighting P (fine 2J+1 = ½(J, J+1),
clamped at the walls so P·1 = 1: constants stay in range(P), which
homogeneous Neumann pressure problems need), R = Pᵀ, and the 27-point
coarse operator A_c = Pᵀ A P extracted exactly via mod-3 comb probing.

Collocation is load-bearing: the usual cell-centered 3/4–1/4 trilinear
P (support 4 per dim) makes Pᵀ A P reach TWO coarse cells (a 125-point
stencil); the collocated half-weights keep per-dim support 3 and the
Galerkin stencil at 27 points.

A 27-point stencil is stored as one (27, nx, ny, nz) array, offset
index o = (dx+1)·9 + (dy+1)·3 + (dz+1); the center is index 13.

Gated experiment (OFTPP_COARSE=rap27): comb probing pays ~27 fine-grid
operator applications per preconditioner build, so this path only makes
production sense combined with SolverControls.precond_refresh > 1; it
exists to measure whether linear-P Galerkin cuts CG iterations enough
to earn a fast analytic constructor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _interleave(a, b, axis):
    """Elementwise interleave two equal-shaped arrays along `axis`:
    result[..., 2i, ...] = a[..., i, ...], result[..., 2i+1, ...] = b."""
    stacked = jnp.stack([a, b], axis=axis + 1)
    shape = list(a.shape)
    shape[axis] *= 2
    return stacked.reshape(shape)


def _prolong_1d(e, axis, n_fine):
    """Collocated linear prolongation along one axis: fine 2J = c[J],
    fine 2J+1 = ½·c[J] + ½·c[J+1] (the missing outer neighbor's ½ folds
    into the center at the wall so every row sums to 1)."""
    hi = jnp.concatenate([e[_sl(axis, slice(1, None))],
                          e[_sl(axis, slice(-1, None))]], axis=axis)
    odd = 0.5 * e + 0.5 * hi
    out = _interleave(e, odd, axis)
    return out[_sl(axis, slice(0, n_fine))]


def _sl(axis, s):
    return (slice(None),) * axis + (s,)


def prolong_linear(e, fine_shape):
    """Trilinear cell-centered prolongation coarse → fine."""
    for d in range(3):
        e = _prolong_1d(e, d, fine_shape[d])
    return e


def make_restrict_linear(coarse_shape, fine_shape, dtype=jnp.float32):
    """R = Pᵀ as a function, via jax.linear_transpose (exact adjoint —
    no hand-derived boundary cases to get wrong)."""
    proto = jax.ShapeDtypeStruct(coarse_shape, dtype)
    t = jax.linear_transpose(lambda e: prolong_linear(e, fine_shape), proto)

    def restrict(r):
        return t(r)[0]

    return restrict


def coarse_shape_of(fine_shape):
    return tuple((n + 1) // 2 for n in fine_shape)


OFFSETS = [(dx, dy, dz)
           for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]


def rap27(apply_fine, fine_shape, dtype=jnp.float32):
    """A_c = Pᵀ·A·P as a (27, *coarse_shape) stencil-coefficient array.

    Mod-3 comb probing: stencil reach is 1 coarse cell, and offsets
    −1/0/1 are distinct mod 3, so the response to the indicator of each
    residue class isolates exactly one coefficient per cell:
    [A_c]_{I,I+o} = (Pᵀ A P e_class)[I] for class = (I+o) mod 3."""
    cs = coarse_shape_of(fine_shape)
    restrict = make_restrict_linear(cs, fine_shape, dtype)

    ix = jax.lax.broadcasted_iota(jnp.int32, cs, 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, cs, 1)
    iz = jax.lax.broadcasted_iota(jnp.int32, cs, 2)
    mx, my, mz = ix % 3, iy % 3, iz % 3

    def probe(cx, cy, cz):
        e = ((mx == cx) & (my == cy) & (mz == cz)).astype(dtype)
        return restrict(apply_fine(prolong_linear(e, fine_shape)))

    # (3,3,3, *cs) responses, indexed by residue class.
    w = jnp.stack([probe(cx, cy, cz)
                   for cx in range(3) for cy in range(3) for cz in range(3)]
                  ).reshape((3, 3, 3) + cs)

    coeffs = []
    for (dx, dy, dz) in OFFSETS:
        cls_x, cls_y, cls_z = (mx + dx) % 3, (my + dy) % 3, (mz + dz) % 3
        # Gather w[cls_x, cls_y, cls_z][I] — flatten the class axes.
        flat = w.reshape((27,) + cs)
        idx = (cls_x * 9 + cls_y * 3 + cls_z)[None]
        coeffs.append(jnp.take_along_axis(flat, idx, axis=0)[0])
    c = jnp.stack(coeffs)           # (27, *cs)

    # Out-of-range neighbors (offsets leaving the coarse grid) carry the
    # probe response of a PERIODIC alias cell — zero them explicitly.
    for o, (dx, dy, dz) in enumerate(OFFSETS):
        m = jnp.ones(cs, bool)
        for axis, d in enumerate((dx, dy, dz)):
            n = cs[axis]
            pos = (ix, iy, iz)[axis]
            if d == -1:
                m = m & (pos > 0)
            elif d == 1:
                m = m & (pos < n - 1)
        c = c.at[o].set(jnp.where(m, c[o], 0.0))
    return c


def apply27(c, x):
    """y[i] = Σ_o c[o, i]·x[i+o] (zero-extended at the boundary)."""
    xp = jnp.pad(x, 1)
    nx, ny, nz = x.shape
    y = jnp.zeros_like(x)
    for o, (dx, dy, dz) in enumerate(OFFSETS):
        y = y + c[o] * xp[1 + dx: 1 + dx + nx,
                          1 + dy: 1 + dy + ny,
                          1 + dz: 1 + dz + nz]
    return y


def diag27(c):
    """Safe smoothing diagonal (1 where a row is empty — solid cells)."""
    d = c[13]
    return jnp.where(d > 0, d, 1.0)
