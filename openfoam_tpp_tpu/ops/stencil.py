"""Axis-generic stencil primitives on the MAC grid.

Pure jnp slicing/pad ops — XLA fuses these chains into bandwidth-optimal
loops on TPU; the hottest fused pipelines also have hand-written Pallas
versions in ops/pallas/. Cell arrays are (nx, ny, nz); a "face array" along
`axis` has that axis extended by one (faces bracket cells).

Boundary convention: edge-clamped ghost cells. Wall faces carry zero
aperture, so clamped ghosts only influence reconstruction order near
boundaries, never fluxes through walls.
"""

from __future__ import annotations

import jax.numpy as jnp


def _sl(axis, s):
    """Build an nd slice tuple indexing `s` along `axis`."""
    out = [slice(None)] * 3
    out[axis] = s
    return tuple(out)


def shift_down(a, axis):
    """result[i] = a[i-1], edge-clamped at i=0."""
    first = a[_sl(axis, slice(0, 1))]
    body = a[_sl(axis, slice(0, -1))]
    return jnp.concatenate([first, body], axis=axis)


def shift_up(a, axis):
    """result[i] = a[i+1], edge-clamped at i=n-1."""
    last = a[_sl(axis, slice(-1, None))]
    body = a[_sl(axis, slice(1, None))]
    return jnp.concatenate([body, last], axis=axis)


def cells_to_faces_avg(c, axis):
    """Arithmetic face interpolation; boundary faces take the edge cell."""
    lo = c[_sl(axis, slice(0, 1))]
    hi = c[_sl(axis, slice(-1, None))]
    mid = 0.5 * (c[_sl(axis, slice(0, -1))] + c[_sl(axis, slice(1, None))])
    return jnp.concatenate([lo, mid, hi], axis=axis)


def cells_to_faces_harmonic(c, axis, eps=1e-30):
    """Harmonic face interpolation (used for 1/rho face coefficients)."""
    a = c[_sl(axis, slice(0, -1))]
    b = c[_sl(axis, slice(1, None))]
    mid = 2.0 * a * b / (a + b + eps)
    lo = c[_sl(axis, slice(0, 1))]
    hi = c[_sl(axis, slice(-1, None))]
    return jnp.concatenate([lo, mid, hi], axis=axis)


def gradient_at_faces(c, axis, h):
    """(c[i] - c[i-1]) / h at interior faces, 0 at domain-boundary faces."""
    d = (c[_sl(axis, slice(1, None))] - c[_sl(axis, slice(0, -1))]) / h
    zshape = list(d.shape)
    zshape[axis] = 1
    z = jnp.zeros(zshape, d.dtype)
    return jnp.concatenate([z, d, z], axis=axis)


def faces_to_cells_avg(f, axis):
    """Average the two bracketing faces back to cells."""
    return 0.5 * (f[_sl(axis, slice(0, -1))] + f[_sl(axis, slice(1, None))])


def face_lr(c, axis):
    """Cell values seen from each face: (left/donor-below, right/donor-above).

    Both outputs have the face shape along `axis`; boundary faces clamp."""
    cl = jnp.concatenate([c[_sl(axis, slice(0, 1))], c], axis=axis)
    cr = jnp.concatenate([c, c[_sl(axis, slice(-1, None))]], axis=axis)
    return cl, cr


def upwind_faces(c, flux, axis):
    """First-order donor-cell face value by flux sign."""
    cl, cr = face_lr(c, axis)
    return jnp.where(flux >= 0.0, cl, cr)


def divergence(fx, fy, fz, spacing):
    """Cell divergence of aperture-weighted face fluxes (units of flux/h).

    div[c] = Σ_axis (f_hi - f_lo)/h_axis — the FV surface integral divided
    by the *full* cell volume; divide by vfrac outside for cut cells."""
    hx, hy, hz = spacing
    return (
        (fx[1:, :, :] - fx[:-1, :, :]) / hx
        + (fy[:, 1:, :] - fy[:, :-1, :]) / hy
        + (fz[:, :, 1:] - fz[:, :, :-1]) / hz
    )


def vanleer_faces(c, flux, axis):
    """Second-order MUSCL face reconstruction with the van Leer limiter,
    upwinded by flux sign (fvSchemes:29-30 `vanLeer` parity).

    For donor cell d with acceptor a: c_f = c_d + 0.5·φ(r)·(c_a − c_d),
    φ(r) = (r + |r|)/(1 + |r|), r = upwind-slope ratio.
    """
    eps = 1e-30
    dm = c - shift_down(c, axis)   # c[i] - c[i-1]
    dp = shift_up(c, axis) - c     # c[i+1] - c[i]

    def limited(delta_up, delta_down):
        r = delta_up / jnp.where(jnp.abs(delta_down) > eps, delta_down,
                                 jnp.where(delta_down >= 0, eps, -eps))
        phi = (r + jnp.abs(r)) / (1.0 + jnp.abs(r))
        return phi * delta_down

    # Flow in +axis direction: donor below the face.
    up_plus = c + 0.5 * limited(dm, dp)          # value at face i+1/2 from cell i
    # Flow in -axis direction: donor above the face.
    up_minus = c - 0.5 * limited(dp, dm)         # value at face i-1/2 from cell i

    fl, _ = face_lr(up_plus, axis)    # donor-below value at each face
    _, fr = face_lr(up_minus, axis)   # donor-above value at each face
    return jnp.where(flux >= 0.0, fl, fr)


def max27(a):
    """Max over the 3x3x3 neighborhood (edge-clamped) — used for FCT bounds
    and Courant-style local reductions."""
    for ax in range(3):
        a = jnp.maximum(a, jnp.maximum(shift_down(a, ax), shift_up(a, ax)))
    return a


def min27(a):
    for ax in range(3):
        a = jnp.minimum(a, jnp.minimum(shift_down(a, ax), shift_up(a, ax)))
    return a
