"""Non-inertial (rotating + translating) tank-frame forces.

The reference's 6DoF variant prescribes full rigid-body tank motion —
translation AND rotation — via `sixDoFMotion` solid-body *mesh* motion
(/root/reference/sloshingTank3D6DoF/constant/dynamicMeshDict:17-44, table
written by gen6DoF.C:62-87). The TPU solver instead works in the tank
frame on a static grid; rigid motion appears as body forces:

    a_fict(r, u) = Rᵀ(g_lab − a_lab)              uniform part
                   − dω×r − ω×(ω×r) − 2 ω×u       rotation part

with ω, dω the tank angular velocity/acceleration in the tank frame and
r the position relative to the rotation center (CofG = origin,
dynamicMeshDict `CofG (0 0 0)`).

Angular velocity from the xyz-Euler-angle table (R = Rz·Ry·Rx, see
core/motion.py:rotation_matrix):

    ω_lab = ċ ẑ + ḃ (Rz ŷ) + ȧ (Rz Ry x̂) = E(b, c) · (ȧ, ḃ, ċ),
    ω_body = Rᵀ ω_lab

dω is EXACT (r5): ω̇_lab = E·(ä, b̈, c̈) + Ė·(ȧ, ḃ, ċ) — the second
term is the Euler-rate coupling (products of rates, O(ω²)), dropped in
earlier rounds as negligible for the reference's gentle tables (rates
≤ 0.8 rad/s, gen6DoF.C:44-60) and now carried analytically so
aggressive user tables are handled too. ω̇_body = Rᵀ ω̇_lab holds
exactly (Ṙ = R[ω_body]× and [ω]×ω = 0), so no body-frame correction
is needed. Validated against a central-difference of ω_body(t) on a
large-rate table (tests/test_6dof.py::test_angular_rates_coupling).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def face_coordinates(geom, axis):
    """(X, Y, Z) 1-D coordinate arrays broadcastable to the `axis` face
    set: the face-normal coordinate sits on grid planes, the tangential
    ones at cell centers. Returned as numpy; callers broadcast lazily so
    no 3-D coordinate tensors are materialized."""
    nx, ny, nz = geom.shape
    h = geom.spacing
    o = geom.origin
    coords = []
    for d in range(3):
        n = (nx, ny, nz)[d]
        if d == axis:
            c = o[d] + np.arange(n + 1) * h[d]
        else:
            c = o[d] + (np.arange(n) + 0.5) * h[d]
        shape = [1, 1, 1]
        shape[d] = -1
        coords.append(jnp.asarray(c.reshape(shape), np.float32))
    return tuple(coords)


def angular_rates(motion, t):
    """(ω_body, dω_body) at time t from the tabulated Euler angles."""
    from openfoam_tpp_tpu.core.motion import rotation_matrix

    ang = motion.orientation(t)
    rates = motion.angular_velocity(t)       # (ȧ, ḃ, ċ) angle rates
    rates2 = motion.angular_acceleration(t)  # (ä, b̈, c̈)
    R = rotation_matrix(ang)

    cz, sz = jnp.cos(ang[2]), jnp.sin(ang[2])
    cy, sy = jnp.cos(ang[1]), jnp.sin(ang[1])
    # Columns of the Euler-rate map: lab-frame axes the rates act about.
    ez = jnp.array([0.0, 0.0, 1.0])
    ey = jnp.stack([-sz, cz, 0.0 * cz])                 # Rz·ŷ
    ex = jnp.stack([cz * cy, sz * cy, -sy])             # Rz·Ry·x̂
    E = jnp.stack([ex, ey, ez], axis=1)                 # (3 lab, 3 rates)
    omega_body = R.T @ (E @ rates)
    # Euler-rate coupling: Ė·rates, with Ėz = 0 and
    #   Ėy = ċ·(−cz, −sz, 0),  Ėx = ċ·(−sz·cy, cz·cy, 0) + ḃ·(−cz·sy,
    #   −sz·sy, −cy)  (chain rule on the columns above).
    da, db, dc = rates[0], rates[1], rates[2]
    edot_x = jnp.stack([-sz * cy * dc - cz * sy * db,
                        cz * cy * dc - sz * sy * db,
                        -cy * db])
    edot_y = jnp.stack([-cz * dc, -sz * dc, 0.0 * dc])
    coupling = da * edot_x + db * edot_y
    domega_body = R.T @ (E @ rates2 + coupling)
    return omega_body, domega_body


def _cross_component(a, bx, by, bz, axis):
    """Component `axis` of a×b for vector a=(3,) and field components b."""
    if axis == 0:
        return a[1] * bz - a[2] * by
    if axis == 1:
        return a[2] * bx - a[0] * bz
    return a[0] * by - a[1] * bx


def rotational_acceleration(axis, coords, omega, domega, u_face, v_face,
                            w_face):
    """−dω×r − ω×(ω×r) − 2ω×u at the `axis` face set.

    `coords` = broadcastable (X, Y, Z) from face_coordinates; u/v/w_face
    are all three velocity components interpolated to this face set."""
    X, Y, Z = coords
    # ω×r (components as broadcast fields)
    wxr_x = omega[1] * Z - omega[2] * Y
    wxr_y = omega[2] * X - omega[0] * Z
    wxr_z = omega[0] * Y - omega[1] * X
    cent = _cross_component(omega, wxr_x, wxr_y, wxr_z, axis)
    eul = _cross_component(domega, X, Y, Z, axis)
    cor = 2.0 * _cross_component(omega, u_face, v_face, w_face, axis)
    return -(eul + cent + cor)
