"""Tank motion → non-inertial frame forcing, evaluated on device.

The reference prescribes solid-body tank motion via an interpolated
position table (`constant/6DoF.dat`, written by
/root/reference/circularSloshingTank/generate_motion.py, consumed by the
`sixDoFMotion` solid-body mesh motion solver, constant/dynamicMeshDict:17-44).

Here the solver works in the tank frame: for pure translation the exact
transformation is a uniform body force -a_frame(t) per unit mass, which we
fold together with gravity into a time-dependent *effective gravity*
G(t) = g - a_frame(t). G(t) enters the momentum equation only through the
well-balanced face force -(G·x) ∂ρ/∂n (see solver/momentum.py), so a
quiescent stratified tank stays exactly quiescent under any ramp.

Orbital motion (generate_motion.py:28-40): x = r(t) cos ωt, y = r(t) sin ωt,
with the radius soft-started by smootherstep over `ramp_time`
(generate_motion.py:5-7,20-24).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def smootherstep(tau):
    """6τ⁵ − 15τ⁴ + 10τ³, clamped to [0, 1] (generate_motion.py:5-7)."""
    tau = jnp.clip(tau, 0.0, 1.0)
    return tau * tau * tau * (tau * (tau * 6.0 - 15.0) + 10.0)


def _smootherstep_d1(tau):
    tau = jnp.clip(tau, 0.0, 1.0)
    return 30.0 * tau * tau * (tau - 1.0) * (tau - 1.0)


def _smootherstep_d2(tau):
    tau = jnp.clip(tau, 0.0, 1.0)
    return 60.0 * tau * (2.0 * tau - 1.0) * (tau - 1.0)


def orbital_position(t, params):
    """Tank-origin position in the lab frame (x, y, z)."""
    tau = t / jnp.maximum(params.ramp_time, 1e-30)
    r = params.orbit_radius * smootherstep(tau)
    th = params.omega * t
    return jnp.stack([r * jnp.cos(th), r * jnp.sin(th), jnp.zeros_like(r)])


def orbital_acceleration(t, params):
    """Analytic d²/dt² of the ramped orbit (exact, no table interpolation).

    x = r cosθ ⇒ x'' = (r'' − rω²)cosθ − 2 r'ω sinθ, and symmetrically for y.
    """
    Tr = jnp.maximum(params.ramp_time, 1e-30)
    tau = t / Tr
    R, om = params.orbit_radius, params.omega
    r = R * smootherstep(tau)
    r1 = R * _smootherstep_d1(tau) / Tr
    r2 = R * _smootherstep_d2(tau) / (Tr * Tr)
    th = om * t
    c, s = jnp.cos(th), jnp.sin(th)
    radial = r2 - r * om * om
    ax = radial * c - 2.0 * r1 * om * s
    ay = radial * s + 2.0 * r1 * om * c
    return jnp.stack([ax, ay, jnp.zeros_like(ax)])


def effective_gravity(t, params, g: float = 9.81):
    """G(t) = g ẑ(−) − a_frame(t): uniform body acceleration in the tank
    frame. Shape (3,)."""
    a = orbital_acceleration(t, params)
    return jnp.asarray([0.0, 0.0, -g], a.dtype) - a


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TableMotion:
    """Prescribed motion from a sampled table (6DoF.dat-class input).

    Accelerations are precomputed on the host by second-order central
    differences of the (densely resampled) position table and linearly
    interpolated on device — the TPU equivalent of OpenFOAM's tableFile
    interpolation in `sixDoFMotion`. Rotation columns are carried for the
    6DoF tank model (centrifugal/Euler/Coriolis sources, models/tank6dof).
    """

    times: jax.Array        # (n,)
    accel: jax.Array        # (n, 3)   translational acceleration
    omega: jax.Array        # (n, 3)   angular velocity [rad/s]
    domega: jax.Array       # (n, 3)   angular acceleration [rad/s²]
    rot: jax.Array          # (n, 3)   orientation (xyz rotations, rad)

    @staticmethod
    def from_table(times: np.ndarray, trans: np.ndarray, rot_deg: np.ndarray,
                   resample_dt: float | None = None) -> "TableMotion":
        """Build from raw (t, translation, rotation-in-degrees) rows —
        the exact content of a 6DoF.dat file (gen6DoF.C:62-87 format)."""
        t = np.asarray(times, np.float64)
        x = np.asarray(trans, np.float64)
        r = np.deg2rad(np.asarray(rot_deg, np.float64))
        if resample_dt is not None and len(t) > 1:
            tq = np.arange(t[0], t[-1] + resample_dt / 2, resample_dt)
            x = np.stack([np.interp(tq, t, x[:, i]) for i in range(3)], -1)
            r = np.stack([np.interp(tq, t, r[:, i]) for i in range(3)], -1)
            t = tq
        acc = np.gradient(np.gradient(x, t, axis=0), t, axis=0)
        om = np.gradient(r, t, axis=0)
        dom = np.gradient(om, t, axis=0)
        f32 = lambda a: jnp.asarray(a, jnp.float32)
        return TableMotion(times=f32(t), accel=f32(acc), omega=f32(om),
                           domega=f32(dom), rot=f32(r))

    def acceleration(self, t):
        return jax.vmap(lambda col: jnp.interp(t, self.times, col), 1)(self.accel)

    def angular_velocity(self, t):
        return jax.vmap(lambda col: jnp.interp(t, self.times, col), 1)(self.omega)

    def angular_acceleration(self, t):
        return jax.vmap(lambda col: jnp.interp(t, self.times, col), 1)(self.domega)

    def orientation(self, t):
        return jax.vmap(lambda col: jnp.interp(t, self.times, col), 1)(self.rot)

    @property
    def has_rotation(self) -> bool:
        return bool(np.any(np.abs(np.asarray(self.rot)) > 1e-12))


def rotation_matrix(angles):
    """Body←lab rotation R = Rz(rz)·Ry(ry)·Rx(rx) from xyz Euler angles —
    the composition OpenFOAM's `quaternion(XYZ, rot)` applies to the tank
    in `sixDoFMotion` (sloshingTank3D6DoF/constant/dynamicMeshDict:17-44).
    Lab vectors transform into the tank frame with Rᵀ."""
    rx, ry, rz = angles[0], angles[1], angles[2]
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    Rx = jnp.array([[1.0, 0.0, 0.0], [0.0, cx, -sx], [0.0, sx, cx]])
    Ry = jnp.array([[cy, 0.0, sy], [0.0, 1.0, 0.0], [-sy, 0.0, cy]])
    Rz = jnp.array([[cz, -sz, 0.0], [sz, cz, 0.0], [0.0, 0.0, 1.0]])
    return Rz @ Ry @ Rx
