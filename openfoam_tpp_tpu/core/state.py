"""Simulation state pytrees.

The reference's per-case state is a directory of OpenFOAM time dirs
(0/alpha.water, 0/U, 0/p_rgh + constant/*); here it is a single jit-friendly
pytree on device. Initialization parity: alpha.water = 1 for z < H/2
(/root/reference/circularSloshingTank/update_setFields.py:21-37), U = 0,
p_rgh = 0 (0/U, 0/p_rgh).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from openfoam_tpp_tpu.config import PhysicalProperties
from openfoam_tpp_tpu.mesh.geometry import TankGeometry


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CaseParams:
    """Per-case forcing parameters — the vmap axis for parameter sweeps.

    Encodes the reference's (R, freq, ramp) motion inputs
    (/root/reference/circularSloshingTank/generate_motion.py) as traced
    scalars so hundreds of cases batch on one chip.
    """

    orbit_radius: jax.Array   # shaking radius R [m]
    omega: jax.Array          # angular frequency 2*pi*freq [rad/s]
    ramp_time: jax.Array      # soft-start duration [s]

    @staticmethod
    def make(R: float, freq: float, duration: float, ramp: float = -1.0):
        ramp_t = duration * 0.1 if ramp < 0 else ramp  # generate_motion.py:58-63
        f32 = lambda v: jnp.asarray(v, jnp.float32)
        return CaseParams(
            orbit_radius=f32(R),
            omega=f32(2.0 * np.pi * freq),
            ramp_time=f32(ramp_t),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SimState:
    """Full solver state (MAC layout)."""

    alpha: jax.Array   # (nx, ny, nz)   water volume fraction
    u: jax.Array       # (nx+1, ny, nz) x-face velocity
    v: jax.Array       # (nx, ny+1, nz) y-face velocity
    w: jax.Array       # (nx, ny, nz+1) z-face velocity
    p: jax.Array       # (nx, ny, nz)   total pressure (gauge; 0 = atmosphere)
    t: jax.Array       # simulated time [s]
    dt: jax.Array      # current adaptive step [s]
    step: jax.Array    # step counter (int32)


def init_state(
    geom: TankGeometry,
    fill_height: float | None = None,
    dt0: float = 1e-3,
    dtype=jnp.float32,
) -> SimState:
    """Quiescent half-filled tank (setFields parity: water below H/2)."""
    nx, ny, nz = geom.shape
    if fill_height is None:
        fill_height = geom.H / 2.0  # update_setFields.py:31

    _, _, zc = geom.cell_centers()
    hz = geom.spacing[2]
    # Sub-cell-accurate fill fraction of each cell's z-extent.
    frac = np.clip((fill_height - (zc - hz / 2.0)) / hz, 0.0, 1.0)
    alpha = np.broadcast_to(frac[None, None, :], geom.shape).copy()
    alpha[~geom.fluid] = 0.0

    z = jnp.zeros
    return SimState(
        alpha=jnp.asarray(alpha, dtype),
        u=z((nx + 1, ny, nz), dtype),
        v=z((nx, ny + 1, nz), dtype),
        w=z((nx, ny, nz + 1), dtype),
        p=z((nx, ny, nz), dtype),
        t=jnp.asarray(0.0, dtype),
        dt=jnp.asarray(dt0, dtype),
        step=jnp.asarray(0, jnp.int32),
    )


def mixture_density(alpha: jax.Array, props: PhysicalProperties) -> jax.Array:
    """rho = alpha*rho1 + (1-alpha)*rho2 (linear mixture, interFoam-class)."""
    return alpha * props.rho1 + (1.0 - alpha) * props.rho2


def mixture_viscosity(alpha: jax.Array, props: PhysicalProperties) -> jax.Array:
    """Dynamic viscosity mu = alpha*mu1 + (1-alpha)*mu2."""
    return alpha * props.mu1 + (1.0 - alpha) * props.mu2
