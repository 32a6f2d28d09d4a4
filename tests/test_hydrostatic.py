"""Well-balanced property: a stratified tank under gravity (and under any
uniform frame acceleration) must stay exactly quiescent — the discrete
analog of interFoam's ghf*snGrad(rho) split. This is the no-spurious-
currents invariant that makes two-phase projection schemes usable at
density ratio 1000:1."""

import jax
import jax.numpy as jnp
import numpy as np

from openfoam_tpp_tpu.config import PhysicalProperties, SolverControls
from openfoam_tpp_tpu.core.state import CaseParams, init_state
from openfoam_tpp_tpu.mesh import build_box_geometry, build_tank_geometry
from openfoam_tpp_tpu.solver.timestep import make_step


def _max_speed(state):
    return max(
        float(jnp.max(jnp.abs(state.u))),
        float(jnp.max(jnp.abs(state.v))),
        float(jnp.max(jnp.abs(state.w))),
    )


def test_hydrostatic_box_quiescent():
    geom = build_box_geometry(0.1, 0.1, 0.2, 0.02, open_top=True)
    props = PhysicalProperties()
    controls = SolverControls(p_tol_rel=1e-6, p_max_iters=500)
    step = jax.jit(make_step(geom, props, controls))
    state = init_state(geom, fill_height=0.0)  # box spans [-0.1, 0.1]
    params = CaseParams.make(R=0.0, freq=1.0, duration=10.0)
    for _ in range(5):
        state, diag = step(state, params)
    assert _max_speed(state) < 1e-6, _max_speed(state)
    assert float(diag.alpha_min) >= 0.0
    assert float(diag.alpha_max) <= 1.0


def test_hydrostatic_cylinder_quiescent():
    geom = build_tank_geometry(0.1, 0.02, 0.002, geo="flat")
    props = PhysicalProperties()
    controls = SolverControls(p_tol_rel=1e-6, p_max_iters=500)
    step = jax.jit(make_step(geom, props, controls))
    state = init_state(geom)
    params = CaseParams.make(R=0.0, freq=2.0, duration=10.0)
    for _ in range(3):
        state, diag = step(state, params)
    assert _max_speed(state) < 1e-5, _max_speed(state)


def test_uniform_acceleration_balanced():
    """Uniform horizontal frame acceleration on an unramped orbit start:
    the well-balanced split must absorb it into p_rgh at leading order."""
    geom = build_box_geometry(0.1, 0.1, 0.2, 0.02, open_top=True)
    step = jax.jit(make_step(geom, PhysicalProperties(),
                             SolverControls(p_tol_rel=1e-6, p_max_iters=500)))
    state = init_state(geom, fill_height=0.0)
    # ramp_time tiny => full orbit radius immediately; a(t) rotates slowly.
    params = CaseParams.make(R=0.001, freq=0.05, duration=100.0, ramp=1e-6)
    state, _ = step(state, params)
    # The interface tilts over time, but one small step from rest must not
    # spike velocities beyond the physical scale a*dt.
    assert _max_speed(state) < 5e-3


def test_mass_conservation_sloshing():
    """Total liquid volume is conserved to round-off while sloshing
    (KNOWLEDGE_BASE.md continuity-error checklist, automated)."""
    geom = build_tank_geometry(0.05, 0.02, 0.002, geo="flat")
    step = jax.jit(make_step(geom, PhysicalProperties(), SolverControls()))
    state = init_state(geom, dt0=5e-4)
    params = CaseParams.make(R=0.002, freq=3.0, duration=10.0, ramp=0.1)
    vol0 = float(jnp.sum(state.alpha * jnp.asarray(geom.vfrac)))
    for _ in range(20):
        state, diag = step(state, params)
    vol = float(jnp.sum(state.alpha * jnp.asarray(geom.vfrac)))
    assert abs(vol - vol0) / vol0 < 1e-4
    assert float(diag.alpha_min) >= -1e-6
    assert float(diag.alpha_max) <= 1.0 + 1e-6
    # And the flow actually moves (forcing is on).
    assert _max_speed(state) > 1e-6
