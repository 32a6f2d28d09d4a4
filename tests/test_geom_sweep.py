"""Geometry-batched sweeps (VERDICT r1 #4): (f, R, H, D) cases share one
compiled program with per-case cut-cell arrays as vmapped operands.

Checks: the batched step reproduces per-case runs of the same forced-grid
discretization (same core jitted without vmap), per-case alpha mass is
conserved independently, and the trailing-axis (lane-vectorized) layout
matches the leading-axis one.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from openfoam_tpp_tpu.config import PhysicalProperties, SolverControls
from openfoam_tpp_tpu.parallel.sweep import (
    batch_params,
    batch_states_geom,
    build_batched_geometry,
    make_geom_sweep_step,
)
from openfoam_tpp_tpu.solver.timestep import make_step_core

# 2 H × 2 D × distinct forcing — mixed-geometry Cartesian sweep rows.
ROWS = [
    {"H": 0.04, "D": 0.016, "mesh": 0.004, "geo": "flat",
     "R": 0.002, "freq": 2.5, "duration": 1.0},
    {"H": 0.04, "D": 0.020, "mesh": 0.004, "geo": "flat",
     "R": 0.003, "freq": 3.0, "duration": 1.0},
    {"H": 0.06, "D": 0.016, "mesh": 0.004, "geo": "flat",
     "R": 0.002, "freq": 3.5, "duration": 1.0},
    {"H": 0.06, "D": 0.020, "mesh": 0.004, "geo": "flat",
     "R": 0.003, "freq": 2.0, "duration": 1.0},
]
PROPS = PhysicalProperties()
CONTROLS = SolverControls(p_max_iters=12)
N_STEPS = 4


def test_batched_geometry_shapes():
    bg = build_batched_geometry(ROWS, round_to=4)
    assert bg.n_cases == 4
    nx, ny, nz = bg.shape
    assert nx % 4 == 0 and ny == nx
    # Every case's open top sits at its own H via per-case hz.
    for g, row in zip(bg.geoms, ROWS):
        assert g.shape == bg.shape
        assert np.isclose(g.origin[2] + g.shape[2] * g.spacing[2], row["H"])
        assert g.top_open.max() > 0
    # Smaller-D cases have fewer fluid cells on the shared grid.
    assert bg.geoms[0].n_fluid_cells < bg.geoms[1].n_fluid_cells

    import pytest

    with pytest.raises(ValueError):
        build_batched_geometry(
            [dict(ROWS[0]), {**ROWS[1], "mesh": 0.002}]
        )


def test_geom_sweep_matches_per_case():
    bg = build_batched_geometry(ROWS, round_to=4)
    params = batch_params(ROWS)
    states = batch_states_geom(bg)
    # lockstep=False: each lane takes its own CFL dt, so a lane replayed
    # solo with the recorded dt base reproduces the batch bitwise.
    sweep_step = make_geom_sweep_step(bg, PROPS, CONTROLS, lockstep=False)

    @jax.jit
    def advance(s, p):
        def body(s, _):
            # Record the synced dt base each step uses (min over batch),
            # so single-case replays can reproduce the batch exactly.
            dt_base = jnp.min(s.dt)
            s2, d = sweep_step(s, p)
            return s2, dt_base
        return jax.lax.scan(body, s, None, length=N_STEPS)

    batched, dt_bases = advance(states, params)
    assert np.asarray(batched.t > 0).all()
    a = np.asarray(batched.alpha)
    assert np.isfinite(a).all() and a.min() >= 0 and a.max() <= 1 + 1e-6

    # Per-case mass conservation on the shared grid.
    for i, g in enumerate(bg.geoms):
        vol0 = float(np.sum(np.asarray(states.alpha)[i] * g.vfrac))
        vol1 = float(np.sum(a[i] * g.vfrac))
        assert abs(vol1 - vol0) < 1e-3 * max(vol0, 1e-12), (i, vol0, vol1)

    # The same core, jitted WITHOUT vmap, reproduces each case: geometry
    # really is a runtime operand, not a baked constant.
    core = make_step_core(PROPS, CONTROLS, open_top=True)

    @jax.jit
    def single(s, p, ga, spacing, dt_seq):
        def body(carry, dt_base):
            s = dataclasses.replace(carry, dt=dt_base)
            s2, _ = core(s, p, ga, (spacing[0], spacing[1], spacing[2]))
            return s2, None
        s, _ = jax.lax.scan(body, s, dt_seq)
        return s

    i = 2  # spot-check one mixed case (H=0.06, D=0.016)
    s_i = jax.tree.map(lambda x: x[i], states)
    p_i = jax.tree.map(lambda x: x[i], params)
    ga_i = jax.tree.map(lambda x: x[i], bg.ga)
    out = single(s_i, p_i, ga_i, bg.spacing[i], dt_bases)
    np.testing.assert_allclose(
        np.asarray(out.alpha), a[i], atol=5e-5,
        err_msg="batched case diverges from the identical single-case run",
    )
    np.testing.assert_allclose(float(out.t), float(batched.t[i]), rtol=1e-6)


def test_lockstep_times_land_on_write_grid():
    """lockstep=True (default): all lanes share one dt (pmin), case
    times stay identical, and t_stop lands every lane exactly."""
    bg = build_batched_geometry(ROWS, round_to=4)
    params = batch_params(ROWS)
    states = batch_states_geom(bg)
    sweep_step = make_geom_sweep_step(bg, PROPS, CONTROLS)

    t_target = jnp.float32(0.01)

    @jax.jit
    def advance(s, p):
        def body(carry):
            s, k = carry
            s2, _ = sweep_step(s, p, t_stop=t_target)
            return (s2, k + 1)

        def cond(carry):
            s, k = carry
            return jnp.logical_and(jnp.min(s.t) < t_target, k < 200)

        s, _k = jax.lax.while_loop(cond, body, (s, 0))
        return s

    out = advance(states, params)
    t = np.asarray(out.t)
    assert np.unique(t).size == 1          # bitwise-identical lane times
    assert t[0] == np.float32(0.01)        # exact landing
    dt = np.asarray(out.dt)
    assert np.unique(dt).size == 1         # shared CFL dt


def test_trailing_axis_layout_matches():
    """axis=-1 (lane-vectorized single-chip layout) gives the same physics
    as axis=0."""
    bg0 = build_batched_geometry(ROWS, round_to=4, axis=0)
    bg1 = build_batched_geometry(ROWS, round_to=4, axis=-1)
    params = batch_params(ROWS)

    outs = []
    for bg in (bg0, bg1):
        states = batch_states_geom(bg)
        sweep_step = make_geom_sweep_step(bg, PROPS, CONTROLS)

        @jax.jit
        def advance(s, p, _step=sweep_step):
            def body(s, _):
                s2, _d = _step(s, p)
                return s2, None
            s, _ = jax.lax.scan(body, s, None, length=N_STEPS)
            return s

        outs.append(advance(states, params))

    a0 = np.asarray(outs[0].alpha)
    a1 = np.moveaxis(np.asarray(outs[1].alpha), -1, 0)
    np.testing.assert_allclose(a0, a1, atol=2e-5)
