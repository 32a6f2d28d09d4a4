"""Tiled sweeps (parallel/tiled_sweep.py): N same-geometry cases merged
into one grid along x must reproduce the vmapped sweep exactly — the
zero-aperture junctions decouple the blocks, and the single global
adaptive dt equals the vmapped path's synced batch-min dt.
"""

import jax
import jax.numpy as jnp
import numpy as np

from openfoam_tpp_tpu.config import PhysicalProperties, SolverControls
from openfoam_tpp_tpu.mesh import build_tank_geometry
from openfoam_tpp_tpu.parallel.sweep import (
    batch_params,
    batch_states,
    make_sweep_step,
)
from openfoam_tpp_tpu.parallel.tiled_sweep import (
    make_tiled_sweep_step,
    tile_geometry,
    tile_state,
    untile,
)

ROWS = [
    {"R": 0.0020, "freq": 2.5, "duration": 1.0, "ramp": 0.05},
    {"R": 0.0030, "freq": 3.0, "duration": 1.0, "ramp": 0.05},
    {"R": 0.0015, "freq": 3.5, "duration": 1.0, "ramp": 0.05},
]
PROPS = PhysicalProperties()
CONTROLS = SolverControls(p_max_iters=15)
N_STEPS = 5


def _geom():
    return build_tank_geometry(H=0.04, D=0.016, mesh=0.004, geo="flat")


def test_tile_geometry_sealed_junctions():
    geom = _geom()
    n = len(ROWS)
    tg = tile_geometry(geom, n)
    nx = geom.shape[0]
    assert tg.shape == (nx * n, geom.shape[1], geom.shape[2])
    assert tg.ax.shape[0] == nx * n + 1
    # Every junction face (block boundaries) is sealed.
    for i in range(n + 1):
        assert np.all(tg.ax[i * nx if i < n else -1] == 0.0)
    assert tg.n_fluid_cells == n * geom.n_fluid_cells


def test_tiled_matches_vmapped_sweep():
    geom = _geom()
    n = len(ROWS)
    params = batch_params(ROWS)

    # vmapped reference path (dt synced to batch min each step).
    vstates = batch_states(geom, n)
    vstep = make_sweep_step(geom, PROPS, CONTROLS)

    @jax.jit
    def v_advance(s, p):
        def body(s, _):
            s2, _d = vstep(s, p)
            return s2, None
        s, _ = jax.lax.scan(body, s, None, length=N_STEPS)
        return s

    vout = v_advance(vstates, params)

    # tiled path.
    tstate = tile_state(geom, n)
    tstep = make_tiled_sweep_step(geom, n, PROPS, CONTROLS)

    @jax.jit
    def t_advance(s, p):
        def body(s, _):
            s2, _d = tstep(s, p)
            return s2, None
        s, _ = jax.lax.scan(body, s, None, length=N_STEPS)
        return s

    tout = t_advance(tstate, params)

    # Same global time and dt as every vmapped case.
    np.testing.assert_allclose(float(tout.t), np.asarray(vout.t), rtol=1e-6)
    np.testing.assert_allclose(float(tout.dt), float(vout.dt.min()),
                               rtol=1e-5)

    a_blocks = untile(tout.alpha, n)
    a_v = np.asarray(vout.alpha)
    assert np.isfinite(a_blocks).all()
    # The pressure solve couples nothing across blocks but its CG runs on
    # the union system (different Krylov trajectory than per-case solves),
    # so agreement is to solver tolerance, not bitwise.
    np.testing.assert_allclose(a_blocks, a_v, atol=5e-4)
    w_blocks = untile(tout.w, n)
    w_v = np.asarray(vout.w)
    np.testing.assert_allclose(w_blocks, w_v, atol=5e-3)

    # Per-block mass conservation on the merged grid.
    vfrac = np.asarray(geom.vfrac)
    for i in range(n):
        m0 = (np.asarray(tstate.alpha)[i * geom.shape[0]:(i + 1) * geom.shape[0]]
              * vfrac).sum()
        m1 = (a_blocks[i] * vfrac).sum()
        assert abs(m1 - m0) < 1e-3 * m0


def test_untile_face_arrays():
    geom = _geom()
    n = 3
    tstate = tile_state(geom, n)
    u_blocks = untile(tstate.u, n, face_x=True)
    assert u_blocks.shape == (n, geom.shape[0] + 1, geom.shape[1],
                              geom.shape[2])
