"""Parity: fused Pallas momentum RHS vs the jnp path (interpret mode).

The kernel (ops/pallas/momentum_rhs.py) must reproduce
solver/momentum.py's visc + dev2 − conv at every face it owns: all
non-wall rows of the cell-shaped outputs plus the open-top w plane
(computed by the wrapper's 4-cell z-window). Inputs are *physical*:
wall velocity faces and wall rhoPhi faces are exact zeros, as the
solver state guarantees (masking every step; aperture-zero fluxes).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openfoam_tpp_tpu.ops.pallas import momentum_rhs as mrk
from openfoam_tpp_tpu.solver import momentum as mom
from openfoam_tpp_tpu.ops import stencil as st

SPACING = (0.011, 0.009, 0.013)


def _physical_inputs(shape, open_top, seed=0):
    nx, ny, nz = shape
    rng = np.random.RandomState(seed)

    def f(s):
        return rng.uniform(-1.0, 1.0, size=s).astype(np.float32)

    u = f((nx + 1, ny, nz))
    v = f((nx, ny + 1, nz))
    w = f((nx, ny, nz + 1))
    rpx = f((nx + 1, ny, nz))
    rpy = f((nx, ny + 1, nz))
    rpz = f((nx, ny, nz + 1))
    # Wall faces are exact zeros (solver masks + aperture-zero fluxes).
    for a in (u, rpx):
        a[0] = 0.0
        a[-1] = 0.0
    for a in (v, rpy):
        a[:, 0] = 0.0
        a[:, -1] = 0.0
    for a in (w, rpz):
        a[:, :, 0] = 0.0
        if not open_top:
            a[:, :, -1] = 0.0
    mu = rng.uniform(1e-5, 2e-3, size=(nx, ny, nz)).astype(np.float32)
    div_u = f((nx, ny, nz)) * 0.1
    return (jnp.asarray(u), jnp.asarray(v), jnp.asarray(w),
            jnp.asarray(rpx), jnp.asarray(rpy), jnp.asarray(rpz),
            jnp.asarray(mu), jnp.asarray(div_u))


def _truth(u, v, w, rho_phi, mu, div_u, dev2):
    edges = mom.edge_viscosities(mu)
    outs = []
    for ax, q in enumerate((u, v, w)):
        a = (mom.viscous_face_field(q, ax, mu, SPACING, edges)
             - mom.convect_face_field(q, ax, rho_phi, SPACING))
        if dev2:
            a = a + mom.transpose_viscous_face_field(
                (u, v, w), ax, mu, SPACING, edges, div_u)
        outs.append(a)
    return outs


@pytest.mark.parametrize("open_top", [True, False])
@pytest.mark.parametrize("dev2", [True, False])
def test_momentum_rhs_parity(open_top, dev2):
    shape = (16, 10, 12)
    u, v, w, rpx, rpy, rpz, mu, div_u = _physical_inputs(shape, open_top)
    rho_phi = (rpx, rpy, rpz)

    got = mrk.momentum_rhs(u, v, w, rho_phi, mu, div_u, SPACING,
                           dev2=dev2, interpret=True)
    want = _truth(u, v, w, rho_phi, mu, div_u, dev2)

    scale = max(float(jnp.max(jnp.abs(a))) for a in want)
    # Every face but u's top wall row (outside the x grid; the kernel
    # returns zeros there and it is masked downstream either way). v and
    # w come back COMPLETE, including w's open-top plane.
    kept = [
        (got[0][:-1], want[0][:-1], "u"),
        (got[1], want[1], "v"),
        (got[2], want[2], "w"),
    ]
    for g, t, name in kept:
        err = float(jnp.max(jnp.abs(g - t)))
        assert err <= 1e-5 * scale, (name, err, scale)
    assert float(jnp.max(jnp.abs(got[0][-1]))) == 0.0


def test_momentum_rhs_step_wiring(monkeypatch):
    """OFTPP_MOM_PALLAS=1 routes the solver step through the fused
    kernel (interpret-mode on CPU) and matches the default step."""
    import functools

    from openfoam_tpp_tpu.config import PhysicalProperties, SolverControls
    from openfoam_tpp_tpu.core.state import CaseParams, init_state
    from openfoam_tpp_tpu.mesh import build_tank_geometry
    from openfoam_tpp_tpu.solver.timestep import make_step

    geom = build_tank_geometry(H=0.04, D=0.048, mesh=0.004, geo="flat",
                               round_to=4)
    assert mrk.supported(geom.shape), geom.shape
    props = PhysicalProperties()
    controls = SolverControls(p_max_iters=15)
    params = CaseParams.make(R=0.002, freq=3.0, duration=1.0, ramp=0.02)

    def run():
        step = jax.jit(make_step(geom, props, controls))
        state = init_state(geom, dt0=5e-4)
        for _ in range(3):
            state, diag = step(state, params)
        return state

    base = run()
    monkeypatch.setenv("OFTPP_MOM_PALLAS", "1")
    monkeypatch.setattr(mrk, "momentum_rhs",
                        functools.partial(mrk.momentum_rhs,
                                          interpret=True))
    fused = run()
    np.testing.assert_allclose(np.asarray(fused.alpha),
                               np.asarray(base.alpha), atol=2e-5)
    np.testing.assert_allclose(np.asarray(fused.w), np.asarray(base.w),
                               atol=2e-4)


def test_momentum_rhs_quiescent_hydrostatic():
    """Zero velocity + zero flux => RHS identically zero (well-balanced)."""
    shape = (8, 8, 8)
    z = jnp.zeros
    u, v, w = z((9, 8, 8)), z((8, 9, 8)), z((8, 8, 9))
    rp = (z((9, 8, 8)), z((8, 9, 8)), z((8, 8, 9)))
    mu = jnp.full((8, 8, 8), 1e-3, jnp.float32)
    got = mrk.momentum_rhs(u, v, w, rp, mu, None, SPACING,
                           dev2=True, interpret=True)
    for a in got:
        assert float(jnp.max(jnp.abs(a))) == 0.0
