"""Parity: fused momentum finish (ops/pallas/mom_finish.py) vs the jnp
sequence solver/timestep.py runs after the momentum-RHS kernel —
face-density scaling, gravity add, wall mask — in interpret mode."""

import numpy as np
import jax.numpy as jnp

from openfoam_tpp_tpu.ops import stencil as st
from openfoam_tpp_tpu.ops.pallas import mom_finish as fk


def _inputs(shape, seed=7):
    nx, ny, nz = shape
    rng = np.random.RandomState(seed)
    f = lambda s, lo=-1.0, hi=1.0: rng.uniform(lo, hi, s).astype(np.float32)

    u = f((nx + 1, ny, nz))
    v = f((nx, ny + 1, nz))
    w = f((nx, ny, nz + 1))
    vcx = f((nx, ny, nz), -50, 50)      # RHS triple, au cell-shaped
    vcy = f((nx, ny + 1, nz), -50, 50)
    vcz = f((nx, ny, nz + 1), -50, 50)
    rho_old = f((nx, ny, nz), 1.0, 998.0)
    rho_new = f((nx, ny, nz), 1.0, 998.0)
    ax = f((nx + 1, ny, nz), 0.0, 1.0)
    ay = f((nx, ny + 1, nz), 0.0, 1.0)
    az = f((nx, ny, nz + 1), 0.0, 1.0)
    ax[0] = ax[-1] = 0.0
    ay[:, 0] = ay[:, -1] = 0.0
    az[:, :, 0] = 0.0
    for a in (ax, ay, az):
        a[a < 0.25] = 0.0
    return tuple(jnp.asarray(a) for a in
                 (u, v, w, vcx, vcy, vcz, rho_old, rho_new, ax, ay, az))


def test_finish_parity():
    shape = (16, 9, 11)
    u, v, w, vcx, vcy, vcz, ro, rn, ax, ay, az = _inputs(shape)
    dt = jnp.float32(2.9e-3)
    G = (jnp.float32(0.31), jnp.float32(-0.12), jnp.float32(-9.81))

    want = []
    for axi, (q, vc, ap) in enumerate(
            ((u, jnp.concatenate([vcx, jnp.zeros_like(vcx[:1])], 0), ax),
             (v, vcy, ay), (w, vcz, az))):
        rof = st.cells_to_faces_avg(ro, axi)
        rnf = st.cells_to_faces_avg(rn, axi)
        q_star = (rof * q + dt * vc) / rnf + dt * G[axi]
        want.append(jnp.where(ap > 0.0, q_star, 0.0))

    got = fk.momentum_finish(u, v, w, (vcx, vcy, vcz), ro, rn,
                             ax, ay, az, dt, G, interpret=True)
    for g, t, name in zip(got, want, "uvw"):
        # u's face-nx wall row: kernel emits zeros, the jnp path masks it
        # to zeros via the aperture — identical.
        np.testing.assert_allclose(np.asarray(g), np.asarray(t),
                                   rtol=0, atol=1e-5, err_msg=name)


def test_supported_gate():
    assert fk.supported((112, 112, 112))
    assert not fk.supported((112, 112, 112), jnp.bfloat16)
    assert not fk.supported((113, 112, 112))
    assert not fk.supported((8, 112, 112, 2))


def test_finish_step_wiring(monkeypatch):
    """OFTPP_FINISH_PALLAS=1 (+ the RHS kernel) routes the solver step's
    momentum finish through the fused kernel (interpret-mode on CPU) and
    matches the default step — same pattern as
    test_momentum_rhs_step_wiring."""
    import functools

    import jax

    from openfoam_tpp_tpu.config import PhysicalProperties, SolverControls
    from openfoam_tpp_tpu.core.state import CaseParams, init_state
    from openfoam_tpp_tpu.mesh import build_tank_geometry
    from openfoam_tpp_tpu.ops.pallas import momentum_rhs as mrk
    from openfoam_tpp_tpu.solver.timestep import make_step

    geom = build_tank_geometry(H=0.04, D=0.048, mesh=0.004, geo="flat",
                               round_to=4)
    assert fk.supported(geom.shape), geom.shape
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
    monkeypatch.setenv("OFTPP_FINISH_PALLAS", "1")
    monkeypatch.setattr(mrk, "momentum_rhs",
                        functools.partial(mrk.momentum_rhs,
                                          interpret=True))
    monkeypatch.setattr(fk, "momentum_finish",
                        functools.partial(fk.momentum_finish,
                                          interpret=True))
    fused = run()
    np.testing.assert_allclose(np.asarray(fused.alpha),
                               np.asarray(base.alpha), atol=2e-5)
    np.testing.assert_allclose(np.asarray(fused.w), np.asarray(base.w),
                               atol=2e-4)
