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
