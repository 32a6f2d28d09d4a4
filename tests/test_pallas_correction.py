"""Parity: fused projection epilogue (velocity correction + div max,
ops/pallas/correction.py) vs the jnp path in interpret mode — the exact
sequence solver/timestep.py runs after the pressure solve."""

import numpy as np
import jax.numpy as jnp
import pytest

from openfoam_tpp_tpu.ops import stencil as st
from openfoam_tpp_tpu.ops.pallas import correction as ck

SPACING = (0.011, 0.009, 0.013)


def _inputs(shape, open_top, seed=3):
    nx, ny, nz = shape
    rng = np.random.RandomState(seed)
    f = lambda s, lo=-1.0, hi=1.0: rng.uniform(lo, hi, s).astype(np.float32)

    dp = f((nx, ny, nz), -50.0, 50.0)
    u = f((nx + 1, ny, nz))
    v = f((nx, ny + 1, nz))
    w = f((nx, ny, nz + 1))
    # β_f = 1/(face-mean ρ): positive, O(1e-3).
    bx = f((nx + 1, ny, nz), 8e-4, 1e-3)
    by = f((nx, ny + 1, nz), 8e-4, 1e-3)
    bz = f((nx, ny, nz + 1), 8e-4, 1e-3)
    # Apertures: sealed lateral walls, a few interior cut faces, open or
    # closed top.
    ax = f((nx + 1, ny, nz), 0.0, 1.0)
    ay = f((nx, ny + 1, nz), 0.0, 1.0)
    az = f((nx, ny, nz + 1), 0.0, 1.0)
    for a in (ax,):
        a[0] = 0.0
        a[-1] = 0.0
    ay[:, 0] = 0.0
    ay[:, -1] = 0.0
    az[:, :, 0] = 0.0
    topo = (rng.uniform(0, 1, (nx, ny)) > 0.3).astype(np.float32)
    if open_top:
        az[:, :, -1] = topo
    else:
        az[:, :, -1] = 0.0
        topo[:] = 0.0
    ax[ax < 0.2] = 0.0
    ay[ay < 0.2] = 0.0
    az[az < 0.2] = np.where(az[az < 0.2] > 0, az[az < 0.2], 0.0)
    vfrac = f((nx, ny, nz), 0.0, 1.0)
    vfrac[vfrac < 0.1] = 0.0
    rho_top = f((nx, ny), 1.0, 998.0)
    return (jnp.asarray(a) for a in
            (dp, u, v, w, bx, by, bz, ax, ay, az, vfrac, topo, rho_top))


def _truth(dp, u, v, w, bx, by, bz, ax, ay, az, vfrac, topo, rho_top,
           dt, open_top):
    hx, hy, hz = SPACING
    u_c = u - dt * bx * st.gradient_at_faces(dp, 0, hx)
    v_c = v - dt * by * st.gradient_at_faces(dp, 1, hy)
    w_c = w - dt * bz * st.gradient_at_faces(dp, 2, hz)
    if open_top:
        beta_top = jnp.where(topo > 0, 1.0 / rho_top, 0.0)
        w_top = w_c[:, :, -1] + dt * beta_top * 2.0 * dp[:, :, -1] / hz
        w_c = w_c.at[:, :, -1].set(w_top)
    u_c = jnp.where(ax > 0.0, u_c, 0.0)
    v_c = jnp.where(ay > 0.0, v_c, 0.0)
    w_c = jnp.where(az > 0.0, w_c, 0.0)
    div_err = jnp.max(
        jnp.abs(st.divergence(ax * u_c, ay * v_c, az * w_c, SPACING))
        * (vfrac > 0.0))
    return u_c, v_c, w_c, div_err


@pytest.mark.parametrize("open_top", [True, False])
def test_correction_parity(open_top):
    shape = (16, 9, 11)
    args = tuple(_inputs(shape, open_top))
    dt = jnp.float32(3.7e-3)
    want = _truth(*args, dt, open_top)
    dp, u, v, w, bx, by, bz, ax, ay, az, vfrac, topo, rho_top = args
    got = ck.correct_divmax(dp, u, v, w, (bx, by, bz), ax, ay, az,
                            vfrac, topo, rho_top, dt, SPACING,
                            open_top=open_top, interpret=True)
    for g, t, name in zip(got[:3], want[:3], "uvw"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(t),
                                   rtol=0, atol=1e-6, err_msg=name)
    np.testing.assert_allclose(float(got[3]), float(want[3]), rtol=1e-6)


def test_supported_gate():
    assert ck.supported((112, 112, 112))
    assert not ck.supported((112, 112, 112), jnp.bfloat16)
    assert not ck.supported((114, 112, 112))  # nx % SLAB
    assert not ck.supported((8, 112, 112, 2))  # batched layout
