"""Multi-device sharding tests on the 8-virtual-CPU mesh (SURVEY.md §4:
the TPU-native substitute for "distributed tests without a real cluster").

Checks (a) PackedState round-trips the MAC layout exactly, (b) the
sharded+vmapped sweep step produces bitwise-comparable physics to the
unsharded step on the same inputs.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from openfoam_tpp_tpu.config import PhysicalProperties, SolverControls
from openfoam_tpp_tpu.core.state import init_state
from openfoam_tpp_tpu.mesh import build_tank_geometry
from openfoam_tpp_tpu.parallel import packed as pk
from openfoam_tpp_tpu.parallel import sharding as sh
from openfoam_tpp_tpu.parallel.sweep import (
    batch_params,
    batch_states,
    make_sweep_step,
)

_CONTROLS = SolverControls(p_max_iters=8)


def _tiny_geom(n_x_shards=1):
    return build_tank_geometry(H=0.04, D=0.02, mesh=0.004, geo="flat",
                               round_to=n_x_shards)


def test_pack_unpack_roundtrip():
    geom = _tiny_geom()
    state = init_state(geom)
    # Give the faces non-trivial values, including the atmosphere plane.
    state = dataclasses.replace(
        state,
        u=state.u + 1.0,
        v=state.v + 2.0,
        w=state.w + jnp.arange(state.w.shape[-1], dtype=state.w.dtype),
    )
    s2 = pk.unpack(pk.pack(state))
    for name in ("alpha", "u", "v", "w", "p"):
        a, b = getattr(state, name), getattr(s2, name)
        if name in ("u", "v"):
            # The dropped upper-boundary face is restored as 0 (wall).
            assert np.allclose(np.asarray(b)[..., -1, :, :]
                               if name == "u" else np.asarray(b)[:, -1, :], 0.0)
            continue
        assert np.array_equal(np.asarray(a), np.asarray(b)), name


def test_sharded_sweep_matches_unsharded():
    n_dev = jax.device_count()
    assert n_dev >= 8, "conftest must provide 8 virtual CPU devices"
    mesh = sh.make_mesh(8, case_axis=2)
    n_x = mesh.devices.shape[1]

    geom = _tiny_geom(n_x_shards=n_x)
    sweep_step = make_sweep_step(geom, PhysicalProperties(), _CONTROLS)

    rows = [
        {"R": 0.001 + 0.001 * i, "freq": 2.0 + i, "duration": 1.0}
        for i in range(4)
    ]
    params = batch_params(rows)
    states = batch_states(geom, len(rows))

    # Unsharded single-device reference.
    ref_states, ref_diag = jax.jit(sweep_step)(states, params)

    # Sharded over (case=2, x=4).
    stepped = sh.sharded_step(sweep_step, mesh, batched=True)
    ps = jax.device_put(pk.pack(states), sh.state_sharding(mesh, batched=True))
    pp = jax.device_put(params, sh.params_sharding(mesh, batched=True))
    out_ps, out_diag = stepped(ps, pp)
    out_states = pk.unpack(out_ps)

    np.testing.assert_allclose(
        np.asarray(out_states.alpha), np.asarray(ref_states.alpha),
        rtol=0, atol=5e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out_states.w), np.asarray(ref_states.w),
        rtol=0, atol=5e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_states.t), np.asarray(ref_states.t), rtol=1e-6)


def test_sharded_3axis_matches_unsharded():
    """(case=2, x=2, y=2) — the 2-D spatial decomposition (hierarchical-n
    decomposeParDict analog, VERDICT r3 item 3)."""
    assert jax.device_count() >= 8
    mesh = sh.make_mesh(8, case_axis=2, y_axis=2)
    assert mesh.devices.shape == (2, 2, 2)

    geom = _tiny_geom(n_x_shards=2)
    assert geom.shape[0] % 2 == 0 and geom.shape[1] % 2 == 0
    sweep_step = make_sweep_step(geom, PhysicalProperties(), _CONTROLS)

    rows = [
        {"R": 0.001 + 0.001 * i, "freq": 2.0 + i, "duration": 1.0}
        for i in range(4)
    ]
    params = batch_params(rows)
    states = batch_states(geom, len(rows))
    ref_states, _ = jax.jit(sweep_step)(states, params)

    stepped = sh.sharded_step(sweep_step, mesh, batched=True)
    ps = jax.device_put(pk.pack(states), sh.state_sharding(mesh, batched=True))
    pp = jax.device_put(params, sh.params_sharding(mesh, batched=True))
    out_states = pk.unpack(stepped(ps, pp)[0])

    np.testing.assert_allclose(
        np.asarray(out_states.alpha), np.asarray(ref_states.alpha),
        rtol=0, atol=5e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out_states.w), np.asarray(ref_states.w),
        rtol=0, atol=5e-5,
    )


def test_parse_devices():
    assert sh.parse_devices(None) == (1, 1)
    assert sh.parse_devices(4) == (4, 1)
    assert sh.parse_devices("8") == (8, 1)
    assert sh.parse_devices("4x2") == (4, 2)
    assert sh.parse_devices("2X2") == (2, 2)
