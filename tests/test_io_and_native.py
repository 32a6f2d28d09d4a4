"""I/O codecs + native gen6dof parity tests."""

import os
import subprocess

import numpy as np

from openfoam_tpp_tpu.utils import io as uio

NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")


def test_6dof_roundtrip(tmp_path):
    path = str(tmp_path / "6DoF.dat")
    uio.generate_orbital_motion_table(
        path, r_max=0.003, freq=2.0, duration=0.5, dt=0.01, ramp_duration=0.05
    )
    t, trans, rot = uio.read_6dof_table(path)
    assert len(t) == 51
    assert np.allclose(rot, 0.0)
    # After the ramp the orbit radius is R.
    r = np.hypot(trans[:, 0], trans[:, 1])
    assert abs(r[-1] - 0.003) < 1e-8
    assert r[0] == 0.0


def _build_gen6dof():
    exe = os.path.join(NATIVE_DIR, "gen6dof")
    if not os.path.exists(exe):
        subprocess.run(["make", "-C", NATIVE_DIR], check=True,
                       capture_output=True)
    return exe


def test_native_gen6dof_orbital_matches_python(tmp_path):
    exe = _build_gen6dof()
    cpath = str(tmp_path / "c.dat")
    ppath = str(tmp_path / "p.dat")
    subprocess.run([exe, "orbital", cpath, "0.003", "2.0", "1.0", "0.01",
                    "-1"], check=True, capture_output=True)
    uio.generate_orbital_motion_table(
        ppath, r_max=0.003, freq=2.0, duration=1.0, dt=0.01, ramp_duration=0.1
    )
    tc, xc, rc = uio.read_6dof_table(cpath)
    tp, xp, rp = uio.read_6dof_table(ppath)
    assert len(tc) == len(tp)
    assert np.allclose(xc, xp, atol=1e-9)


def test_native_gen6dof_sine_reference_format(tmp_path):
    """The default sine mode reproduces gen6DoF.C's table: 100 rows over
    40 s, first translation amplitude 2·sin(0.5t)."""
    exe = _build_gen6dof()
    path = str(tmp_path / "s.dat")
    subprocess.run([exe, "sine", path], check=True, capture_output=True)
    t, trans, rot = uio.read_6dof_table(path)
    assert len(t) == 100
    assert abs(t[-1] - 40.0) < 1e-9
    assert np.allclose(trans[:, 0], 2 * np.sin(0.5 * t), atol=2e-4)
    assert np.allclose(rot[:, 0], 30 * np.sin(0.4 * t), atol=2e-3)


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from openfoam_tpp_tpu.core.state import init_state
    from openfoam_tpp_tpu.mesh import build_box_geometry

    geom = build_box_geometry(0.1, 0.1, 0.1, 0.025)
    state = init_state(geom, fill_height=0.0)
    case_dir = str(tmp_path)
    p = uio.save_checkpoint(case_dir, state)
    assert uio.latest_checkpoint(case_dir)[1] == p
    s2 = uio.to_state(uio.load_checkpoint(p))
    assert np.allclose(np.asarray(s2.alpha), np.asarray(state.alpha))
    assert float(s2.t) == float(state.t)


def test_vtp_writer(tmp_path):
    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], float)
    tris = np.array([[0, 1, 2]])
    path = str(tmp_path / "x.vtp")
    uio.write_vtp(path, pts, tris, point_data={"eta": np.array([0.0, 1, 2])})
    text = open(path).read()
    assert "<VTKFile" in text and 'NumberOfPolys="1"' in text
    assert 'Name="eta"' in text
