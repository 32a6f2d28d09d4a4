"""Multi-device manager run path: `run_case(devices=8)` on the 8-virtual-
device CPU mesh (conftest.py) — the product-facing equivalent of the
reference's decomposePar → mpirun -np N foamRun -parallel →
reconstructPar pipeline (/root/reference/circularSloshingTank/
Makefile:77-82). Covers multiple write intervals, a mid-run kill, resume
on the mesh, and equivalence with the single-device answer."""

import os
import shutil

import numpy as np
import pytest

import jax

from openfoam_tpp_tpu.manager.cases import setup_case
from openfoam_tpp_tpu.manager.runner import run_case
from openfoam_tpp_tpu.utils.io import list_checkpoints, load_checkpoint

ROW = {"H": 0.04, "D": 0.02, "mesh": 0.004, "geo": "flat", "R": 0.002,
       "freq": 3.0, "duration": 0.15, "dt": 5e-4, "ramp": -1.0,
       "n_cpus": 1}


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_sharded_run_resume_and_match(tmp_path):
    base = str(tmp_path)
    sharded_dir = setup_case(dict(ROW), base)

    # --- full 8-device run: duration 0.15 s = 3 write intervals ---
    run_case(sharded_dir, devices=8, log=lambda *a: None)
    chks = list_checkpoints(sharded_dir)
    times = [t for t, _ in chks]
    assert times == pytest.approx([0.0, 0.05, 0.10, 0.15], abs=1e-6)

    # --- kill simulation: drop the last two checkpoints, resume on mesh ---
    for t, path in chks:
        if t > 0.05 + 1e-9:
            os.remove(path)
    run_case(sharded_dir, devices=8, log=lambda *a: None)
    chks2 = dict(list_checkpoints(sharded_dir))
    assert sorted(chks2) == pytest.approx([0.0, 0.05, 0.10, 0.15],
                                          abs=1e-6)
    final_sharded = load_checkpoint(chks2[max(chks2)])

    # --- single-device reference run of an identical case ---
    solo_base = str(tmp_path / "solo")
    os.makedirs(solo_base)
    solo_dir = setup_case(dict(ROW), solo_base)
    run_case(solo_dir, devices=None, log=lambda *a: None)
    solo_chks = dict(list_checkpoints(solo_dir))
    final_solo = load_checkpoint(solo_chks[max(solo_chks)])

    assert final_sharded["alpha"].shape == final_solo["alpha"].shape
    # f32 reduction orders differ across the mesh (psum vs single-device
    # sum); ~100 steps of drift stays tiny on this smooth flow.
    da = np.abs(final_sharded["alpha"] - final_solo["alpha"]).max()
    assert da < 5e-3, da
    assert abs(float(final_sharded["t"]) - float(final_solo["t"])) < 1e-9

    # Probe files exist and carry one row per write (plus header).
    probe = os.path.join(sharded_dir, "postProcessing", "probes", "0", "p")
    assert os.path.isfile(probe)

    shutil.rmtree(solo_base, ignore_errors=True)
