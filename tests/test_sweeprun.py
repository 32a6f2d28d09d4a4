"""Batched manager runner (manager/sweeprun.py + --action runsweep):
mixed-geometry cases advance in one vmapped program with the single-case
runner's on-disk contract (write-grid checkpoints, probes, resume)."""

import glob
import os

import numpy as np

from openfoam_tpp_tpu.manager import cases as case_mgr
from openfoam_tpp_tpu.manager.cli import main as cli_main
from openfoam_tpp_tpu.manager.sweeprun import group_cases

ROWS = [
    {"H": 0.04, "D": 0.016, "mesh": 0.004, "geo": "flat",
     "R": 0.002, "freq": 2.5, "duration": 0.1, "dt": 5e-4, "ramp": 0.02},
    {"H": 0.04, "D": 0.020, "mesh": 0.004, "geo": "flat",
     "R": 0.003, "freq": 3.0, "duration": 0.1, "dt": 5e-4, "ramp": 0.02},
    {"H": 0.06, "D": 0.016, "mesh": 0.004, "geo": "flat",
     "R": 0.002, "freq": 3.5, "duration": 0.1, "dt": 5e-4, "ramp": 0.02},
]


def _build(tmp_path):
    return [case_mgr.setup_case(r, str(tmp_path)) for r in ROWS]


def test_group_cases_compatibility(tmp_path):
    dirs = _build(tmp_path)
    other = case_mgr.setup_case(
        {**ROWS[0], "mesh": 0.008, "R": 0.001}, str(tmp_path))
    groups = group_cases(dirs + [other])
    sizes = sorted(len(g) for g in groups)
    assert sizes == [1, 3]  # the finer-mesh case runs alone


def test_runsweep_end_to_end_and_resume(tmp_path):
    dirs = _build(tmp_path)
    rc = cli_main(["--headless", "--action", "runsweep", "--case", "all",
                   "--base-dir", str(tmp_path)])
    assert rc == 0

    for d, row in zip(dirs, ROWS):
        chks = sorted(glob.glob(os.path.join(d, "chk_t*.npz")))
        # t=0 + one write every 0.05 s up to duration 0.1.
        times = [float(os.path.basename(c)[5:-4]) for c in chks]
        assert times == [0.0, 0.05, 0.1], (d, times)
        assert case_mgr.is_case_done(d)
        payload = np.load(chks[-1])
        a = payload["alpha"]
        assert np.isfinite(a).all() and a.min() >= -1e-6 and a.max() <= 1 + 1e-6
        probe = os.path.join(d, "postProcessing", "probes", "0", "p")
        assert os.path.isfile(probe)
        body = [l for l in open(probe).read().splitlines()
                if l and not l.startswith("#")]
        assert len(body) == 2  # one row per write target

    # Second invocation: everything done -> batched path resumes and
    # writes nothing new (run selection excludes done cases).
    rc = cli_main(["--headless", "--action", "runsweep", "--case", "all",
                   "--base-dir", str(tmp_path)])
    assert rc == 0
    for d in dirs:
        chks = sorted(glob.glob(os.path.join(d, "chk_t*.npz")))
        assert len(chks) == 3
