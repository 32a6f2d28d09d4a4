"""Slurm submission layer (script generation; sbatch not required)."""

import os

from openfoam_tpp_tpu.manager import cases as case_mgr
from openfoam_tpp_tpu.manager.submit import write_job_script


def test_run_script_contents(tmp_path):
    d = case_mgr.setup_case(
        {"H": 0.05, "D": 0.02, "mesh": 0.004, "duration": 0.5}, str(tmp_path))
    path = write_job_script(d, "run")
    assert os.path.basename(path) == "run_simulation.slurm"
    text = open(path).read()
    assert "#SBATCH --nodes=1" in text
    assert "--action run" in text
    assert os.path.basename(d) in text
    assert "--gres=tpu:1" in text


def test_postprocess_script_sizing(tmp_path):
    d = case_mgr.setup_case({}, str(tmp_path))
    path = write_job_script(d, "interface")
    text = open(path).read()
    # Postprocess sizing parity: 8G / 1h (main.py:1022-1024).
    assert "--time=01:00:00" in text
    assert "--mem=8G" in text
    assert "--action interface" in text
