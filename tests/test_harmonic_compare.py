"""Harmonic-content golden comparison (VALIDATION.md round 4).

Locks the two load-bearing claims of scripts/harmonic_compare.py:
(1) the stdlib VTK-XML reader reproduces the reference's own
interface_summary.csv statistics bit-close for a shipped VTP, and
(2) the rotating-wave fundamental of our shipped flagship wall trace
matches the linear potential-theory amplitude to <3% with <10 deg
phase (the reference's OpenFOAM run is ~47% damped at this mesh —
see VALIDATION.md for the full table).
"""

import csv
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

CASE = "case_H0.208_D0.2_flat_R0.004_f1.88_d20.0_m0.009"
REF_CASE = os.path.join("/root/reference", CASE)
SIM_CSV = os.path.join(REPO, "cases", CASE, "postProcessing", "interface",
                       "wall_elevation.csv")


@pytest.mark.skipif(not os.path.isdir(REF_CASE), reason="reference absent")
def test_vtp_reader_matches_reference_summary():
    from harmonic_compare import read_vtp_points

    pts = read_vtp_points(os.path.join(
        REF_CASE, "postProcessing", "interface", "interface_t16.000000.vtp"))
    with open(os.path.join(REF_CASE, "postProcessing", "interface",
                           "interface_summary.csv")) as f:
        row = next(r for r in csv.DictReader(f) if float(r["time"]) == 16.0)
    assert len(pts) == int(row["num_points"])
    np.testing.assert_allclose(pts[:, 2].max(), float(row["max_z"]), rtol=1e-6)
    np.testing.assert_allclose(pts[:, 2].min(), float(row["min_z"]), rtol=1e-6)
    np.testing.assert_allclose(pts[:, 2].mean(), float(row["mean_z"]),
                               rtol=1e-5)


@pytest.mark.skipif(not os.path.exists(SIM_CSV), reason="artifact absent")
def test_flagship_fundamental_matches_linear_theory():
    from harmonic_compare import fit_rotating_harmonics, wall_trace_from_csv

    from openfoam_tpp_tpu.utils.potential_flow import wall_amplitude

    t, th, z = wall_trace_from_csv(SIM_CSV)
    omega = 2 * np.pi * 1.88
    w = t >= 10.0
    fit = fit_rotating_harmonics(t[w], th[w], z[w], omega)
    a_pt = float(wall_amplitude(R=0.1, a=0.004, omega=omega, d=0.104)[0])
    assert abs(fit[1][0] - a_pt) / a_pt < 0.03
    assert abs(np.degrees(fit[1][1])) < 10.0
    # 2nd harmonic present (weakly nonlinear sharpened crests) but small.
    assert 0.001 < fit[2][0] < 0.5 * fit[1][0]
