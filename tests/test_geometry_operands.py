"""Geometry-as-operands runner path (VERDICT r3 item 8).

One jitted advance serves two cases with DIFFERENT tank geometries of
the same (shape, spacing): the geometry arrays cross the jit boundary as
operands instead of being baked into the executable as HLO constants, so
the advance cache (and the persistent compile cache) unify across
(H, D, geo) sweeps. Physics must still differ between the cases (the
operands are live) and the run must produce valid checkpoints.
"""

import numpy as np
import pytest

from openfoam_tpp_tpu.config import PhysicalProperties, SolverControls
from openfoam_tpp_tpu.manager import runner
from openfoam_tpp_tpu.manager.cases import setup_case
from openfoam_tpp_tpu.manager.runner import get_compiled_advance, run_case
from openfoam_tpp_tpu.utils.io import list_checkpoints, load_checkpoint

PROPS = PhysicalProperties()
CONTROLS = SolverControls(p_max_iters=12)


def _params(D):
    return {"H": 0.04, "D": D, "mesh": 0.004, "geo": "flat",
            "R": 0.002, "freq": 3.0, "duration": 0.1, "dt": 5e-4,
            "ramp": -1.0, "n_cpus": 1}


def test_same_shape_cases_share_one_executable():
    runner._ADVANCE_CACHE.clear()
    g1, adv1, *_ = get_compiled_advance(_params(0.020), PROPS, CONTROLS)
    n_after_first = len(runner._ADVANCE_CACHE)
    g2, adv2, *_ = get_compiled_advance(_params(0.019), PROPS, CONTROLS)
    # Different tanks (cut-cell apertures differ) ...
    assert g1.D != g2.D
    assert not np.array_equal(np.asarray(g1.vfrac), np.asarray(g2.vfrac))
    # ... same grid class -> the jitted advance was REUSED, not rebuilt.
    assert tuple(g1.shape) == tuple(g2.shape)
    assert g1.spacing == g2.spacing
    assert len(runner._ADVANCE_CACHE) == n_after_first == 1


def test_operand_geometry_runs_distinct_physics(tmp_path):
    """The shared executable still sees each case's own geometry: a
    narrower tank sloshes differently under identical forcing."""
    runner._ADVANCE_CACHE.clear()
    stats, alphas = {}, {}
    for D in (0.020, 0.016):
        case = setup_case(_params(D), str(tmp_path))
        stats[D] = run_case(case, controls=CONTROLS, log=lambda *a: None)
        t, path = list_checkpoints(case)[-1]
        assert abs(t - 0.1) < 1e-6
        alphas[D] = load_checkpoint(path)["alpha"]
    assert len(runner._ADVANCE_CACHE) == 1  # one executable, two cases
    a, b = alphas[0.020], alphas[0.016]
    assert a.shape == b.shape
    assert not np.allclose(a, b)
    # Mass sane for both: half-filled columns inside each cylinder.
    for D in alphas:
        assert stats[D]["steps"] > 0
        assert np.isfinite(alphas[D]).all()
        assert alphas[D].min() >= -1e-5 and alphas[D].max() <= 1 + 1e-5


@pytest.mark.parametrize("geo", ["flat"])
def test_resume_across_geometry_variants(tmp_path, geo):
    """Resume works on the operand path (checkpoint shape-hint respected)."""
    runner._ADVANCE_CACHE.clear()
    p = _params(0.020)
    p["duration"] = 0.1
    case = setup_case(p, str(tmp_path))
    run_case(case, controls=CONTROLS, log=lambda *a: None)
    n1 = len(list_checkpoints(case))
    # Re-run: already done -> resumes, no new steps.
    s = run_case(case, controls=CONTROLS, log=lambda *a: None)
    assert s["steps"] == 0
    assert len(list_checkpoints(case)) == n1
