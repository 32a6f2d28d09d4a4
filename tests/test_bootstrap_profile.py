"""Dependency bootstrap (main.py:9-95 parity) + profiling subsystem."""

import os

from openfoam_tpp_tpu.utils import bootstrap


def test_check_dependencies_clean_env():
    # This test environment has the full runtime baked in.
    assert bootstrap.check_dependencies(include_optional=False) == []


def test_version_tuple():
    assert bootstrap._version_tuple("1.24.3") == (1, 24, 3)
    assert bootstrap._version_tuple("0.4.30.dev2") >= (0, 4)
    assert bootstrap._version_tuple("3") == (3,)


def test_ensure_dependencies_ok_without_provisioning(monkeypatch):
    calls = []
    monkeypatch.setattr(bootstrap, "_provision_and_reexec",
                        lambda base: calls.append(base) or True)
    assert bootstrap.ensure_dependencies(auto=True)
    assert not calls  # healthy runtime never provisions


def test_ensure_dependencies_reports_and_blocks(monkeypatch, capsys):
    monkeypatch.setattr(
        bootstrap, "check_dependencies",
        lambda include_optional=True: ["required dependency 'jax' is missing "
                                       "(need >= 0.4)"])
    assert not bootstrap.ensure_dependencies(auto=False)
    err = capsys.readouterr().err
    assert "jax" in err and "OFTPP_BOOTSTRAP" in err


def test_ensure_dependencies_provisions_when_auto(monkeypatch):
    monkeypatch.setattr(
        bootstrap, "check_dependencies",
        lambda include_optional=True: ["required dependency 'jax' is missing"])
    monkeypatch.delenv(bootstrap._REEXEC_GUARD, raising=False)
    calls = []
    monkeypatch.setattr(bootstrap, "_provision_and_reexec",
                        lambda base: calls.append(base) or True)
    assert bootstrap.ensure_dependencies(auto=True, base_dir="/x")
    assert calls == ["/x"]


def test_reexec_guard_prevents_loop(monkeypatch):
    """A re-exec'd process that STILL can't import deps must not recurse
    (the reference's venv-mismatch guard, main.py:36-43)."""
    monkeypatch.setattr(
        bootstrap, "check_dependencies",
        lambda include_optional=True: ["required dependency 'jax' is missing"])
    monkeypatch.setenv(bootstrap._REEXEC_GUARD, "1")
    monkeypatch.setattr(bootstrap, "_provision_and_reexec",
                        lambda base: (_ for _ in ()).throw(
                            AssertionError("must not re-provision")))
    assert not bootstrap.ensure_dependencies(auto=True)


def test_profile_case_smoke(tmp_path):
    """profile_case runs N steps under jax.profiler and writes the trace +
    summary (works on CPU; on TPU the same path captures HLO timings)."""
    from openfoam_tpp_tpu.manager.cases import setup_case
    from openfoam_tpp_tpu.utils.profiling import profile_case

    row = {"H": 0.04, "D": 0.016, "mesh": 0.004, "geo": "flat",
           "R": 0.002, "freq": 2.5, "duration": 0.2, "dt": 1e-3,
           "ramp": 0.02}
    case_dir = setup_case(row, str(tmp_path))
    stats = profile_case(case_dir, n_steps=3, log=lambda *a: None)
    assert stats["n_steps"] == 3
    assert stats["cell_updates_per_sec"] > 0
    assert os.path.isfile(os.path.join(stats["trace_dir"], "summary.txt"))
    # The jax.profiler trace directory must contain a capture.
    assert any(os.scandir(stats["trace_dir"]))
