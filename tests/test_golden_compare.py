"""scripts/golden_compare.py: windowed RMS alignment math."""

import csv
import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "golden_compare",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "golden_compare.py"))
gc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(gc)


def _write(path, rows):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["time", "max_z", "min_z", "mean_z", "num_points"])
        for r in rows:
            w.writerow(list(r) + [100])


def test_f32_snapped_times_align(tmp_path):
    ours = tmp_path / "ours.csv"
    ref = tmp_path / "ref.csv"
    # f32-snapped landing times (14.349999) must align with exact 14.35.
    _write(ours, [(0.0, 0.11, 0.10, 0.104),
                  (0.050000001, 0.12, 0.09, 0.104),
                  (14.349999, 0.13, 0.08, 0.105)])
    _write(ref, [(0.0, 0.11, 0.10, 0.104),
                 (0.05, 0.12, 0.09, 0.104),
                 (14.35, 0.13, 0.08, 0.105)])
    a, b = gc.read_summary(str(ours)), gc.read_summary(str(ref))
    assert set(a) == set(b) == {0, 1, 287}


def test_windowed_rms_values(tmp_path):
    n = 101
    ours = [(0.05 * k, 0.11, 0.10, 0.104) for k in range(n)]
    ref = [(0.05 * k, 0.11 + 0.0104, 0.10, 0.104) for k in range(n)]
    f_o, f_r = tmp_path / "o.csv", tmp_path / "r.csv"
    _write(f_o, ours)
    _write(f_r, ref)
    out = gc.windowed_rms(gc.read_summary(str(f_o)),
                          gc.read_summary(str(f_r)), depth=0.104)
    # Constant 0.0104 offset on max_z = 10% of depth in every window.
    for w, v in out["rms_pct_of_depth"]["max_z"].items():
        assert abs(v - 10.0) < 1e-6, (w, v)
    for w, v in out["rms_pct_of_depth"]["mean_z"].items():
        assert v == 0.0
    assert out["n_rows"] == n
