#!/usr/bin/env python
"""Windowed golden-file comparison vs the reference OpenFOAM run.

Aligns this solver's postProcessing/interface/interface_summary.csv with
the reference's (both on the exact 0.05 s adjustableRunTime write grid —
row-for-row) and reports RMS of the per-timestep differences in mean_z /
max_z / min_z as a percentage of the fill depth, over the standard
windows (t < 3 s, t < 5 s, full, t > 15 s), plus the zero-lag beat
correlation of max_z. This reproduces the table in VALIDATION.md.

Usage:
  python scripts/golden_compare.py --case cases/case_H0.208_... \
      --reference /root/reference/case_H0.208_.../postProcessing/interface/interface_summary.csv

Reference schema: time,max_z,min_z,mean_z,num_points
(/root/reference/main.py:751,780).
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys


def read_summary(path, grid=0.05):
    """Rows keyed by write-grid index (f32-snapped landing times like
    14.349999 and exact 14.35 must align to the same row)."""
    rows = {}
    with open(path) as f:
        for row in csv.DictReader(f):
            rows[round(float(row["time"]) / grid)] = (
                float(row["max_z"]), float(row["min_z"]),
                float(row["mean_z"]))
    return rows


def windowed_rms(ours, ref, depth):
    import numpy as np

    keys = sorted(set(ours) & set(ref))
    if len(keys) < 10:
        raise SystemExit(
            f"only {len(keys)} aligned rows — are both runs on the "
            "0.05 s write grid?")
    times = keys
    t = np.asarray(keys) * 0.05
    o = np.asarray([ours[k] for k in times])       # (n, 3) max,min,mean
    r = np.asarray([ref[k] for k in times])

    windows = {
        "t<3s": t < 3.0,
        "t<5s": t < 5.0,
        "full": np.ones_like(t, bool),
        "t>15s": t > 15.0,
    }
    fields = {"max_z": 0, "min_z": 1, "mean_z": 2}
    table = {}
    for fname, col in fields.items():
        table[fname] = {
            wname: float(np.sqrt(np.mean((o[m, col] - r[m, col]) ** 2))
                         / depth * 100.0)
            for wname, m in windows.items() if m.any()
        }

    # Beat-structure agreement: zero-lag correlation of demeaned max_z
    # over t < 5 s (the pre-resonant growth both codes should track).
    m = windows["t<5s"]
    a = o[m, 0] - o[m, 0].mean()
    b = r[m, 0] - r[m, 0].mean()
    denom = (a.std() * b.std()) or 1e-30
    corr = float((a * b).mean() / denom)
    return {"n_rows": len(times), "t_max": float(t.max()),
            "rms_pct_of_depth": table, "maxz_corr_t<5s": corr}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", required=True,
                    help="case dir (ours) or a direct CSV path")
    ap.add_argument("--reference", required=True,
                    help="reference interface_summary.csv")
    ap.add_argument("--depth", type=float, default=None,
                    help="fill depth [m] (default: H/2 from the case name)")
    args = ap.parse_args(argv)

    ours_csv = args.case
    if os.path.isdir(ours_csv):
        ours_csv = os.path.join(ours_csv, "postProcessing", "interface",
                                "interface_summary.csv")
    depth = args.depth
    if depth is None:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), ".."))
        from openfoam_tpp_tpu.utils.naming import parse_case_params

        name = os.path.basename(os.path.normpath(args.case))
        depth = parse_case_params(name)["H"] / 2.0
    out = windowed_rms(read_summary(ours_csv), read_summary(args.reference),
                       depth)
    out["depth_m"] = depth
    json.dump(out, sys.stdout, indent=2)
    print()
    return 0


if __name__ == "__main__":
    sys.exit(main())
