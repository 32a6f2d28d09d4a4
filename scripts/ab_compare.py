"""Compare two bench.py JSON results with noise-band awareness.

Past TPU A/Bs showed ±5% run-to-run wobble on the steady window
(docs/ROADMAP.md §3b: 152.3 vs 160.4M same-config) — the margins being
chased are often the same size as the noise. bench.py now times ≥3
consecutive steady windows and reports mean±σ; this script consumes two
such JSON lines (files or literal strings) and declares the delta
SIGNIFICANT only when |Δmean| > 2·σ_combined, else INSIDE NOISE BAND.

Usage:
    python scripts/ab_compare.py control.json treatment.json
    python scripts/ab_compare.py '<json line>' '<json line>'

Exit code 0 = significant, 3 = inside noise band (so A/B driver scripts
can refuse to promote a knob on a noise-level "win").
"""

from __future__ import annotations

import json
import math
import os
import sys


def _load(arg: str) -> dict:
    if os.path.exists(arg):
        with open(arg) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    return json.loads(line)
        raise ValueError(f"no JSON line found in {arg}")
    return json.loads(arg)


def compare(a: dict, b: dict) -> dict:
    va, vb = a["value"], b["value"]
    sa = a.get("value_std", 0.0) or 0.0
    sb = b.get("value_std", 0.0) or 0.0
    # Std of the difference of two independent means.
    sigma = math.sqrt(sa * sa + sb * sb)
    delta = vb - va
    rel = delta / va if va else float("inf")
    significant = sigma > 0 and abs(delta) > 2.0 * sigma
    return {
        "control": va,
        "treatment": vb,
        "delta": round(delta, 6),
        "delta_pct": round(100.0 * rel, 2),
        "sigma_combined": round(sigma, 6),
        "z": round(delta / sigma, 2) if sigma > 0 else None,
        "significant": bool(significant),
        "verdict": ("SIGNIFICANT" if significant else
                    "INSIDE NOISE BAND (|delta| <= 2*sigma)" if sigma > 0
                    else "NO STD AVAILABLE (run bench with BENCH_WINDOWS>=3)"),
    }


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    out = compare(_load(sys.argv[1]), _load(sys.argv[2]))
    print(json.dumps(out, indent=2))
    return 0 if out["significant"] else 3


if __name__ == "__main__":
    sys.exit(main())
