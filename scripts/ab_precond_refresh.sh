#!/bin/sh
# A/B the amortized preconditioner refresh on the TPU steady flagship:
# K=1 (fresh hierarchy every step, the old behavior) vs K=4 / K=8.
# Watch cell_updates_per_sec and the p_iters histogram — K>1 trades a
# few CG iterations for skipping the bf16 hierarchy build.
cd "$(dirname "$0")/.." || exit 1
for K in 1 4 8 16; do
    echo "=== OFTPP_PRECOND_REFRESH=$K ==="
    OFTPP_PRECOND_REFRESH=$K python -u bench.py 2>&1 | grep -v WARNING
done
