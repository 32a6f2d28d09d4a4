#!/bin/bash
# Round-3 TPU measurement queue — run ONCE when the axon tunnel is back.
# Serializes every TPU job (1-core host, remote compiler): baseline bench
# refresh, resident-FCT A/B, preconditioner-refresh K sweep, and the
# combined-best configuration. Writes one log per arm under /tmp/r3q.
set -u
cd "$(dirname "$0")/.." || exit 1
OUT=/tmp/r3q
mkdir -p "$OUT"

run() {
    name=$1; shift
    echo "=== $name: $* ==="
    ( "$@" ) > "$OUT/$name.log" 2>&1
    grep -h '"metric"' "$OUT/$name.log" | tail -1
}

# 1. Baseline (r3 defaults) — confirms the 152.3M reference point.
run baseline python -u bench.py

# 2. Resident FCT limiter kernel (slab width A/B).
run fct_resident env OFTPP_FCT_RESIDENT=1 python -u bench.py
run fct_resident4 env OFTPP_FCT_RESIDENT=1 OFTPP_FCT_RSLAB=4 python -u bench.py

# 3. Preconditioner refresh interval sweep (K=1 is in baseline).
for K in 4 8 16; do
    run "precond_K$K" env OFTPP_PRECOND_REFRESH=$K python -u bench.py
done

# 4. b-normalized stopping criterion (3e-4 is now the default, measured
#    in the baseline arm; legacy and the aggressive setting bracket it —
#    accuracy gate = scripts/tol_criterion_study.py on CPU).
for RB in 0 1e-3; do
    run "tolb_$RB" env OFTPP_P_TOL_REL_B=$RB python -u bench.py
done

# 4b. rz dot fused into the V-cycle exit smoother.
run fused_rz env OFTPP_FUSED_RZ=1 python -u bench.py

# 4c. Fused momentum RHS kernel (visc + dev2 − conv in one pass;
#     single-case only — do NOT combine with BENCH_SWEEP).
run mom_pallas env OFTPP_MOM_PALLAS=1 python -u bench.py

# 4d. W-cycle preconditioner (coarse-level gamma=2): the flagship needs
#     p_iters ~12 vs ~6 on 32^3 — multilevel PWC-transfer degradation.
#     gamma=2 doubles only the cheap coarse work; read the p_iters_hist
#     AND the wall number (CPU replay of this arm was impractically slow
#     to compile, scripts/cg_tuning.py).
run mg_gamma2 env OFTPP_MG_GAMMA=2 python -u bench.py

# 5. Combined best guesses (trim after reading 1-4).
run combined env OFTPP_FCT_RESIDENT=1 OFTPP_PRECOND_REFRESH=8 \
    python -u bench.py
run combined_all env OFTPP_FCT_RESIDENT=1 OFTPP_PRECOND_REFRESH=8 \
    OFTPP_MOM_PALLAS=1 python -u bench.py

# 5b. Cap artifact: minutes on TPU (90k cells, 3 s sim); the resumable
#     run picks up the checkpoints the aborted CPU attempt left behind.
run cap_artifact python -u scripts/make_cap_artifact.py

# 6. Sweep throughput: vmapped batch baseline vs kernels-under-vmap.
run sweep_base env BENCH_SWEEP=1 python -u bench.py
run sweep_pallas env BENCH_SWEEP=1 OFTPP_SWEEP_PALLAS=1 python -u bench.py

echo "--- summary ---"
for f in "$OUT"/*.log; do
    echo "$(basename "$f" .log): $(grep -h '"metric"' "$f" | tail -1)"
done
