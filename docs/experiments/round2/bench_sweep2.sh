#!/bin/bash
# Round-2 second sweep, PRIORITY-ORDERED: every fresh-process full-model
# compile through the axon tunnel costs ~25-35 min (memory: the persistent
# cache does not capture axon executables), so the decision-relevant
# configs run first and the long tail can be cut when the window closes.
# Run ON THE REAL TPU from the repo root.
set -u
cd "$(dirname "$0")/../../.."
LOG=docs/experiments/round2/sweep2.log
: > "$LOG"

run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 3000 env "$@" python bench.py 2>&1 | tail -1 | tee -a "$LOG"
}

# P1: scatter-max pool — decides the new DPCR_SPARSE_POOL default
run DPCR_SPARSE_POOL=scattermax
# P2: baseline re-confirm (sparse L0 g=7, dense pool; expect ~69)
run DPCR_DUMMY=1
# P3: step breakdown (trimmed inside the script via DPCR_BREAKDOWN_FAST)
echo "=== step breakdown ===" | tee -a "$LOG"
timeout 5400 env DPCR_BREAKDOWN_FAST=1 \
  python docs/experiments/round2/exp_step_breakdown.py 2>&1 | tee -a "$LOG"
# P4: calibrated KPConv (3 configs)
echo "=== kpconv calibrated ===" | tee -a "$LOG"
timeout 5400 python docs/experiments/round2/exp_kpcnn_calibrated.py 2>&1 | tee -a "$LOG"
# P5: bs32 options (paper batch size)
run DPCR_BENCH_BS=32 DPCR_SPARSE_POOL=scattermax
run DPCR_BENCH_BS=32 DPCR_FOLD_CHUNKS=2
# P6: non-divisor group sizes now correct (g=6/5)
run DPCR_BENCH_BS=20
run DPCR_BENCH_BS=24
