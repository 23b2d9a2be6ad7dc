#!/bin/bash
# Round-3 sweep 5 (serialized TPU batch):
#   P1  cube pool-VJP A/B: DPCR_POOL_BWD_GATHER=cube vs slots8 (one
#       overlap-folded wide-row gather vs 8 narrow rows per site)
#   P2  whole-step HLO op profile (decompose the 58.4 ms residual)
set -u
cd "$(dirname "$0")/../../.."
LOG=docs/experiments/round3/sweep5.log
: > "$LOG"
note() { echo "== $* ==" | tee -a "$LOG"; }

note "P1 bench bs16 cube  $(date -u +%H:%M:%S)"
DPCR_POOL_BWD_GATHER=cube timeout 2400 python bench.py >> "$LOG" 2>&1
note "rc=$?"
note "P1 bench bs32 cube (FOLD_CHUNKS=2)  $(date -u +%H:%M:%S)"
DPCR_BENCH_BS=32 DPCR_FOLD_CHUNKS=2 DPCR_POOL_BWD_GATHER=cube \
  timeout 2400 python bench.py >> "$LOG" 2>&1
note "rc=$?"

note "P2 step profile  $(date -u +%H:%M:%S)"
timeout 3600 python docs/experiments/round3/exp_profile_step.py \
  >> "$LOG" 2>&1
note "rc=$?"
note "sweep5 done  $(date -u +%H:%M:%S)"
