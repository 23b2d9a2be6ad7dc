#!/bin/bash
# Round-3 sweep 4 (serialized TPU batch):
#   P1  add64_uniq probe (the missing datapoint: scatter_add 64ch,
#       unique_indices only — set64 needs sortedness, add4 doesn't)
#   P2  whole-step DPCR_SCATTER=flags A/B at bs16 + bs32 (paired with
#       same-session baselines)
#   P3  KPConv p90/p80/p70 (finish the p70 timing sweep3 died on)
#   P4  clean SOLO e2e-gap re-run (sweep3's P3 was contention-polluted)
set -u
cd "$(dirname "$0")/../../.."
LOG=docs/experiments/round3/sweep4.log
: > "$LOG"
note() { echo "== $* ==" | tee -a "$LOG"; }

note "P1 add64_uniq  $(date -u +%H:%M:%S)"
DPCR_SCATTER_ONLY=add64_uniq timeout 1800 \
  python docs/experiments/round3/exp_scatter_flags.py >> "$LOG" 2>&1
note "rc=$?"

note "P2 bench bs16 baseline  $(date -u +%H:%M:%S)"
timeout 2400 python bench.py >> "$LOG" 2>&1
note "rc=$?"
note "P2 bench bs16 flags  $(date -u +%H:%M:%S)"
DPCR_SCATTER=flags timeout 2400 python bench.py >> "$LOG" 2>&1
note "rc=$?"
note "P2 bench bs32 baseline (FOLD_CHUNKS=2)  $(date -u +%H:%M:%S)"
DPCR_BENCH_BS=32 DPCR_FOLD_CHUNKS=2 timeout 2400 python bench.py >> "$LOG" 2>&1
note "rc=$?"
note "P2 bench bs32 flags (FOLD_CHUNKS=2)  $(date -u +%H:%M:%S)"
DPCR_BENCH_BS=32 DPCR_FOLD_CHUNKS=2 DPCR_SCATTER=flags \
  timeout 2400 python bench.py >> "$LOG" 2>&1
note "rc=$?"

note "P3 kpconv p90/p80/p70  $(date -u +%H:%M:%S)"
timeout 5400 python docs/experiments/round3/exp_kpconv_p80.py >> "$LOG" 2>&1
note "rc=$?"

note "P4 e2e gap (solo)  $(date -u +%H:%M:%S)"
timeout 3600 python docs/experiments/round3/exp_e2e_gap.py >> "$LOG" 2>&1
note "rc=$?"
note "sweep4 done  $(date -u +%H:%M:%S)"
