#!/bin/bash
# Round-3 sweep 3 (serialized TPU batch):
#   P1  unique-only scatter flags probe (sorted-free precondition)
#   P2  whole-step knockout marginals: stem knocked out / pool knocked out
#       (in-step marginal = 222.7ms-equivalent bench(real) - bench(KO))
#   P3  VERDICT item 2: e2e trainer vs device-step gap decomposition
#   P4  VERDICT item 3: KPConv p90/p80/p70 device throughput
set -u
cd "$(dirname "$0")/../../.."
LOG=docs/experiments/round3/sweep3.log
: > "$LOG"
note() { echo "== $* ==" | tee -a "$LOG"; }

note "P1 scatter unique-only  $(date -u +%H:%M:%S)"
for case in add4_uniq set64_uniq; do
  DPCR_SCATTER_ONLY=$case timeout 1800 \
    python docs/experiments/round3/exp_scatter_flags.py >> "$LOG" 2>&1
  note "rc=$?"
done

note "P2 bench stem knockout  $(date -u +%H:%M:%S)"
DPCR_STEM=knockout timeout 2400 python bench.py >> "$LOG" 2>&1
note "rc=$?"
note "P2 bench pool knockout  $(date -u +%H:%M:%S)"
DPCR_POOL_FWD=knockout timeout 2400 python bench.py >> "$LOG" 2>&1
note "rc=$?"
note "P2 bench both knockouts  $(date -u +%H:%M:%S)"
DPCR_STEM=knockout DPCR_POOL_FWD=knockout timeout 2400 python bench.py >> "$LOG" 2>&1
note "rc=$?"

note "P3 e2e gap  $(date -u +%H:%M:%S)"
timeout 3600 python docs/experiments/round3/exp_e2e_gap.py >> "$LOG" 2>&1
note "rc=$?"

note "P4 kpconv p80  $(date -u +%H:%M:%S)"
timeout 5400 python docs/experiments/round3/exp_kpconv_p80.py >> "$LOG" 2>&1
note "rc=$?"
note "sweep3 done  $(date -u +%H:%M:%S)"
