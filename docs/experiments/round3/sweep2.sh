#!/bin/bash
# Round-3 sweep 2: L0 candidates on the real TPU.
#   P1  micro: stem chains under DPCR_STEM=xminor (2-wide-row gather +
#       shift-lane matmul) vs the recorded grouped numbers (l0_micro.log:
#       stem_fwd 80.8, stem_dw 82.6)
#   P2  bench: pool forward flavors under the fused row-space VJP
#       (separable / scattermax) vs the recorded fused default 71.84
#   P3  bench: DPCR_STEM=xminor, then xminor + best pool fwd from P2
# Each step is an independent process; failures are loud (set +e per step
# but rc recorded) — sweep2's silent-empty-section failure mode (VERDICT
# r2 weak #4) is designed out by echoing rc after every step.
set -u
cd "$(dirname "$0")/../../.."
LOG=docs/experiments/round3/sweep2.log
: > "$LOG"
note() { echo "== $* ==" | tee -a "$LOG"; }

note "P1 micro stem xminor  $(date -u +%H:%M:%S)"
DPCR_STEM=xminor DPCR_L0_MICRO_ONLY=stem_fwd timeout 1800 \
  python docs/experiments/round2/exp_l0_micro2.py >> "$LOG" 2>&1
note "rc=$?"
DPCR_STEM=xminor DPCR_L0_MICRO_ONLY=stem_dw timeout 1800 \
  python docs/experiments/round2/exp_l0_micro2.py >> "$LOG" 2>&1
note "rc=$?"

note "P2 bench pool fwd separable  $(date -u +%H:%M:%S)"
DPCR_POOL_FWD=separable timeout 2400 python bench.py >> "$LOG" 2>&1
note "rc=$?"
note "P2 bench pool fwd scattermax  $(date -u +%H:%M:%S)"
DPCR_POOL_FWD=scattermax timeout 2400 python bench.py >> "$LOG" 2>&1
note "rc=$?"

note "P3 bench stem xminor  $(date -u +%H:%M:%S)"
DPCR_STEM=xminor timeout 2400 python bench.py >> "$LOG" 2>&1
note "rc=$?"

# P3b: xminor + each pool fwd that beat (or tied) dense in P2 — combined
for fwd in separable scattermax; do
  if grep -A2 "pool fwd $fwd" "$LOG" | grep -q '"value"'; then
    v=$(grep -A2 "pool fwd $fwd" "$LOG" | grep -o '"value": [0-9.]*' | head -1 | cut -d' ' -f2)
    win=$(python -c "print(1 if float('$v') > 71.0 else 0)")
    if [ "$win" = "1" ]; then
      note "P3b bench xminor + $fwd  $(date -u +%H:%M:%S)"
      DPCR_STEM=xminor DPCR_POOL_FWD=$fwd timeout 2400 python bench.py >> "$LOG" 2>&1
      note "rc=$?"
    fi
  fi
done
note "sweep2 done  $(date -u +%H:%M:%S)"
