#!/bin/bash
# Round-4 structural-perf battery at bs32 (VERDICT r3 item 3: "bench >= 120
# plots/s bs32 ... or a measured refutation with post-mortem").
#
# Measures, at the paper batch size (bs32, 16000-voxel cap), with the
# round-4 HBM-derived transient budgets active:
#   b0  baseline step
#   b1  DPCR_POOL_FWD=scattermax     (TODO r3 item 2: the queued re-try —
#                                     no full-res 65ch volume at bs32)
#   b2  DPCR_STEM=knockout           (stem marginal at bs32)
#   b3  DPCR_POOL_FWD=knockout       (pool marginal at bs32)
#   b4  both knockouts               (L0-free ceiling at bs32)
#   b5  DPCR_BENCH_FILL=1.0          (fill sensitivity: if b5 == b0 despite
#   b6  DPCR_BENCH_FILL=0.65          29%/54% more|fewer valid sites, the
#                                     row ops price the PADDED site count —
#                                     bounding what batch-flat site packing
#                                     could recover)
# Each run is one bench.py invocation (flagship row only, DPCR_BENCH_EXTRA=0).
#
# Run ON THE REAL TPU:  bash docs/experiments/round4/exp_structural.sh [subset...]
set -u -o pipefail
cd "$(dirname "$0")/../../.."
LOG=docs/experiments/round4/exp_structural.log
note() { echo "== $* $(date -u +%H:%M:%S) ==" | tee -a "$LOG"; }

run_one() {  # run_one <tag> [ENV=V ...]
  local tag=$1; shift
  if grep -q '"metric"' "docs/experiments/round4/struct_$tag.json" 2>/dev/null
  then note "$tag already measured, skip"; return 0; fi
  note "$tag env: $*"
  env DPCR_BENCH_BS=32 DPCR_BENCH_EXTRA=0 "$@" \
    timeout 2400 python bench.py 2>> "$LOG" \
    | tee -a "$LOG" | tee "docs/experiments/round4/struct_$tag.json"
  note "$tag rc=$?"
}

SUBSET=${*:-b0 b1 b5 b6 b2 b3 b4}
for t in $SUBSET; do
  case $t in
    b0) run_one b0 ;;
    b1) run_one b1 DPCR_POOL_FWD=scattermax ;;
    b2) run_one b2 DPCR_STEM=knockout ;;
    b3) run_one b3 DPCR_POOL_FWD=knockout ;;
    b4) run_one b4 DPCR_STEM=knockout DPCR_POOL_FWD=knockout ;;
    b5) run_one b5 DPCR_BENCH_FILL=1.0 ;;
    b6) run_one b6 DPCR_BENCH_FILL=0.65 ;;
  esac
done
note "battery done"
