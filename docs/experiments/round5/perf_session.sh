#!/bin/bash
# Round-5 perf session (VERDICT r4 item 1): bs32 structural attack.
#
# Phase P: op-level decomposition at bs32 (and bs16 for the superlinear
#   "rest" diff — rest grew 58.4 -> 148.6 ms from bs16 to bs32, 2.54x for
#   2x work) via the round-3 xplane parser.
# Phase C: candidate whole-step A/Bs at bs32 (each one bench.py run,
#   flagship row only):
#   c1  DPCR_STEM=conv2d     dense z-fold conv2d stem fwd/bwd (new)
#   c2  DPCR_SCATTER=sorted  retry at bs32 — the round-3 bs32 "sorted"
#                            reading (65.09) was confounded by the
#                            pool-bwd slots8 collapse, since fixed (cube)
#   c3  DPCR_SCATTER=flags   unique-only variant
#
# Run ON THE REAL TPU:  bash docs/experiments/round5/perf_session.sh [subset...]
set -u -o pipefail
cd "$(dirname "$0")/../../.."
OUT=docs/experiments/round5
LOG=$OUT/perf_session.log
note() { echo "== $* $(date -u +%H:%M:%S) ==" | tee -a "$LOG"; }

run_bench() {  # run_bench <tag> [ENV=V ...]
  local tag=$1; shift
  if grep -q '"metric"' "$OUT/r5_$tag.json" 2>/dev/null
  then note "$tag already measured, skip"; return 0; fi
  note "$tag env: $*"
  env DPCR_BENCH_BS=32 DPCR_BENCH_EXTRA=0 "$@" \
    timeout 2400 python bench.py 2>> "$LOG" \
    | tee -a "$LOG" | tee "$OUT/r5_$tag.json"
  note "$tag rc=$?"
}

SUBSET=${*:-c0 p32 c1 c2 c7 c3 p16 c4 c5 c6}
for t in $SUBSET; do
  case $t in
    p32) if [ ! -f "$OUT/profile_bs32.txt" ]; then
           note "profile bs32"
           DPCR_BENCH_BS=32 timeout 2400 \
             python docs/experiments/round3/exp_profile_step.py \
             > "$OUT/profile_bs32.txt" 2>> "$LOG"
           note "profile bs32 rc=$?"; tail -30 "$OUT/profile_bs32.txt"
         fi ;;
    p16) if [ ! -f "$OUT/profile_bs16.txt" ]; then
           note "profile bs16"
           DPCR_BENCH_BS=16 timeout 2400 \
             python docs/experiments/round3/exp_profile_step.py \
             > "$OUT/profile_bs16.txt" 2>> "$LOG"
           note "profile bs16 rc=$?"
         fi ;;
    c0) run_bench c0 ;;   # re-baseline: default path incl. scatter split
    c1) run_bench c1 DPCR_STEM=conv2d ;;
    c2) run_bench c2 DPCR_SCATTER=sorted ;;
    c3) run_bench c3 DPCR_SCATTER=flags ;;
    c4) run_bench c4 DPCR_FOLD_CHUNKS=1 ;;   # unchunked fold (smaller g)
    c5) run_bench c5 DPCR_FOLD_CHUNKS=4 ;;
    c6) run_bench c6 DPCR_POOL_BWD_BYTES=99000000000 ;;  # unchunked cube
    c7) run_bench c7 DPCR_STEM=conv2d DPCR_SCATTER=sorted ;;
    c8) run_bench c8 DPCR_FOLD_UNROLL=1 ;;   # inline chunk loops
    c9) run_bench c9 DPCR_FOLD_UNROLL=1 DPCR_POOL_BWD_BYTES=99000000000 ;;
  esac
done
note "session phase done"
