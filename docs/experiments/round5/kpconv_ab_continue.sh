#!/bin/bash
# Round-5 continuation of the KPConv A/B on the 1-core host: the original
# run order (all seed-0/1 pairs in pct order) would not finish in the
# round's chip window at the measured ~45-55 min/run, so after p90_s0 +
# p80_s0 complete this script runs the remaining ARMS one seed each, in
# decision-priority order, then the second seeds only if invoked again
# with `s1`:
#   1. p90_lloyd_s0  (disposition A/B vs the done p90_s0)
#   2. p100a8_s0     (uncropped reference, bs8 x 2-accum — bs16 OOMs)
#   3. (s1 pass)     p90_lloyd_s1, p100a8_s1, p90_s1, p80_s1
# Completed runs are skipped (same checks as kpconv_ab.sh).
#
# Usage ON THE REAL TPU:  bash docs/experiments/round5/kpconv_ab_continue.sh [s1]
set -u -o pipefail
cd "$(dirname "$0")/../../.."
OUT=outputs/runs_r4/kpconv_ab
LOG=docs/experiments/round5/kpconv_ab_continue.log
mkdir -p $OUT
note() { echo "== $* ==" | tee -a "$LOG"; }

COMMON="task=instance data=instance/synthetic/reg data.synthetic_plots=600
 data.synthetic_spatial=True data.dataroot=$OUT/synth600sp
 training=nfi/kpconv training.num_workers=4
 lr_scheduler=cosineawr update_lr_scheduler_on=on_num_batch
 models=instance/kpconv model_name=KPConv data.transform_type=xy
 training.epochs=18 eval_frequency=3"

run_one() {  # run_one <tag> <pct> <disp> <seed> [extra overrides...]
  local tag=$1 pct=$2 disp=$3 seed=$4; shift 4
  if [ -f "$OUT/$tag/metrics.jsonl" ] && \
     grep -q '"stage": "val"' "$OUT/$tag/metrics.jsonl" 2>/dev/null; then
    note "$tag already has val rows, skip"; return 0
  fi
  note "$tag (pct=$pct disp=$disp seed=$seed) $(date -u +%H:%M:%S)"
  DPCR_KP_CALIB_PCT=$pct DPCR_KP_DISPOSITION=$disp timeout 4800 \
    python train.py $COMMON training.batch_size=16 "$@" \
    seed=$seed run_dir=$OUT/$tag > $OUT/$tag.log 2>&1
  note "$tag rc=$?"
}

if [ "${1:-}" = "s1" ]; then
  run_one p90_lloyd_s1 90 lloyd 1
  run_one p100a8_s1 100 descent 1 training.batch_size=8 \
    training.optim.accumulated_gradient=2
  run_one p90_s1 90 descent 1
  run_one p80_s1 80 descent 1
else
  run_one p90_lloyd_s0 90 lloyd 0
  run_one p100a8_s0 100 descent 0 training.batch_size=8 \
    training.optim.accumulated_gradient=2
fi
note "continue pass done $(date -u +%H:%M:%S)"
