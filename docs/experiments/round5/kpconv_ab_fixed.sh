#!/bin/bash
# Re-run of the descent-disposition KPConv arms AFTER the round-5
# potential_descent sign fix (ops/kernel_points.py: the round-1-4 code
# ATTRACTED points — 6-point clump + hemisphere shell — and measured
# test R2 0.315/0.311 vs Lloyd's 0.625/0.680 at matched crop/limits).
# Arms, priority order (1 seed each on the 1-core host):
#   p90f_s0    fixed-descent @ p90  -> disposition gate vs p90_lloyd_s0
#                                      and crop-gate anchor
#   p100a8f_s0 fixed-descent uncropped @ bs8 x 2-accum (bs16 OOMs)
#   p80f_s0    fixed-descent @ p80  -> crop-gate lower arm
#
# Run ON THE REAL TPU:  bash docs/experiments/round5/kpconv_ab_fixed.sh
set -u -o pipefail
cd "$(dirname "$0")/../../.."
OUT=outputs/runs_r4/kpconv_ab
LOG=docs/experiments/round5/kpconv_ab_fixed.log
mkdir -p $OUT
note() { echo "== $* ==" | tee -a "$LOG"; }

COMMON="task=instance data=instance/synthetic/reg data.synthetic_plots=600
 data.synthetic_spatial=True data.dataroot=$OUT/synth600sp
 training=nfi/kpconv training.num_workers=4
 lr_scheduler=cosineawr update_lr_scheduler_on=on_num_batch
 models=instance/kpconv model_name=KPConv data.transform_type=xy
 training.epochs=18 eval_frequency=3"

run_one() {  # run_one <tag> <pct> <seed> [extra overrides...]
  local tag=$1 pct=$2 seed=$3; shift 3
  if [ -f "$OUT/$tag/metrics.jsonl" ] && \
     grep -q '"stage": "val"' "$OUT/$tag/metrics.jsonl" 2>/dev/null; then
    note "$tag already has val rows, skip"; return 0
  fi
  note "$tag (pct=$pct disp=descent-FIXED seed=$seed) $(date -u +%H:%M:%S)"
  DPCR_KP_CALIB_PCT=$pct DPCR_KP_DISPOSITION=descent timeout 4800 \
    python train.py $COMMON training.batch_size=16 "$@" \
    seed=$seed run_dir=$OUT/$tag > $OUT/$tag.log 2>&1
  note "$tag rc=$?"
}

run_one p90f_s0 90 0
run_one p100a8f_s0 100 0 training.batch_size=8 \
  training.optim.accumulated_gradient=2
run_one p80f_s0 80 0
note "fixed-descent pass done $(date -u +%H:%M:%S)"
