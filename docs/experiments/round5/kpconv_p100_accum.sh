#!/bin/bash
# p100 (uncropped) KPConv arms for the crop gate, retried at batch 8 with
# 2-step gradient accumulation: the bs16 p100 run OOMs device HBM (auto
# limits [47,72,82,78,80] at 6144 pts — kpconv_ab.log, round 5). Same
# effective batch (16) and matched epochs; caveat recorded with the
# result: BN batch statistics see 8-plot batches here vs 16 in the
# p90/p80 arms (the reference's own accumulate path has the identical
# caveat, base_model.py:195-207).
#
# Run ON THE REAL TPU from the repo root after kpconv_ab.sh:
#   bash docs/experiments/round5/kpconv_p100_accum.sh
set -u -o pipefail
cd "$(dirname "$0")/../../.."
OUT=outputs/runs_r4/kpconv_ab
LOG=docs/experiments/round5/kpconv_p100_accum.log
mkdir -p $OUT
note() { echo "== $* ==" | tee -a "$LOG"; }

COMMON="task=instance data=instance/synthetic/reg data.synthetic_plots=600
 data.synthetic_spatial=True data.dataroot=$OUT/synth600sp
 training=nfi/kpconv training.batch_size=8
 training.optim.accumulated_gradient=2 training.num_workers=4
 lr_scheduler=cosineawr update_lr_scheduler_on=on_num_batch
 models=instance/kpconv model_name=KPConv data.transform_type=xy
 training.epochs=18 eval_frequency=3"

for seed in 0 1; do
  tag="p100a8_s${seed}"
  note "$tag $(date -u +%H:%M:%S)"
  if [ -f "$OUT/$tag/metrics.jsonl" ] && \
     grep -q '"stage": "val"' "$OUT/$tag/metrics.jsonl" 2>/dev/null; then
    note "$tag already complete, skip"
  else
    DPCR_KP_CALIB_PCT=100 DPCR_KP_DISPOSITION=descent timeout 4200 \
      python train.py $COMMON seed=$seed run_dir=$OUT/$tag \
      > $OUT/$tag.log 2>&1
    note "$tag rc=$?"
  fi
done
note "done $(date -u +%H:%M:%S)"
