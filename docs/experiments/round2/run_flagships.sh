#!/bin/bash
# Round-2 flagship training runs on synthetic data (VERDICT items 3 & 4):
# matched-budget MPointNet vs MSENet14 at a realistic dataset scale
# (round 1 compared them at 96 plots — too small for a deep voxel CNN),
# plus the two models that had zero training evidence: SENet50 and KPConv.
# Runs sequentially on the single tunneled TPU; ~5-15 min device time each
# after compile. Results land in /tmp/runs_r2/<name>/metrics.jsonl.
set -x
cd /root/repo
mkdir -p /tmp/runs_r2

COMMON="task=instance data=instance/synthetic/reg data.synthetic_plots=600
 training=nfi/minkowski training.batch_size=16 training.num_workers=2
 lr_scheduler=cosineawr update_lr_scheduler_on=on_num_batch"

run() {
  name=$1; shift
  timeout 10800 python train.py $COMMON "$@" \
    data.dataroot=/tmp/synth600_$name run_dir=/tmp/runs_r2/$name \
    > /tmp/runs_r2/$name.log 2>&1
  echo "=== $name rc=$? ==="
  tail -2 /tmp/runs_r2/$name/metrics.jsonl 2>/dev/null | head -c 600
}

run mpointnet models=instance/minkowski_baseline model_name=MPointNet \
    data.transform_type=sparse_xy training.epochs=60
run senet14 models=instance/minkowski_baseline model_name=SENet14 \
    data.transform_type=sparse_xy training.epochs=60
run senet50 models=instance/minkowski_baseline model_name=SENet50 \
    data.transform_type=sparse_xy training.epochs=40
run kpconv models=instance/kpconv model_name=KPConv \
    data.transform_type=xy training.epochs=30 training=nfi/kpconv
