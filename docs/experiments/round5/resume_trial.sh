#!/bin/bash
# Resume the round-5 converged trial past the host-OOM boundary: the
# axon transport client leaks ~7 MB of host memory per dispatch
# (measured: 124 GB anon RSS at OOM-kill after 99 epochs x 152 batches —
# dmesg round 5; the CPU-path Trainer is leak-free, see
# test_trainer_lifecycle_releases_memory), so ONE process cannot train
# more than ~95-100 protocol epochs. This wrapper RECYCLES the process:
# checkpoint-resume in bounded slices until the deadline, then clears
# the stage markers and re-runs the protocol tail on the new best-val.
#
# Usage ON THE REAL TPU:
#   bash docs/experiments/round5/resume_trial.sh <deadline_epoch_secs>
set -u -o pipefail
cd "$(dirname "$0")/../../.."
DEADLINE=${1:?deadline unix seconds}
OUT=outputs/runs_r5/converged
LOG=docs/experiments/round5/converged_trial.log
note() { echo "== $* $(date -u +%H:%M:%S) ==" | tee -a "$LOG"; }

COMMON="task=instance models=instance/minkowski_baseline model_name=SENet14
 data=instance/synthetic/reg data.synthetic_plots=6104
 data.synthetic_spatial=True data.dataroot=outputs/rehearse_nfi/data
 data.transform_type=sparse_xy training=nfi/minkowski training.epochs=310
 lr_scheduler=cosineawr update_lr_scheduler_on=on_num_batch
 eval_frequency=15"

while true; do
  left=$(( DEADLINE - $(date +%s) ))
  [ "$left" -lt 900 ] && { note "deadline reached, stop training"; break; }
  slice=$(( left > 4500 ? 4500 : left ))   # <=75 min/process, OOM-safe
  note "resume slice (timeout ${slice}s)"
  timeout "$slice" python train.py $COMMON seed=0 \
    checkpoint_dir=$OUT/trial0 run_dir=$OUT/trial0 >> $OUT/train.log 2>&1
  rc=$?
  note "slice rc=$rc"
  grep -aE "train epoch" $OUT/train.log | tail -1 | tee -a "$LOG"
  # rc 0 = full 310 epochs done
  [ "$rc" -eq 0 ] && break
done

# re-run the protocol tail on the extended checkpoint
rm -f $OUT/trial0/.cal_done
rm -rf $OUT/trial0/eval
note "protocol tail (recal + eval + scores)"
python scripts/run_trials.py --trials 1 --out "$OUT" --calibrate-bn 20 -- \
  $COMMON 2>&1 | tail -20 | tee -a "$LOG"
note "resume pass done"
