#!/bin/bash
# Round-5 converged trial (VERDICT r4 item 3): trial 0 of the NFI dress
# rehearsal config (SENet14, sparse_xy, bs32, 6104 spatial plots — the
# paper protocol shape) trained for as many of the protocol's 310 epochs
# as the chip window allows, then the full protocol tail:
# calibrate_bn (20 epochs @ b64) -> eval (3 stages @ b32) -> eval_scores.
#
# The run is checkpoint-resumable: re-invoking continues from the last
# epoch. The train phase is bounded by $1 (seconds, default 4 h); on
# timeout the protocol tail runs on the best-val weights reached.
# eval_frequency=15 logs the val/test trajectory (the epoch-vs-R2 curve
# VERDICT asks for) every 15 epochs into metrics.jsonl.
#
# Run ON THE REAL TPU:  bash docs/experiments/round5/converged_trial.sh [train_timeout_s]
set -u -o pipefail
cd "$(dirname "$0")/../../.."
TMO=${1:-14400}
OUT=outputs/runs_r5/converged
LOG=docs/experiments/round5/converged_trial.log
mkdir -p "$OUT"
note() { echo "== $* $(date -u +%H:%M:%S) ==" | tee -a "$LOG"; }

COMMON="task=instance models=instance/minkowski_baseline model_name=SENet14
 data=instance/synthetic/reg data.synthetic_plots=6104
 data.synthetic_spatial=True data.dataroot=outputs/rehearse_nfi/data
 data.transform_type=sparse_xy training=nfi/minkowski training.epochs=310
 lr_scheduler=cosineawr update_lr_scheduler_on=on_num_batch
 eval_frequency=15"

RESUME=""
if [ -f "$OUT/trial0/SENet14.ckpt" ]; then
  RESUME="checkpoint_dir=$OUT/trial0"
  note "resuming from $OUT/trial0"
fi
note "train start (timeout ${TMO}s)"
timeout "$TMO" python train.py $COMMON seed=0 $RESUME \
  run_dir=$OUT/trial0 >> $OUT/train.log 2>&1
rc=$?
note "train rc=$rc (124 = timeout; checkpointed)"
grep -E "train epoch" $OUT/train.log | tail -3 | tee -a "$LOG"

# protocol tail via run_trials (sees the checkpoint, skips train; one
# subprocess per stage; writes trials_summary.json)
note "protocol tail: calibrate_bn + eval + eval_scores"
python scripts/run_trials.py --trials 1 --out "$OUT" --calibrate-bn 20 -- \
  $COMMON 2>&1 | tail -20 | tee -a "$LOG"
note "done"
# trajectory summary: epoch vs val/test R2 from metrics.jsonl
python - "$OUT/trial0/metrics.jsonl" <<'PYEOF' 2>&1 | tee -a "$LOG"
import json, sys
try:
    rows = [json.loads(l) for l in open(sys.argv[1])]
except OSError:
    print("converged trial: NO METRICS"); raise SystemExit
for st in ("val", "test"):
    tr = [(r["epoch"], round(r.get(f"{st}_SYNTH_BMag_ha_r2", -9), 3),
           round(r.get(f"{st}_SYNTH_V_ha_r2", -9), 3))
          for r in rows if r.get("stage") == st]
    print(f"{st} trajectory (epoch, BMag R2, V R2): {tr}")
PYEOF
