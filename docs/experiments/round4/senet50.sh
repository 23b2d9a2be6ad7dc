#!/bin/bash
# SENet50 flagship run to the full round-3 spec (VERDICT r3 item 5): 2400
# spatial synthetic plots x 60 epochs, bs16 sparse_xy — the paper's best
# biomass model (reference README.md:33 MSENet50). Records steady-state
# plots/s/chip (per-batch telemetry now logs the data/step split) and
# best-val / test R2. Resumable: train.py resumes from the checkpoint in
# run_dir when present (checkpoint_dir override below).
#
# Run ON THE REAL TPU from the repo root:
#   bash docs/experiments/round4/senet50.sh [timeout_s]
set -u -o pipefail
cd "$(dirname "$0")/../../.."
TMO=${1:-10800}
OUT=outputs/runs_r4
LOG=docs/experiments/round4/senet50.log
mkdir -p $OUT
: > "$LOG"

COMMON="task=instance data=instance/synthetic/reg data.synthetic_plots=2400
 data.synthetic_spatial=True data.dataroot=$OUT/synth2400
 training=nfi/minkowski training.batch_size=16 training.num_workers=4
 lr_scheduler=cosineawr update_lr_scheduler_on=on_num_batch
 models=instance/minkowski_baseline data.transform_type=sparse_xy
 training.epochs=60 eval_frequency=5"

RESUME=""
if [ -f "$OUT/senet50/SENet50.ckpt" ]; then
  RESUME="checkpoint_dir=$OUT/senet50"
  echo "[senet50] resuming from $OUT/senet50" | tee -a "$LOG"
fi
timeout "$TMO" python train.py $COMMON model_name=SENet50 $RESUME \
  run_dir=$OUT/senet50 >> $OUT/senet50.log 2>&1
rc=$?
echo "== senet50 rc=$rc (124 = timeout; checkpointed, resumable) ==" \
  | tee -a "$LOG"
grep -E "train epoch" $OUT/senet50.log | tail -5 | tee -a "$LOG"
python - "$OUT/senet50/metrics.jsonl" <<'PYEOF' 2>&1 | tee -a "$LOG"
import json, sys
try:
    rows = [json.loads(l) for l in open(sys.argv[1])]
except OSError:
    print("senet50 NO METRICS (run did not start)"); raise SystemExit
val = [r for r in rows if r.get("stage") == "val"]
test = {r["epoch"]: r for r in rows if r.get("stage") == "test"}
if not val:
    print("senet50 NO VAL ROWS"); raise SystemExit
best = min(val, key=lambda r: r.get("val_total_BMag_ha_rmse", 1e30))
t = test.get(best["epoch"], {})
print("senet50 best-val epoch", best["epoch"],
      "val R2", round(best.get("val_SYNTH_BMag_ha_r2", -9), 3),
      round(best.get("val_SYNTH_V_ha_r2", -9), 3),
      "test R2", round(t.get("test_SYNTH_BMag_ha_r2", -9), 3),
      round(t.get("test_SYNTH_V_ha_r2", -9), 3))
PYEOF
echo "== done $(date -u +%H:%M:%S) ==" | tee -a "$LOG"
