#!/bin/bash
# Accuracy side of the KPConv neighborhood-crop lever (VERDICT r3 item 3):
# does tightening the per-level K calibration p90 -> p80 -> p70 move
# synthetic R²? Throughput side: exp_kpconv_p80.py. The reference crops
# neighborhoods the same way (models/instance/kpconv.py:133-143
# neighborhood_limits), so some tolerance is expected.
#
# Run from repo root (TPU fine, CPU slow):
#   bash docs/experiments/round3/exp_kpconv_crop_r2.sh
set -u
cd "$(dirname "$0")/../../.."
OUT=/tmp/runs_r3_kpcrop
LOG=docs/experiments/round3/kpconv_crop_r2.log
mkdir -p $OUT
: > "$LOG"

COMMON="task=instance data=instance/synthetic/reg data.synthetic_plots=600
 data.synthetic_spatial=True data.dataroot=/tmp/synth600sp
 training=nfi/kpconv training.batch_size=16 training.num_workers=4
 lr_scheduler=cosineawr update_lr_scheduler_on=on_num_batch
 models=instance/kpconv model_name=KPConv data.transform_type=xy
 training.epochs=12 eval_frequency=3"

for pct in 90 80 70; do
  echo "== p$pct $(date -u +%H:%M:%S) ==" | tee -a "$LOG"
  DPCR_KP_CALIB_PCT=$pct timeout 7200 python train.py $COMMON \
    run_dir=$OUT/p$pct > $OUT/p$pct.log 2>&1
  echo "rc=$?" | tee -a "$LOG"
  grep -E "auto-calibrated|train epoch" $OUT/p$pct.log | tail -4 | tee -a "$LOG"
  python - "$OUT/p$pct/metrics.jsonl" <<'PYEOF' | tee -a "$LOG"
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1])]
val = [r for r in rows if r["stage"] == "val"]
if val:
    best = min(val, key=lambda r: r.get("val_total_BMag_ha_rmse", 1e30))
    print("best-val epoch", best["epoch"],
          "val R2", round(best.get("val_SYNTH_BMag_ha_r2", -9), 3),
          round(best.get("val_SYNTH_V_ha_r2", -9), 3))
else:
    print("NO VAL ROWS — run failed")
PYEOF
done
echo "== done $(date -u +%H:%M:%S) ==" | tee -a "$LOG"
