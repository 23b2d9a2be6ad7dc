#!/bin/bash
# VERDICT r3 item 6: a credible SENet50 accuracy run. Round 2's 600-plot /
# 30-epoch run overfit and collapsed at the best-val epoch (test R2
# 0.339/-0.21); the paper's own size experiment predicts the deep model
# needs data. This run: 2400 spatial-signal plots (the generator where
# model ordering reproduces), 60 epochs, SENet14 alongside as the control.
# Done-gate: SENet50 best-val-epoch TEST R2 positive and within ~0.05 of
# SENet14's.
set -x
cd "$(dirname "$0")/../../.."
OUT=/tmp/runs_r3
mkdir -p $OUT

COMMON="task=instance data=instance/synthetic/reg data.synthetic_plots=2400
 data.synthetic_spatial=True data.dataroot=/tmp/synth2400
 training=nfi/minkowski training.batch_size=16 training.num_workers=4
 lr_scheduler=cosineawr update_lr_scheduler_on=on_num_batch
 models=instance/minkowski_baseline data.transform_type=sparse_xy
 training.epochs=60 eval_frequency=5"

for name in senet50 senet14; do
  model=$([ $name = senet50 ] && echo SENet50 || echo SENet14)
  timeout 21600 python train.py $COMMON model_name=$model \
    run_dir=$OUT/$name > $OUT/$name.log 2>&1
  echo "=== $name rc=$? ==="
  python - "$OUT/$name/metrics.jsonl" <<'PYEOF'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1])]
val = [r for r in rows if r["stage"] == "val"]
test = {r["epoch"]: r for r in rows if r["stage"] == "test"}
if val:
    best = min(val, key=lambda r: r.get("val_total_BMag_ha_rmse", 1e30))
    t = test.get(best["epoch"], {})
    print("best-val epoch", best["epoch"],
          "val R2", round(best.get("val_SYNTH_BMag_ha_r2", -9), 3),
          round(best.get("val_SYNTH_V_ha_r2", -9), 3),
          "| test R2", round(t.get("test_SYNTH_BMag_ha_r2", -9), 3),
          round(t.get("test_SYNTH_V_ha_r2", -9), 3))
PYEOF
done
