#!/bin/bash
# KPConv matched-budget A/Bs (VERDICT r3 items 4 + 7), one sweep:
#
#  A) neighborhood-crop accuracy gate: uncropped (p100) vs p90 vs p80,
#     2 seeds each, same epochs (18 — round-2 evidence says convergence on
#     600 spatial plots needs ~15+), spatial generator. Decides the
#     DPCR_KP_CALIB_PCT / calibrate_percentile default on real evidence.
#     Reference semantics being bent: models/instance/kpconv.py:133-143.
#  B) kernel-disposition A/B at K=15: potential-descent (the reference's
#     K<=30 path, now our default) vs Lloyd (rounds 1-3 default), 2 seeds,
#     at p90. Validates or retires the r1-r3 Lloyd divergence.
#
# p90+descent arms are shared between A and B (6 + 2 = 8 runs).
# Run ON THE REAL TPU from the repo root:
#   bash docs/experiments/round4/kpconv_ab.sh
set -u -o pipefail
cd "$(dirname "$0")/../../.."
OUT=outputs/runs_r4/kpconv_ab
LOG=docs/experiments/round4/kpconv_ab.log
mkdir -p $OUT
: > "$LOG"
note() { echo "== $* ==" | tee -a "$LOG"; }

COMMON="task=instance data=instance/synthetic/reg data.synthetic_plots=600
 data.synthetic_spatial=True data.dataroot=$OUT/synth600sp
 training=nfi/kpconv training.batch_size=16 training.num_workers=4
 lr_scheduler=cosineawr update_lr_scheduler_on=on_num_batch
 models=instance/kpconv model_name=KPConv data.transform_type=xy
 training.epochs=18 eval_frequency=3"

run_one() {  # run_one <tag> <pct> <disposition> <seed>
  local tag=$1 pct=$2 disp=$3 seed=$4
  note "$tag (pct=$pct disp=$disp seed=$seed) $(date -u +%H:%M:%S)"
  if [ -f "$OUT/$tag/metrics.jsonl" ] && \
     grep -q '"stage": "val"' "$OUT/$tag/metrics.jsonl" 2>/dev/null && \
     [ "$(grep -c 'train epoch' "$OUT/$tag.log" 2>/dev/null)" -ge 18 ]; then
    note "$tag already complete, skip"
  else
    DPCR_KP_CALIB_PCT=$pct DPCR_KP_DISPOSITION=$disp timeout 4200 \
      python train.py $COMMON seed=$seed run_dir=$OUT/$tag \
      > $OUT/$tag.log 2>&1
    note "$tag rc=$?"
  fi
  python - "$OUT/$tag/metrics.jsonl" "$tag" <<'PYEOF' 2>&1 | tee -a "$LOG"
import json, sys
try:
    rows = [json.loads(l) for l in open(sys.argv[1])]
except OSError:
    print(sys.argv[2], "NO METRICS (run did not start)"); raise SystemExit
val = [r for r in rows if r.get("stage") == "val"]
test = {r["epoch"]: r for r in rows if r.get("stage") == "test"}
if not val:
    print(sys.argv[2], "NO VAL ROWS - run failed"); raise SystemExit
best = min(val, key=lambda r: r.get("val_total_BMag_ha_rmse", 1e30))
t = test.get(best["epoch"], {})
print(sys.argv[2], "best-val epoch", best["epoch"],
      "val R2", round(best.get("val_SYNTH_BMag_ha_r2", -9), 3),
      round(best.get("val_SYNTH_V_ha_r2", -9), 3),
      "test R2", round(t.get("test_SYNTH_BMag_ha_r2", -9), 3),
      round(t.get("test_SYNTH_V_ha_r2", -9), 3))
PYEOF
}

# A) crop gate (disposition = descent, the new default for K=15)
for seed in 0 1; do
  for pct in 100 90 80; do
    run_one "p${pct}_s${seed}" "$pct" descent "$seed"
  done
done
# B) disposition A/B at p90 (lloyd arms; descent arms shared from A)
for seed in 0 1; do
  run_one "p90_lloyd_s${seed}" 90 lloyd "$seed"
done
note "done $(date -u +%H:%M:%S)"
