#!/bin/bash
# Round-3 sweep 7 (serialized TPU queue) — completes the sweep6 program
# that the previous session's wall-clock cut off mid-P2.
#
# Findings already in from sweep6 P1 (sweep6.log): with the wire codec,
# h2d_only dropped 446.5 -> 93.6 ms/batch (3.3 MB at 36 MB/s), e2e_epoch2
# 13.0 -> 14.05 plots/s. device_same printed 2.32 plots/s — a MEASUREMENT
# ARTIFACT, not a regression: the pre-placed batch is wire-ENCODED, so the
# timed loop's first call retraced + remote-compiled the encoded-signature
# step (~65 s through the tunnel) inside the timed region; bench.py on the
# same day reads 68.43 plots/s (compile-cached), and e2e uses the same
# encoded signature at full rate thereafter. The remaining e2e gap
# (14 vs 66 device) is tunnel dispatch/D2H RTT, absent on local hardware.
#
#   P1  bench bs32 at the new defaults (auto cube pool-bwd + FOLD_CHUNKS)
#   P2  NFI-scale dress rehearsal, 2 trials x 2 epochs (VERDICT item 4)
#   P3  KPConv p90 vs p80 accuracy (gates the calibration flip, item 3)
#   P4  SENet50 + SENet14 control on the spatial generator (item 6),
#       checkpointed/resumable — runs until its timeout.
set -u -o pipefail   # tee must not mask rc notes (ADVICE r3)
cd "$(dirname "$0")/../../.."
LOG=docs/experiments/round3/sweep7.log
: > "$LOG"
note() { echo "== $* ==" | tee -a "$LOG"; }

note "P1 bench bs32  $(date -u +%H:%M:%S)"
DPCR_BENCH_BS=32 timeout 1800 python bench.py >> "$LOG" 2>&1
note "rc=$?"

note "P2 NFI dress rehearsal 2x2  $(date -u +%H:%M:%S)"
timeout 3000 bash docs/experiments/round3/rehearse_nfi.sh 2 2 >> "$LOG" 2>&1
note "rc=$?"

note "P3 KPConv crop accuracy p90/p80  $(date -u +%H:%M:%S)"
OUT=/tmp/runs_r3_kpcrop
mkdir -p $OUT
COMMON="task=instance data=instance/synthetic/reg data.synthetic_plots=600
 data.synthetic_spatial=True data.dataroot=/tmp/synth600sp
 training=nfi/kpconv training.batch_size=16 training.num_workers=4
 lr_scheduler=cosineawr update_lr_scheduler_on=on_num_batch
 models=instance/kpconv model_name=KPConv data.transform_type=xy
 training.epochs=12 eval_frequency=3"
for pct in 90 80; do
  note "P3 p$pct  $(date -u +%H:%M:%S)"
  DPCR_KP_CALIB_PCT=$pct timeout 2700 python train.py $COMMON \
    run_dir=$OUT/p$pct > $OUT/p$pct.log 2>&1
  note "rc=$?"
  python - "$OUT/p$pct/metrics.jsonl" <<'PYEOF' 2>&1 | tee -a "$LOG"
import json, sys
try:
    rows = [json.loads(l) for l in open(sys.argv[1])]
except OSError:
    print("NO METRICS (run did not start)"); raise SystemExit
val = [r for r in rows if r["stage"] == "val"]
if val:
    best = min(val, key=lambda r: r.get("val_total_BMag_ha_rmse", 1e30))
    print("best-val epoch", best["epoch"],
          "val R2", round(best.get("val_SYNTH_BMag_ha_r2", -9), 3),
          round(best.get("val_SYNTH_V_ha_r2", -9), 3))
else:
    print("NO VAL ROWS - run failed")
PYEOF
done

note "P4 SENet50 spatial 1600 plots  $(date -u +%H:%M:%S)"
OUT=outputs/runs_r3
mkdir -p $OUT
COMMON="task=instance data=instance/synthetic/reg data.synthetic_plots=1600
 data.synthetic_spatial=True data.dataroot=$OUT/synth1600
 training=nfi/minkowski training.batch_size=16 training.num_workers=4
 lr_scheduler=cosineawr update_lr_scheduler_on=on_num_batch
 models=instance/minkowski_baseline data.transform_type=sparse_xy
 training.epochs=40 eval_frequency=4"
timeout 4500 python train.py $COMMON model_name=SENet50 \
  run_dir=$OUT/senet50 >> $OUT/senet50.log 2>&1
note "P4 senet50 rc=$? (124 = timeout; checkpointed, resumable)"
timeout 2700 python train.py $COMMON model_name=SENet14 \
  run_dir=$OUT/senet14 >> $OUT/senet14.log 2>&1
note "P4 senet14 control rc=$?"
for name in senet50 senet14; do
  python - "$OUT/$name/metrics.jsonl" "$name" <<'PYEOF' 2>&1 | tee -a "$LOG"
import json, sys
try:
    rows = [json.loads(l) for l in open(sys.argv[1])]
except OSError:
    print(sys.argv[2], "NO METRICS (run did not start)"); raise SystemExit
val = [r for r in rows if r.get("stage") == "val"]
test = {r["epoch"]: r for r in rows if r.get("stage") == "test"}
if val:
    best = min(val, key=lambda r: r.get("val_total_BMag_ha_rmse", 1e30))
    t = test.get(best["epoch"], {})
    print(sys.argv[2], "best-val epoch", best["epoch"],
          "val R2", round(best.get("val_SYNTH_BMag_ha_r2", -9), 3),
          round(best.get("val_SYNTH_V_ha_r2", -9), 3),
          "test R2", round(t.get("test_SYNTH_BMag_ha_r2", -9), 3),
          round(t.get("test_SYNTH_V_ha_r2", -9), 3))
else:
    print(sys.argv[2], "NO VAL ROWS - run failed")
PYEOF
done
note "done $(date -u +%H:%M:%S)"
