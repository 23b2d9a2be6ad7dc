#!/bin/bash
# Round-3 sweep 6 (serialized TPU batch) — after the wire-compaction codec
# (int16 coords / bf16 x / pos dropped; data/batch.encode_wire) and the
# auto pool-bwd gather (cube at b>16, fixing the bs32 fused-pool collapse):
#   P1  e2e gap re-measure (exp_e2e_gap.py): H2D is the tunnel bottleneck
#       (sweep4: 9.5 MB/batch at 21 MB/s); the codec cuts the wire to
#       ~3.4 MB — expect h2d_only and e2e_epoch* to improve ~2.5x.
#   P2  bench bs16 + bs32 with the new defaults (headline + paper batch).
#   P3  NFI-scale dress rehearsal (VERDICT r3 item 4), 2 trials x 2 epochs.
#   P4  SENet50 credible accuracy run (VERDICT r3 item 6), spatial
#       generator, 1600 plots — runs until its timeout; checkpointed, so a
#       later round can resume/extend.
set -u
cd "$(dirname "$0")/../../.."
LOG=docs/experiments/round3/sweep6.log
: > "$LOG"
note() { echo "== $* ==" | tee -a "$LOG"; }

note "P1 e2e gap with wire codec  $(date -u +%H:%M:%S)"
timeout 2400 python docs/experiments/round3/exp_e2e_gap.py >> "$LOG" 2>&1
note "rc=$?"

note "P2 bench bs16  $(date -u +%H:%M:%S)"
timeout 1200 python bench.py >> "$LOG" 2>&1
note "rc=$?"
note "P2 bench bs32  $(date -u +%H:%M:%S)"
DPCR_BENCH_BS=32 timeout 1800 python bench.py >> "$LOG" 2>&1
note "rc=$?"

note "P3 NFI dress rehearsal 2x2  $(date -u +%H:%M:%S)"
timeout 3600 bash docs/experiments/round3/rehearse_nfi.sh 2 2 \
  >> "$LOG" 2>&1
note "rc=$?"

note "P4 SENet50 spatial 1600 plots  $(date -u +%H:%M:%S)"
OUT=outputs/runs_r3
mkdir -p $OUT
COMMON="task=instance data=instance/synthetic/reg data.synthetic_plots=1600
 data.synthetic_spatial=True data.dataroot=$OUT/synth1600
 training=nfi/minkowski training.batch_size=16 training.num_workers=4
 lr_scheduler=cosineawr update_lr_scheduler_on=on_num_batch
 models=instance/minkowski_baseline data.transform_type=sparse_xy
 training.epochs=40 eval_frequency=4"
timeout 5400 python train.py $COMMON model_name=SENet50 \
  run_dir=$OUT/senet50 >> $OUT/senet50.log 2>&1
note "P4 senet50 rc=$? (124 = timeout; checkpointed, resumable)"
timeout 2700 python train.py $COMMON model_name=SENet14 \
  run_dir=$OUT/senet14 >> $OUT/senet14.log 2>&1
note "P4 senet14 control rc=$?"
for name in senet50 senet14; do
  python - "$OUT/$name/metrics.jsonl" "$name" <<'PYEOF' | tee -a "$LOG"
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
          "| test R2", round(t.get("test_SYNTH_BMag_ha_r2", -9), 3),
          round(t.get("test_SYNTH_V_ha_r2", -9), 3))
else:
    print(sys.argv[2], "no val rows yet")
PYEOF
done
note "sweep6 done  $(date -u +%H:%M:%S)"
