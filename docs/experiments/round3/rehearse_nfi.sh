#!/bin/bash
# One-command NFI dress rehearsal (VERDICT r3 item 4): the full
# scripts/reproduce_nfi.md protocol — 5 seeded trials, BN recalibration,
# deterministic eval with export, eval_scores.py README-style table — on
# synthetic data at the REAL NFI scale (6104 plots -> seed-42 split
# ~4273/915/916, matching the reference's 4271/919/914) at reduced epochs,
# then a wall-clock projection of the full 310-epoch protocol.
#
# Run ON THE REAL TPU from the repo root:
#   bash docs/experiments/round3/rehearse_nfi.sh [epochs] [trials]
set -eu -o pipefail   # tee must not mask the train rc (ADVICE r3)
cd "$(dirname "$0")/../../.."
EPOCHS=${1:-4}
TRIALS=${2:-5}
OUT=outputs/rehearse_nfi
LOG=docs/experiments/round3/rehearse_nfi.log
mkdir -p "$OUT"
: > "$LOG"

# paper configuration: bs32 (conf/training/nfi/minkowski.yaml). No env
# pins: fold chunking and the pool-backward cube chunking are derived
# from the device HBM limit inside ops/sparse_stem.py (round-4 fix for
# the r3 OOM — the pinned DPCR_FOLD_CHUNKS=2 forced a partial fold
# group AND ignored the 2x cube-table transient at the NFI z-extent).

T0=$(date +%s)
python scripts/run_trials.py --trials "$TRIALS" --out "$OUT" \
  --calibrate-bn 1 -- \
  task=instance models=instance/minkowski_baseline model_name=SENet14 \
  data=instance/synthetic/reg data.synthetic_plots=6104 \
  data.synthetic_spatial=True "data.dataroot=$OUT/data" \
  data.transform_type=sparse_xy \
  training=nfi/minkowski "training.epochs=$EPOCHS" \
  lr_scheduler=cosineawr update_lr_scheduler_on=on_num_batch \
  2>&1 | tee -a "$LOG"
T1=$(date +%s)

python - "$LOG" "$T0" "$T1" "$EPOCHS" "$TRIALS" <<'PYEOF' | tee -a "$LOG"
import re
import sys

log, t0, t1, epochs, trials = (sys.argv[1], int(sys.argv[2]),
                               int(sys.argv[3]), int(sys.argv[4]),
                               int(sys.argv[5]))
txt = open(log).read()
# steady-state epochs only (epoch 1 pays compiles)
secs = [float(m.group(2)) for m in re.finditer(
    r"train epoch (\d+): \d+ batches in ([0-9.]+)s", txt)
    if int(m.group(1)) > 1]
total = t1 - t0
if secs:
    med = sorted(secs)[len(secs) // 2]
    full_train_h = 310 * med * 5 / 3600          # 5 trials, one model
    # calibrate_bn forward epochs cost <= a train epoch; 20 of them
    full_cal_h = 20 * med * 5 / 3600
    print(f"[rehearse] steady train epoch: {med:.1f}s "
          f"({4273 * trials / med:.0f} plots/s effective? per-epoch plots "
          f"4273)")
    print(f"[rehearse] measured rehearsal wall-clock: {total / 60:.1f} min "
          f"({trials} trials x {epochs} epochs + calibrate + eval + score)")
    print(f"[rehearse] PROJECTED full NFI protocol, SENet14, 5 trials x "
          f"310 epochs + 20 calibrate epochs: "
          f"{full_train_h + full_cal_h:.1f} chip-hours")
    print("[rehearse] (KPConv/SENet50/MPointNet scale by their relative "
          "plots/s — see RESULTS.md throughput table)")
else:
    print("[rehearse] FAILED: no steady-state epoch timings found in the "
          "log — the run above did not complete (see tracebacks)")
    sys.exit(1)
PYEOF
echo "[rehearse] done $(date -u +%H:%M:%S)" | tee -a "$LOG"
