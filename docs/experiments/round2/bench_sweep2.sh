#!/bin/bash
# Round-2 second sweep, PRIORITY-ORDERED: every fresh-process full-model
# compile through the axon tunnel costs ~25-35 min (memory: the persistent
# cache does not capture axon executables), so the decision-relevant
# configs run first and the long tail can be cut when the window closes.
# Run ON THE REAL TPU from the repo root.
set -u
cd "$(dirname "$0")/../../.."
LOG=docs/experiments/round2/sweep2.log
: > "$LOG"

run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 3000 env "$@" python bench.py 2>&1 | tail -1 | tee -a "$LOG"
}

# P1: scatter-max pool — decides the new DPCR_SPARSE_POOL default
run DPCR_SPARSE_POOL=scattermax
# P2: baseline re-confirm (sparse L0 g=7, dense pool; expect ~69)
run DPCR_DUMMY=1
# P3: step breakdown (trimmed inside the script via DPCR_BREAKDOWN_FAST)
echo "=== step breakdown ===" | tee -a "$LOG"
timeout 5400 env DPCR_BREAKDOWN_FAST=1 \
  python docs/experiments/round2/exp_step_breakdown.py 2>&1 | tee -a "$LOG"
# P4: calibrated KPConv (3 configs)
echo "=== kpconv calibrated ===" | tee -a "$LOG"
timeout 5400 python docs/experiments/round2/exp_kpcnn_calibrated.py 2>&1 | tee -a "$LOG"
# P5: bs32 options (paper batch size)
run DPCR_BENCH_BS=32 DPCR_SPARSE_POOL=scattermax
run DPCR_BENCH_BS=32 DPCR_FOLD_CHUNKS=2
# P6: non-divisor group sizes now correct (g=6/5)
run DPCR_BENCH_BS=20
run DPCR_BENCH_BS=24
# decision rule for P1 (printed for whoever reads the log next): if the
# scattermax line beats the baseline line by >2%, flip DPCR_SPARSE_POOL's
# default in ops/sparse_stem.py and re-run bench.py to confirm.
python - <<'PYEOF' 2>/dev/null | tee -a "$LOG"
import json, re
vals = {}
for line in open("docs/experiments/round2/sweep2.log"):
    if line.startswith("=== "):
        key = line.strip("= \n")
    elif line.startswith("{"):
        try:
            vals[key] = json.loads(line)["value"]
        except Exception:
            pass
sm = vals.get("DPCR_SPARSE_POOL=scattermax")
base = vals.get("DPCR_DUMMY=1")
if sm and base:
    print(f"[decision] scattermax {sm} vs baseline {base}: "
          + ("FLIP the DPCR_SPARSE_POOL default" if sm > base * 1.02
             else "keep dense pool"))
PYEOF
# P7: END-TO-END trainer throughput (loader + device overlapped) at the bench
# shape — evidences the round-2 host-pipeline work (212 plots/s host ceiling)
# against the device rate; reuses the bench compile (same shapes). 3 epochs,
# read the "plots/s" lines of epochs 2-3 (epoch 1 pays compile).
echo "=== e2e trainer senet14 sparse_xy bs16 ===" | tee -a "$LOG"
# A/B the loader-side device prefetch (DPCR_DEVICE_PREFETCH, default 1):
# epoch-2/3 plots/s with the H2D copy overlapped vs at dispatch time.
for DP in 1 0; do
echo "=== e2e DPCR_DEVICE_PREFETCH=$DP ===" | tee -a "$LOG"
DPCR_DEVICE_PREFETCH=$DP \
timeout 5400 python -u -c "
import sys; sys.path.insert(0,'.')
import train, tempfile
tmp = tempfile.mkdtemp(prefix='e2e_')
train.main(['task=instance','models=instance/minkowski_baseline',
 'model_name=SENet14','data=instance/synthetic/reg',
 'data.transform_type=sparse_xy','data.synthetic_plots=256',
 f'data.dataroot={tmp}/data','training=nfi/minkowski','training.epochs=3',
 'training.batch_size=16','training.num_workers=4','eval_frequency=10',
 f'run_dir={tmp}/run'])
" 2>&1 | grep -E "plots/s|EPOCH" | tee -a "$LOG"
done
# P8: serving-path (forward-only) throughput — the predict.py / StableHLO
# compute path has no recorded device number yet
echo "=== infer throughput ===" | tee -a "$LOG"
timeout 5400 python docs/experiments/round2/exp_infer_throughput.py 2>&1 | tail -1 | tee -a "$LOG"
