#!/bin/bash
# Probe the axon TPU tunnel until it answers, then run the queued round-2
# measurement campaign (docs/experiments/round2/bench_sweep3_followup.sh).
# Run inside tmux; all output tees to docs/experiments/round2/watch.log.
set -u
cd "$(dirname "$0")/.."
LOG=docs/experiments/round2/watch.log
: > "$LOG"
echo "[watch] start $(date -u +%H:%M:%S)" | tee -a "$LOG"
while true; do
  if timeout 240 python - <<'EOF' >> "$LOG" 2>&1
import jax
ds = jax.devices()
assert ds and ds[0].platform not in ("cpu",), ds
print("TPU UP:", ds)
EOF
  then
    echo "[watch] TPU up at $(date -u +%H:%M:%S); launching sweep" | tee -a "$LOG"
    bash docs/experiments/round2/bench_sweep3_followup.sh 2>&1 | tee -a "$LOG"
    echo "[watch] sweep done $(date -u +%H:%M:%S)" | tee -a "$LOG"
    break
  fi
  echo "[watch] TPU still down $(date -u +%H:%M:%S); retry in 300s" | tee -a "$LOG"
  sleep 300
done
