#!/bin/bash
# Round-4 tunnel watcher: probe the axon TPU tunnel; when it answers,
# restart the NFI dress rehearsal if its process is wedged on a dead
# device call (log stale), then run it to completion and validate the
# MFU-instrumented bench. Leaves the chip free afterwards (the KPConv A/B
# and SENet50 campaigns are launched deliberately, not chained).
#
# Usage: nohup bash scripts/tpu_watch_r4.sh <rehearse_pidfile> &
set -u
cd "$(dirname "$0")/.."
LOG=docs/experiments/round4/watch.log
PIDFILE=${1:-/tmp/rehearse.pid}
RLOG=docs/experiments/round3/rehearse_nfi.log
mkdir -p docs/experiments/round4
echo "[watch] start $(date -u +%H:%M:%S)" | tee -a "$LOG"

probe() {
  timeout 240 python - <<'EOF' >> "$LOG" 2>&1
import jax
ds = jax.devices()
assert ds and ds[0].platform not in ("cpu",), ds
print("TPU UP:", ds)
EOF
}

while true; do
  if probe; then
    echo "[watch] TPU up at $(date -u +%H:%M:%S)" | tee -a "$LOG"
    # rehearsal still running? wedged if its log is stale > 2400 s (eval
    # compile gaps through the tunnel reached ~19 min on first-time shapes
    # — only a dead tunnel produces longer silences)
    if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
      age=$(( $(date +%s) - $(stat -c %Y "$RLOG") ))
      if [ "$age" -gt 2400 ]; then
        P=$(cat "$PIDFILE")
        C=$(ps --ppid "$P" -o pid= | tr -d ' ' | head -1)
        echo "[watch] rehearsal wedged (log stale ${age}s) — kill $P $C" \
          | tee -a "$LOG"
        [ -n "$C" ] && kill "$C" 2>/dev/null
        kill "$P" 2>/dev/null
        sleep 10
      else
        echo "[watch] rehearsal alive and logging; waiting for it" \
          | tee -a "$LOG"
        # re-probe later; do not double-start
        sleep 300
        continue
      fi
    fi
    # (re)run the rehearsal to completion if its summary is missing
    if ! grep -q "PROJECTED full NFI protocol" "$RLOG" 2>/dev/null; then
      echo "[watch] launching rehearsal $(date -u +%H:%M:%S)" | tee -a "$LOG"
      bash docs/experiments/round3/rehearse_nfi.sh 4 5 \
        > /tmp/rehearse_r4.out 2>&1 &
      echo $! > "$PIDFILE"
      # wait for it (finite: each trial is checkpoint-resumable; if the
      # tunnel dies again the stale check above recovers on next loop)
      sleep 600
      continue
    fi
    echo "[watch] rehearsal complete; running bench $(date -u +%H:%M:%S)" \
      | tee -a "$LOG"
    timeout 3600 python bench.py > docs/experiments/round4/bench_r4.json \
      2> docs/experiments/round4/bench_r4.err
    echo "[watch] bench rc=$? -> docs/experiments/round4/bench_r4.json" \
      | tee -a "$LOG"
    touch /tmp/r4_campaign_done
    break
  fi
  echo "[watch] TPU still down $(date -u +%H:%M:%S); retry in 300s" \
    | tee -a "$LOG"
  sleep 300
done
echo "[watch] done $(date -u +%H:%M:%S)" | tee -a "$LOG"
