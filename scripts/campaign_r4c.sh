#!/bin/bash
# Round-4 second-session campaign supervisor: the first r4 session's run
# state (outputs/) did not survive the machine swap, so rerun the three
# chip campaigns serialized on the single chip, with the tunnel-wedge
# recovery logic from scripts/tpu_watch_r4.sh applied to every stage:
#   1. NFI dress rehearsal  (VERDICT r3 item 1)   — resumable per trial
#   2. KPConv crop + disposition A/B (items 4+7)  — skip-completed runs
#   3. SENet50 to spec (item 5)                   — checkpoint-resumable
# A stage is declared wedged when its log goes stale > $STALE s while the
# TPU probe answers (eval compiles through the tunnel were measured up to
# ~19 min on first-time shapes; only a dead tunnel is silent longer).
#
# Usage: nohup bash scripts/campaign_r4c.sh <deadline_epoch_s> &
set -u
cd "$(dirname "$0")/.."
LOG=docs/experiments/round4/campaign.log
DEADLINE=${1:?pass absolute deadline as epoch seconds}
STALE=2400
mkdir -p docs/experiments/round4 outputs
note() { echo "[camp] $* $(date -u +%H:%M:%S)" | tee -a "$LOG"; }

probe() {
  timeout 240 python - <<'EOF' >> "$LOG" 2>&1
import jax
ds = jax.devices()
assert ds and ds[0].platform not in ("cpu",), ds
print("TPU UP:", ds)
EOF
}

# run_stage <tag> <done_check_cmd> <launch_cmd> <watch_log>
run_stage() {
  local tag=$1 done_check=$2 launch=$3 wlog=$4 pidfile=/tmp/camp_$1.pid
  note "stage $tag begin"
  while true; do
    if eval "$done_check"; then note "stage $tag DONE"; return 0; fi
    if [ "$(date +%s)" -ge "$DEADLINE" ]; then
      note "stage $tag hit deadline — stopping campaign"
      if [ -f "$pidfile" ] && kill -0 "$(cat "$pidfile")" 2>/dev/null; then
        local P C
        P=$(cat "$pidfile")
        for C in $(ps --ppid "$P" -o pid=); do kill "$C" 2>/dev/null; done
        kill "$P" 2>/dev/null
      fi
      return 1
    fi
    if [ -f "$pidfile" ] && kill -0 "$(cat "$pidfile")" 2>/dev/null; then
      # freshest mtime under the watch path (file OR directory of run logs)
      local age=99999 newest
      newest=$(find $wlog -type f -printf '%T@\n' 2>/dev/null \
               | sort -n | tail -1 | cut -d. -f1)
      [ -n "$newest" ] && age=$(( $(date +%s) - newest ))
      if [ "$age" -gt "$STALE" ] && probe; then
        local P C
        P=$(cat "$pidfile")
        note "stage $tag wedged (log stale ${age}s, TPU up) — kill $P"
        for C in $(ps --ppid "$P" -o pid=); do kill "$C" 2>/dev/null; done
        kill "$P" 2>/dev/null
        sleep 10
      fi
    else
      if probe; then
        note "stage $tag launching"
        bash -c "$launch" > /tmp/camp_$tag.out 2>&1 &
        echo $! > "$pidfile"
      else
        note "TPU down; stage $tag waits"
      fi
    fi
    sleep 180
  done
}

run_stage rehearse \
  'grep -q "PROJECTED full NFI protocol" docs/experiments/round3/rehearse_nfi.log 2>/dev/null' \
  'bash docs/experiments/round3/rehearse_nfi.sh 4 5' \
  docs/experiments/round3/rehearse_nfi.log || exit 1

# structural battery (VERDICT item 3) outranks the kpconv/senet50 stages
run_stage structural \
  'grep -q "battery done" docs/experiments/round4/exp_structural.log 2>/dev/null' \
  'bash docs/experiments/round4/exp_structural.sh' \
  docs/experiments/round4/exp_structural.log || exit 1

# full MFU-instrumented bench (all model rows): the round's honest
# BENCH_r04 numbers AND the compile-cache warm-up for the driver's own
# bench invocation at round end
run_stage benchfull \
  'grep -q "\"metric\"" docs/experiments/round4/bench_r4.json 2>/dev/null' \
  'timeout 3000 python bench.py > docs/experiments/round4/bench_r4.json 2> docs/experiments/round4/bench_r4.err' \
  'docs/experiments/round4/bench_r4.err' || exit 1

mkdir -p outputs/runs_r4/kpconv_ab
run_stage kpconv_ab \
  'grep -q "^== done" docs/experiments/round4/kpconv_ab.log 2>/dev/null' \
  'bash docs/experiments/round4/kpconv_ab.sh' \
  'outputs/runs_r4/kpconv_ab' || exit 1

# SENet50 gets whatever time remains before the deadline
REM=$(( DEADLINE - $(date +%s) ))
if [ "$REM" -gt 900 ]; then
  run_stage senet50 \
    'grep -q "^== done" docs/experiments/round4/senet50.log 2>/dev/null' \
    "bash docs/experiments/round4/senet50.sh $REM" \
    'outputs/runs_r4/senet50.log' || exit 1
else
  note "no time left for senet50"
fi
note "campaign complete"
touch /tmp/r4b_campaign_done
