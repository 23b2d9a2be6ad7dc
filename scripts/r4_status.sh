#!/bin/bash
# One-screen round-4 campaign status (polling helper).
cd "$(dirname "$0")/.."
echo "== $(date -u +%H:%M:%S) =="
tail -2 docs/experiments/round4/campaign.log 2>/dev/null
echo "-- rehearse:"
grep -E "trial|PROJECT|FAILED" docs/experiments/round3/rehearse_nfi.log 2>/dev/null | tail -3
tail -1 docs/experiments/round3/rehearse_nfi.log 2>/dev/null
echo "-- structural:"
tail -2 docs/experiments/round4/exp_structural.log 2>/dev/null
echo "-- kpconv_ab:"
tail -2 docs/experiments/round4/kpconv_ab.log 2>/dev/null
echo "-- senet50:"
tail -2 docs/experiments/round4/senet50.log 2>/dev/null
