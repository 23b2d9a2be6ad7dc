#!/bin/bash
# Decisive stem/pool sweep: bench.py (full MSENet14 train step, bs16) under
# the DPCR_STEM_MODE x DPCR_POOL_BWD combinations. Baseline (xla3d, xla) is
# known: 56.33 plots/s. Most promising first; each run pays a full remote
# compile (~25-35 min through the axon tunnel). Run AFTER the flagship
# queue — the chip OOMs under two concurrent heavy clients.
set -x
cd /root/repo
run() {
  echo "=== stem=$1 pool=$2 ==="
  DPCR_STEM_MODE=$1 DPCR_POOL_BWD=$2 timeout 3600 python bench.py \
    2>/tmp/bench_$1_$2.err | tee /tmp/bench_$1_$2.json
}
run zfold2d_firewall manual
run zfold_firewall manual
run zfold2d_firewall xla
run xla3d manual
