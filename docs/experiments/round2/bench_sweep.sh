#!/bin/bash
# Decisive stem/pool sweep: bench.py (full MSENet14 train step, bs16) under
# the four DPCR_STEM_MODE x DPCR_POOL_BWD combinations. Each run pays a
# full remote compile (~25-35 min through the axon tunnel). Run AFTER the
# flagship queue — the chip OOMs under two concurrent heavy clients.
set -x
cd /root/repo
for stem in xla3d zfold_firewall; do
  for pool in xla manual; do
    echo "=== stem=$stem pool=$pool ==="
    DPCR_STEM_MODE=$stem DPCR_POOL_BWD=$pool timeout 3600 python bench.py \
      2>/tmp/bench_${stem}_${pool}.err | tee /tmp/bench_${stem}_${pool}.json
  done
done
