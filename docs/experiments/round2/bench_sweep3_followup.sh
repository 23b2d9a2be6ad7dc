#!/bin/bash
# Follow-up to sweep3: the Pallas pool A/B that 2026-08-19's Mosaic
# remote-compile outage blocked, plus the e2e trainer measurement whose
# sweep2 output was swallowed (the old grep dropped tracebacks — this
# version tees EVERYTHING and filters afterwards).
# Run ON THE REAL TPU from the repo root. PRIORITY-ORDERED.
set -u
cd "$(dirname "$0")/../../.."
LOG=docs/experiments/round2/sweep3b.log
: > "$LOG"

# P0: is Mosaic compiling today? (2026-08-19: trivial kernel hung >400 s;
# XLA was fine). Bail out of the Pallas section fast if not.
echo "=== mosaic probe ===" | tee -a "$LOG"
timeout 600 python - <<'PYEOF' 2>&1 | tail -2 | tee -a "$LOG"
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
def k(x_ref, o_ref): o_ref[...] = x_ref[...] * 2
x = jnp.ones((8, 128), jnp.float32)
y = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)
print("MOSAIC_OK", float(y[0, 0]))
PYEOF

if grep -q MOSAIC_OK "$LOG"; then
  # P1: pool kernel parity on-device (small shapes)
  echo "=== pallas pool parity (device) ===" | tee -a "$LOG"
  timeout 1200 python - <<'PYEOF' 2>&1 | tail -4 | tee -a "$LOG"
import numpy as np, jax, jax.numpy as jnp
from dpcr_agb_tpu.ops.pallas_pool import pallas_max_pool
from dpcr_agb_tpu.ops.dense_grid import dense_max_pool, occupancy_pool
rng = np.random.default_rng(0)
shape = (2, 8, 16, 16, 64)
x = rng.permutation(np.prod(shape)).astype(np.float32).reshape(shape)
x = (x / x.size) * 8 - 4
occ = (rng.random(shape[:4] + (1,)) < 0.2).astype(np.float32)
x, occ = jnp.asarray(x * occ, jnp.bfloat16), jnp.asarray(occ, jnp.bfloat16)
occ_l = occupancy_pool(occ)
ct = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 64)), jnp.bfloat16)
print("fwd match:", bool(jnp.all(dense_max_pool(x, occ, occ_l)
                                 == pallas_max_pool(x, occ, occ_l, False))))
g_ref = jax.grad(lambda xi: jnp.sum((dense_max_pool(xi, occ, occ_l)
                                     * ct).astype(jnp.float32)))(x)
g_pl = jax.grad(lambda xi: jnp.sum((pallas_max_pool(xi, occ, occ_l, False)
                                    * ct).astype(jnp.float32)))(x)
print("bwd allclose(2%):",
      bool(jnp.allclose(g_ref.astype(jnp.float32), g_pl.astype(jnp.float32),
                        rtol=2e-2, atol=1e-3)))
PYEOF
  # P2: the deciding bench runs — gated on P1 on-device parity (a pallas
  # bench number with failed parity must never enter the flip decision).
  # Flip rule: if pallas bs16 beats the current default (66.0) by >2%,
  # set DPCR_POOL_BWD default to "pallas" in ops/dense_grid.py and re-run
  # plain bench.py to confirm.
  if grep -q "fwd match: True" "$LOG" && grep -q "bwd allclose(2%): True" "$LOG"; then
    for cfg in "DPCR_POOL_BWD=pallas" "DPCR_POOL_BWD=pallas DPCR_BENCH_BS=32"; do
      echo "=== bench $cfg ===" | tee -a "$LOG"
      timeout 3000 env $cfg python bench.py 2>&1 | tail -1 | tee -a "$LOG"
    done
  else
    echo "[skip] pallas pool parity FAILED on device — benches skipped" | tee -a "$LOG"
  fi
else
  echo "[skip] Mosaic still not compiling — Pallas section skipped" | tee -a "$LOG"
fi

# P3: e2e trainer throughput (loader + device overlapped), FULL output kept
for DP in 1 0; do
  echo "=== e2e SENet14 sparse_xy bs16 DPCR_DEVICE_PREFETCH=$DP ===" | tee -a "$LOG"
  DPCR_DEVICE_PREFETCH=$DP timeout 5400 python -u -c "
import sys; sys.path.insert(0,'.')
import train, tempfile
tmp = tempfile.mkdtemp(prefix='e2e_')
train.main(['task=instance','models=instance/minkowski_baseline',
 'model_name=SENet14','data=instance/synthetic/reg',
 'data.transform_type=sparse_xy','data.synthetic_plots=256',
 f'data.dataroot={tmp}/data','training=nfi/minkowski','training.epochs=3',
 'training.batch_size=16','training.num_workers=4','eval_frequency=10',
 f'run_dir={tmp}/run'])
" > /tmp/e2e_dp$DP.log 2>&1
  grep -E "plots/s|EPOCH|Error|error" /tmp/e2e_dp$DP.log | tail -8 | tee -a "$LOG"
  grep -q "plots/s" /tmp/e2e_dp$DP.log || \
    { echo "[e2e FAILED — full tail:]" | tee -a "$LOG"; \
      tail -25 /tmp/e2e_dp$DP.log | tee -a "$LOG"; }
done
echo "[sweep3b] done $(date -u +%H:%M:%S)" | tee -a "$LOG"
