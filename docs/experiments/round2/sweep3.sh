#!/bin/bash
# Round-2 third sweep: Pallas pool evaluation + L0 op-level decomposition.
# Run ON THE REAL TPU from the repo root, after bench_sweep2.sh.
# PRIORITY-ORDERED (each fresh-process full-model compile ~20-35 min through
# the axon tunnel): the bench-deciding Pallas-pool runs go first, the
# micro decompositions last so the window can close on them safely.
set -u
cd "$(dirname "$0")/../../.."
LOG=docs/experiments/round2/sweep3.log
: > "$LOG"

echo "=== pallas pool: mosaic compile + on-device parity (small) ===" | tee -a "$LOG"
timeout 1200 python - <<'PYEOF' 2>&1 | tail -6 | tee -a "$LOG"
import numpy as np, jax, jax.numpy as jnp
from dpcr_agb_tpu.ops.dense_grid import dense_max_pool, occupancy_pool
from dpcr_agb_tpu.ops.pallas_pool import pallas_max_pool
rng = np.random.default_rng(0)
shape = (2, 8, 16, 16, 64)
x = rng.permutation(np.prod(shape)).astype(np.float32).reshape(shape)
x = (x / x.size) * 8 - 4
occ = (rng.random(shape[:4] + (1,)) < 0.2).astype(np.float32)
x, occ = jnp.asarray(x * occ, jnp.bfloat16), jnp.asarray(occ, jnp.bfloat16)
occ_l = occupancy_pool(occ)
ct = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 64)), jnp.bfloat16)
ref_y = dense_max_pool(x, occ, occ_l)
got_y = pallas_max_pool(x, occ, occ_l, False)
print("fwd match:", bool(jnp.all(ref_y == got_y)))
g_ref = jax.grad(lambda xi: jnp.sum((dense_max_pool(xi, occ, occ_l)
                                     * ct).astype(jnp.float32)))(x)
g_pl = jax.grad(lambda xi: jnp.sum((pallas_max_pool(xi, occ, occ_l, False)
                                    * ct).astype(jnp.float32)))(x)
# dense select_and_scatter adds multi-window cotangents in bf16; the pallas
# kernel accumulates in f32 and rounds once -> allclose, not equality
print("bwd allclose(2%):",
      bool(jnp.allclose(g_ref.astype(jnp.float32), g_pl.astype(jnp.float32),
                        rtol=2e-2, atol=1e-3)))
PYEOF

echo "=== bench DPCR_POOL_BWD=pallas bs16 ===" | tee -a "$LOG"
timeout 3000 env DPCR_POOL_BWD=pallas python bench.py 2>&1 | tail -1 | tee -a "$LOG"

echo "=== bench DPCR_POOL_BWD=pallas bs32 (auto fold chunks) ===" | tee -a "$LOG"
timeout 3000 env DPCR_POOL_BWD=pallas DPCR_BENCH_BS=32 \
  python bench.py 2>&1 | tail -1 | tee -a "$LOG"

echo "=== L0 micro pool chains (pallas pool) ===" | tee -a "$LOG"
timeout 3000 env DPCR_POOL_BWD=pallas DPCR_L0_MICRO_POOL_ONLY=1 \
  python docs/experiments/round2/exp_l0_micro2.py 2>&1 \
  | grep -vE "WARNING" | tee -a "$LOG"

echo "=== L0 micro decomposition (xla pool) ===" | tee -a "$LOG"
timeout 5400 python docs/experiments/round2/exp_l0_micro2.py 2>&1 \
  | grep -vE "WARNING" | tee -a "$LOG"

echo "[sweep3] done $(date -u +%H:%M:%S)" | tee -a "$LOG"
