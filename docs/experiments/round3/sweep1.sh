#!/bin/bash
# Round-3 sweep 1: the Pallas pool A/B that rounds 2's Mosaic outage and
# bf16 lowering bug blocked. Prereqs landed this morning (commit c308e06):
# Mosaic compiles, f32-in-register backward device-verified tie-free.
# Run ON THE REAL TPU from the repo root. Everything tee'd; a failed
# measurement leaves a traceback in the log, not an empty section.
set -u
cd "$(dirname "$0")/../../.."
LOG=docs/experiments/round3/sweep1.log
: > "$LOG"

# P1: on-device correctness gate (tie-free bf16 construction). Backend-vs-
# backend bf16 comparison is the WRONG gate: XLA's select_and_scatter
# accumulates multi-window cotangents in bf16 (intermediate partial sums
# round at up to ~0.05 for N(0,1) cotangents), while the Pallas backward
# sums in f32 and rounds once. Measured on device 2026-08-19:
# |xla-oracle| max 0.0498, |pallas-oracle| max 0.0293 = exactly one final
# bf16 rounding. Gate: pallas bf16 grad within 1 bf16 ulp of the exact
# f32 oracle (same bf16 values -> identical routing, f32 accumulation).
echo "=== pallas pool correctness gate (device, vs f32 oracle) ===" | tee -a "$LOG"
timeout 1200 python - <<'PYEOF' 2>&1 | tail -2 | tee -a "$LOG"
import numpy as np, jax, jax.numpy as jnp
from dpcr_agb_tpu.ops.pallas_pool import pallas_max_pool
from dpcr_agb_tpu.ops.dense_grid import dense_max_pool, occupancy_pool
b, d, h, w, c = shape = (2, 8, 16, 16, 64)
rng = np.random.default_rng(0)
dd, hh, ww = np.meshgrid(np.arange(d), np.arange(h), np.arange(w), indexing="ij")
v = ((dd % 3) * 9 + (hh % 3) * 3 + (ww % 3) + 1).astype(np.float32)
x = np.broadcast_to(v[None, ..., None], shape).copy()
occ = (rng.random((b, d, h, w, 1)) < 0.2).astype(np.float32)
x, occ = jnp.asarray(x * occ, jnp.bfloat16), jnp.asarray(occ, jnp.bfloat16)
occ_l = occupancy_pool(occ)
ct = jnp.asarray(rng.normal(size=(b, d // 2, h // 2, w // 2, c)), jnp.bfloat16)
print("fwd match:", bool(jnp.all(dense_max_pool(x, occ, occ_l)
                                 == pallas_max_pool(x, occ, occ_l, False))))
x32, occ32, occl32, ct32 = (a.astype(jnp.float32) for a in (x, occ, occ_l, ct))
g_or = jax.grad(lambda xi: jnp.sum(dense_max_pool(xi, occ32, occl32) * ct32))(x32)
g_pl = jax.grad(lambda xi: jnp.sum((pallas_max_pool(xi, occ, occ_l, False)
                                    * ct).astype(jnp.float32)))(x)
go, gp = np.asarray(g_or), np.asarray(g_pl, np.float32)
ulp = np.maximum(np.abs(go) * 2**-8, 2**-14)
print("bwd within 1 bf16 ulp of f32 oracle:",
      bool(np.all(np.abs(gp - go) <= ulp + 1e-7)))
PYEOF

# P2: the deciding benches — gated on P1. Flip rule: if pallas bs16 beats
# the current default (66.0) by >2%, flip DPCR_POOL_BWD default to
# "pallas" in ops/dense_grid.py and re-run plain bench.py to confirm.
if grep -q "fwd match: True" "$LOG" && \
   grep -q "bwd within 1 bf16 ulp of f32 oracle: True" "$LOG"; then
  for cfg in "DPCR_POOL_BWD=xla" \
             "DPCR_POOL_BWD=pallas" \
             "DPCR_POOL_BWD=pallas DPCR_BENCH_BS=32 DPCR_FOLD_CHUNKS=2"; do
    echo "=== bench $cfg ===" | tee -a "$LOG"
    timeout 3000 env $cfg python bench.py 2>&1 | tail -1 | tee -a "$LOG"
  done
else
  echo "[skip] parity gate failed — benches skipped" | tee -a "$LOG"
fi
echo "[sweep1] done $(date -u +%H:%M:%S)" | tee -a "$LOG"
