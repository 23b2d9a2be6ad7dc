"""Grouped-fold patch gather rates at the REAL stem index pattern:
g=7 ([B,V,7] rows of C147) and g=4 ([B,V,14] rows of C84) vs the measured
g=1 baseline (281.75 ms for [B,V,49] rows of C21).

Run ON THE REAL TPU: python docs/experiments/round2/exp_grouped_gather.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.bench_protocol import timed_diff

B, V, CIN, K = 16, 16000, 3, 7
DIMS = (88, 88, 80)
DT = jnp.bfloat16
D, H, W = DIMS


def make_coords(seed=0):
    rng = np.random.default_rng(seed)
    coords = np.zeros((B, V, 3), np.int32)
    mask = np.zeros((B, V), bool)
    for b in range(B):
        flat = np.sort(rng.choice(D * H * W, size=V - 100, replace=False))
        c = np.stack([flat // (H * W), (flat // W) % H, flat % W], 1)
        coords[b, : V - 100] = c
        mask[b, : V - 100] = True
    return jnp.asarray(coords), jnp.asarray(mask)


def chain_grouped(g):
    from dpcr_agb_tpu.ops.sparse_stem import (_patch_indices_grouped,
                                              batched_rows)

    def make(n):
        def run(flat_table, idx):
            def body(t, _):
                rows = batched_rows(t, idx)
                t2 = t + (jnp.sum(rows, dtype=jnp.float32)
                          * 1e-12).astype(t.dtype)
                return t2, None
            out, _ = jax.lax.scan(body, flat_table, None, length=n)
            return out
        return run
    return make


def main():
    from dpcr_agb_tpu.ops.dense_grid import scatter_to_dense
    from dpcr_agb_tpu.ops.sparse_stem import (_fold_zy,
                                              _patch_indices_grouped)
    rng = np.random.default_rng(1)
    coords, mask = make_coords()
    x = jnp.asarray(rng.normal(size=(B, V, CIN)), DT)
    dense, _ = jax.vmap(
        lambda cc, m, f: scatter_to_dense(cc, m, f, DIMS))(coords, mask, x)
    cc = jnp.clip(coords, 0, jnp.asarray([D - 1, H - 1, W - 1]))
    for g in (7, 4, 2):
        n_g = -(-K // g)
        folded = _fold_zy(dense, K, g)
        flat = jax.block_until_ready(folded.reshape(-1, g * K * CIN))
        idx = _patch_indices_grouped(cc, DIMS, K, g)
        n_rows = B * V * K * n_g
        ms = timed_diff(chain_grouped(g), (flat, idx))
        print(f"g={g}: [B,V,{K*n_g}] rows C{g*K*CIN} "
              f"table {flat.size*2/1e9:.2f} GB: {ms:8.2f} ms "
              f"= {ms*1e6/n_rows:5.2f} ns/row")
        del flat, folded


if __name__ == "__main__":
    main()
