"""Micro-decomposition of stem_conv_sparse_batch: scatter vs fold vs
patch-gather vs matmul (the composite measured 326 ms at bs16 — which
stage owns it?).

Run ON THE REAL TPU: python docs/experiments/round2/exp_stem_micro.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.bench_protocol import timed_diff

B, V, CIN, COUT, K = 16, 16000, 3, 64, 7
DIMS = (88, 88, 80)
DT = jnp.bfloat16
D, H, W = DIMS
P = K // 2
HP = H + 2 * P


def make_batch(seed=0):
    rng = np.random.default_rng(seed)
    coords = np.zeros((B, V, 3), np.int32)
    mask = np.zeros((B, V), bool)
    for b in range(B):
        flat = np.sort(rng.choice(D * H * W, size=V - 100, replace=False))
        c = np.stack([flat // (H * W), (flat // W) % H, flat % W], 1)
        coords[b, : V - 100] = c
        mask[b, : V - 100] = True
    x = rng.normal(size=(B, V, CIN)).astype(np.float32)
    x[~mask] = 0
    wts = rng.normal(size=(K ** 3, CIN, COUT)).astype(np.float32) * 0.05
    return (jnp.asarray(coords), jnp.asarray(mask),
            jnp.asarray(x, DT), jnp.asarray(wts, DT))


def chain_scatter(n):
    from dpcr_agb_tpu.ops.dense_grid import scatter_to_dense

    def run(x, coords, mask):
        def body(c, _):
            dense, _ = jax.vmap(
                lambda cc, m, f: scatter_to_dense(cc, m, f, DIMS))(
                coords, mask, c)
            nxt = c + jnp.mean(dense, dtype=jnp.float32).astype(c.dtype)
            return nxt, None
        out, _ = jax.lax.scan(body, x, None, length=n)
        return out
    return run


def chain_fold(n):
    from dpcr_agb_tpu.ops.sparse_stem import _fold_z

    def run(dense):
        def body(c, _):
            folded = _fold_z(c, K)
            nxt = c + jnp.mean(folded, dtype=jnp.float32).astype(c.dtype)
            return nxt, None
        out, _ = jax.lax.scan(body, dense, None, length=n)
        return out
    return run


def chain_patch_gather(n):
    from dpcr_agb_tpu.ops.sparse_stem import _patch_indices, batched_rows

    def run(folded_flat, coords, mask):
        cc = jnp.clip(coords, 0, jnp.asarray([D - 1, H - 1, W - 1]))
        idx = _patch_indices(cc, DIMS, K)

        def body(t, _):
            rows = batched_rows(t, idx)          # [B,V,49,21]
            t2 = t + (jnp.sum(rows, dtype=jnp.float32)
                      * 1e-12).astype(t.dtype)
            return t2, None
        out, _ = jax.lax.scan(body, folded_flat, None, length=n)
        return out
    return run


def chain_matmul(n):
    def run(patches, wf):
        def body(p, _):
            y = jnp.dot(p.reshape(B * V, -1), wf,
                        preferred_element_type=jnp.float32)
            p2 = p + (jnp.sum(y) * 1e-12).astype(p.dtype)
            return p2, None
        out, _ = jax.lax.scan(body, patches, None, length=n)
        return out
    return run


def main():
    from dpcr_agb_tpu.ops.dense_grid import scatter_to_dense
    from dpcr_agb_tpu.ops.sparse_stem import _fold_z
    coords, mask, x, wts = make_batch()
    dense, _ = jax.vmap(
        lambda cc, m, f: scatter_to_dense(cc, m, f, DIMS))(coords, mask, x)
    dense = jax.block_until_ready(dense)
    folded_flat = _fold_z(dense, K).reshape(-1, K * CIN)
    folded_flat = jax.block_until_ready(folded_flat)
    patches = jnp.asarray(
        np.random.default_rng(1).normal(size=(B, V, K * K * K * CIN)), DT)
    wf = wts.reshape(-1, COUT)

    r = {}
    r["scatter"] = timed_diff(chain_scatter, (x, coords, mask))
    print(f"scatter_to_dense (vmapped) : {r['scatter']:8.2f} ms")
    r["fold"] = timed_diff(chain_fold, (dense,))
    print(f"z-fold slices              : {r['fold']:8.2f} ms")
    r["patch_gather"] = timed_diff(chain_patch_gather,
                                   (folded_flat, coords, mask))
    print(f"patch gather [B,V,49]xC21  : {r['patch_gather']:8.2f} ms")
    r["matmul"] = timed_diff(chain_matmul, (patches, wf))
    print(f"patch matmul 1029x64       : {r['matmul']:8.2f} ms")
    import json
    print(json.dumps(r))
    scatter_probes()


# --- appended: scatter rates (pool formulation choice) ---------------------
def chain_scatter_combine(combine):
    def make(n):
        def run(table, idx, rows):
            def body(t, _):
                if combine == "add":
                    t2 = t.at[idx].add(rows, mode="drop")
                else:
                    t2 = t.at[idx].max(rows, mode="drop")
                return t2 * jnp.float32(1.0).astype(t.dtype), None
            out, _ = jax.lax.scan(body, table, None, length=n)
            return out
        return run
    return make


def scatter_probes():
    rng = np.random.default_rng(2)
    n_table = B * V
    for r_rows, c in [(2_000_000, 64), (6_900_000, 64)]:
        table = jnp.asarray(rng.normal(size=(n_table, c)), DT)
        idx = jnp.asarray(rng.integers(0, n_table, (r_rows,)), jnp.int32)
        rows = jnp.asarray(rng.normal(size=(r_rows, c)), DT)
        for comb in ("add", "max"):
            ms = timed_diff(chain_scatter_combine(comb), (table, idx, rows))
            print(f"scatter-{comb} {r_rows/1e6:.1f}M rows C{c}: "
                  f"{ms:8.2f} ms = {ms*1e6/r_rows:5.2f} ns/row")


if __name__ == "__main__":
    main()
