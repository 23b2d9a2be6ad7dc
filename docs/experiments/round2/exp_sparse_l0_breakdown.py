"""Where does the sparse-L0 path spend its time on the real TPU?

First bench: DPCR_L0=sparse measured 22.7 plots/s vs 56.3 dense at bs16 —
2.5x SLOWER despite removing ~50x of stem FLOPs. Components under test
(bs16 x 16000-voxel cap x bench dims, bf16 rows):

  1. build_grid: vmapped argsort of [16k] keys
  2. downsample to L1 (second argsort)
  3. stem_conv_sparse forward / forward+dW
  4. pool_neighbor_map (scatter + folded index gather)
  5. max_pool_apply forward / forward+backward

Run ON THE REAL TPU: python docs/experiments/round2/exp_sparse_l0_breakdown.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.bench_protocol import timed_diff

B, V, CIN, COUT = 16, 16000, 3, 64
DIMS = (88, 88, 80)
DT = jnp.bfloat16


def make_batch(seed=0):
    rng = np.random.default_rng(seed)
    d, h, w = DIMS
    coords = np.zeros((B, V, 3), np.int32)
    mask = np.zeros((B, V), bool)
    for b in range(B):
        flat = rng.choice(d * h * w, size=V - 100, replace=False)
        c = np.stack([flat // (h * w), (flat // w) % h, flat % w], 1)
        coords[b, : V - 100] = np.sort(
            (c[:, 0].astype(np.int64) * h + c[:, 1]) * w + c[:, 2]
        )[:, None] // np.array([[h * w, w, 1]]) % np.array([[d, h, w]])
        mask[b, : V - 100] = True
    x = rng.normal(size=(B, V, CIN)).astype(np.float32)
    x[~mask] = 0
    wts = rng.normal(size=(343, CIN, COUT)).astype(np.float32) * 0.05
    return (jnp.asarray(coords), jnp.asarray(mask),
            jnp.asarray(x, DT), jnp.asarray(wts, DT))


def chain_build_grid(n):
    from dpcr_agb_tpu.ops.voxel import build_grid

    def run(coords, mask):
        def body(c, _):
            g = jax.vmap(build_grid)(c, mask)
            # real feedback (order parity jitters the next sort's input) so
            # XLA cannot dead-code the grid build
            return c + (g.order[:, :, None] % 2).astype(c.dtype), None
        out, _ = jax.lax.scan(body, coords, None, length=n)
        return out
    return run


def chain_downsample(n):
    from dpcr_agb_tpu.ops.voxel import build_grid, downsample

    def run(coords, mask):
        g0 = jax.vmap(build_grid)(coords, mask)

        def body(c, _):
            g0i = jax.vmap(build_grid)(c, mask)
            g1 = jax.vmap(lambda g: downsample(g, None, 2, V)[0])(g0i)
            return c + (g1.coords % 2), None
        out, _ = jax.lax.scan(body, coords, None, length=n)
        return out
    return run


def chain_stem_fwd(n):
    from dpcr_agb_tpu.ops.sparse_stem import stem_conv_sparse_batch

    def run(x, coords, mask, wts):
        def body(c, _):
            y = stem_conv_sparse_batch(coords, mask, c, DIMS, wts, 7,
                                       compute_dtype=DT)
            nxt = c + jnp.mean(y, axis=-1, keepdims=True).astype(c.dtype) * 1e-6
            return nxt, None
        out, _ = jax.lax.scan(body, x, None, length=n)
        return out
    return run


def chain_stem_fwd_dw(n):
    from dpcr_agb_tpu.ops.sparse_stem import stem_conv_sparse_batch

    def run(x, coords, mask, wts):
        def loss(wi, xi):
            y = stem_conv_sparse_batch(coords, mask, xi, DIMS, wi, 7,
                                       compute_dtype=DT)
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

        def body(c, _):
            wi, xi = c
            g = jax.grad(loss)(wi, xi)
            return (wi - g.astype(wi.dtype) * 1e-9, xi), None
        (wout, _), _ = jax.lax.scan(body, (wts, x), None, length=n)
        return wout
    return run


def chain_pool_map(n):
    from dpcr_agb_tpu.ops.sparse_stem import pool_neighbor_map_batch
    from dpcr_agb_tpu.ops.voxel import build_grid, downsample

    def run(coords, mask):
        g1 = jax.vmap(lambda c, m: downsample(build_grid(c, m), None, 2,
                                              V)[0])(coords, mask)

        def body(c, _):
            nbr = pool_neighbor_map_batch(c, mask, g1.coords, g1.mask, DIMS)
            return c + (nbr[:, :c.shape[1], :1] % 2), None
        out, _ = jax.lax.scan(body, coords, None, length=n)
        return out
    return run


def chain_pool_fwd_bwd(n):
    from dpcr_agb_tpu.ops.sparse_stem import (max_pool_sparse,
                                              pool_neighbor_map_batch)
    from dpcr_agb_tpu.ops.voxel import build_grid, downsample

    def run(h64, coords, mask):
        g1 = jax.vmap(lambda c, m: downsample(build_grid(c, m), None, 2,
                                              V)[0])(coords, mask)
        nbr = pool_neighbor_map_batch(coords, mask, g1.coords, g1.mask,
                                      DIMS)

        def loss(hi):
            y = max_pool_sparse(hi, nbr, g1.mask)
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

        def body(c, _):
            g = jax.grad(loss)(c)
            return c - g.astype(c.dtype) * 1e-9, None
        out, _ = jax.lax.scan(body, h64, None, length=n)
        return out
    return run


def main():
    coords, mask, x, wts = make_batch()
    h64 = jnp.asarray(
        np.random.default_rng(1).normal(size=(B, V, COUT)), DT)
    r = {}
    r["build_grid"] = timed_diff(chain_build_grid, (coords, mask))
    print(f"build_grid (argsort)      : {r['build_grid']:8.2f} ms")
    r["downsample"] = timed_diff(chain_downsample, (coords, mask))
    print(f"downsample to L1          : {r['downsample']:8.2f} ms")
    r["stem_fwd"] = timed_diff(chain_stem_fwd, (x, coords, mask, wts))
    print(f"sparse stem fwd           : {r['stem_fwd']:8.2f} ms")
    r["stem_fwd_dw"] = timed_diff(chain_stem_fwd_dw, (x, coords, mask, wts))
    print(f"sparse stem fwd+dW        : {r['stem_fwd_dw']:8.2f} ms")
    r["pool_map"] = timed_diff(chain_pool_map, (coords, mask))
    print(f"pool_neighbor_map         : {r['pool_map']:8.2f} ms")
    r["pool_fwd_bwd"] = timed_diff(chain_pool_fwd_bwd, (h64, coords, mask))
    print(f"pool fwd+bwd (gather max) : {r['pool_fwd_bwd']:8.2f} ms")
    import json
    print(json.dumps(r))


if __name__ == "__main__":
    main()
