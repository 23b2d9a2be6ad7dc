"""Micro-bench: fused Pallas L0 stem forward vs the production row stem,
at the bs32 bench shape (dims 88x88x80, V=16000, Cin=3, Cout=64, k=7).

Gates (docs/design/fused_l0_kernel.md): the sketch estimates fwd ~30-40 ms
for the WHOLE L0 fwd (conv+BN+pool); the conv piece alone must land well
under the current stem-fwd marginal for the path to stay alive. The x1
layout is expected ~7x folded-table read-amplified (~54 ms DMA bound);
xtile should cut that to ~2x fetched.

Usage: python fused_stem_micro.py [reps]
Writes one JSON line per variant to stdout (and fused_stem_micro.json).
"""
import json
import os
import sys
import time

os.environ.setdefault("DPCR_SCATTER", "sorted")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../../.."))
sys.path.insert(0, "/root/repo")

from dpcr_agb_tpu.ops.pallas_stem import fused_stem_conv_volume
from dpcr_agb_tpu.ops.sparse_stem import (_fold_zy, _scatter_to_dense_impl,
                                          stem_conv_sparse_batch)

B, DIMS, V, CIN, COUT, K = 32, (88, 88, 80), 16000, 3, 64, 7
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def make_batch(seed=0):
    rng = np.random.default_rng(seed)
    d, h, w = DIMS
    cs, ms, fs = [], [], []
    for _ in range(B):
        n = int(rng.integers(12000, V))
        flat = np.sort(rng.choice(d * h * w, size=n, replace=False))
        coords = np.stack([flat // (h * w), (flat // w) % h, flat % w], 1)
        out = np.zeros((V, 3), np.int32)
        out[:n] = coords
        mask = np.arange(V) < n
        f = rng.normal(size=(V, CIN)).astype(np.float32)
        f[~mask] = 0.0
        cs.append(out), ms.append(mask), fs.append(f)
    return (jnp.asarray(np.stack(cs)), jnp.asarray(np.stack(ms)),
            jnp.asarray(np.stack(fs), jnp.bfloat16))


def bench(name, fn, *args):
    try:
        f = jax.jit(fn)
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(*args))
        compile_s = time.perf_counter() - t0
        for _ in range(3):
            out = jax.block_until_ready(f(*args))
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = jax.block_until_ready(f(*args))
        ms = (time.perf_counter() - t0) / REPS * 1e3
        rec = {"variant": name, "ms": round(ms, 2),
               "compile_s": round(compile_s, 1)}
    except Exception as e:  # noqa: BLE001 — record OOM/VMEM failures
        rec = {"variant": name, "error": str(e)[:300]}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    coords, mask, feats = make_batch()
    w = jnp.asarray(
        np.random.default_rng(1).normal(size=(K ** 3, CIN, COUT)) * 0.1,
        jnp.float32)
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    recs = []

    def maybe(name, fn):
        if only is None or name in only:
            recs.append(bench(name, fn, coords, mask, feats))

    maybe("current_row_stem_fwd",
          lambda c, m, f: stem_conv_sparse_batch(
              c, m, f, DIMS, w, K, compute_dtype=jnp.bfloat16))
    maybe("fold_only_c4",
          lambda c, m, f: jax.lax.map(
              lambda a: _fold_zy(_scatter_to_dense_impl(
                  a[0], a[1], a[2].astype(jnp.bfloat16), DIMS)[0], K, K),
              (c.reshape(4, B // 4, V, 3), m.reshape(4, B // 4, V),
               f.reshape(4, B // 4, V, CIN))))
    for ty, chunks in ((22, 4), (8, 4)):
        maybe(f"fused_x1_ty{ty}_c{chunks}",
              lambda c, m, f, _ty=ty, _ch=chunks: fused_stem_conv_volume(
                  c, m, f, DIMS, w, K, compute_dtype=jnp.bfloat16,
                  ty=_ty, td=0, chunks=_ch)[0])
    for ty, chunks in ((88, 1), (44, 1), (22, 1), (44, 4), (22, 4),
                       (44, 2), (44, 8)):
        maybe(f"fused_rev_ty{ty}_c{chunks}",
              lambda c, m, f, _ty=ty, _ch=chunks: fused_stem_conv_volume(
                  c, m, f, DIMS, w, K, compute_dtype=jnp.bfloat16,
                  ty=_ty, td=-1, chunks=_ch)[0])
    for td, ty, chunks in ((8, 8, 4), (8, 22, 4), (11, 11, 4)):
        maybe(f"fused_xtile_td{td}_ty{ty}_c{chunks}",
              lambda c, m, f, _ty=ty, _td=td, _ch=chunks:
              fused_stem_conv_volume(
                  c, m, f, DIMS, w, K, compute_dtype=jnp.bfloat16,
                  ty=_ty, td=_td, chunks=_ch)[0])
    out = os.path.join(os.path.dirname(__file__), "fused_stem_micro.json")
    with open(out, "w") as fh:
        json.dump(recs, fh, indent=1)


if __name__ == "__main__":
    main()
