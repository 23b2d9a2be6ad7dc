"""Does the TPU scatter get faster when told indices are sorted+unique?

The L0 scatters (scatter3 14.1 ms, scatter64 55.9 ms chained at bs16 —
l0_micro.log) use `.at[].add(mode="drop")` on batch-flattened flat
indices. Production coords ARE per-sample sorted and unique
(transforms/core.unique_int_rows returns lexicographic order, flat index
is monotone in it), and padding rows sit at each sample's tail — so with
a per-sample dump region laid out AFTER each sample's cells
(stride s + v), the whole flattened index vector is globally sorted and
unique, and `lax.scatter_add(indices_are_sorted=True,
unique_indices=True)` is legal. This probe times, at the bench shape
(B=16, V=16000, dims 88x88x80):

  add4_base / add64_base     current .at[].add, dump row at table end
  add4_flags / add64_flags   sorted+unique lax.scatter_add, per-sample
                             dump region + the [:, :s] slice-out copy
  set64_flags                scatter (set) with flags — unique rows never
                             need read-modify-add semantics

Run ON THE REAL TPU:  python docs/experiments/round3/exp_scatter_flags.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.bench_protocol import timed_diff

B, V = 16, 16000
DIMS = (88, 88, 80)
DT = jnp.bfloat16


def make(seed, c):
    rng = np.random.default_rng(seed)
    d, h, w = DIMS
    coords = np.zeros((B, V, 3), np.int32)
    mask = np.zeros((B, V), bool)
    for b in range(B):
        flat = np.sort(rng.choice(d * h * w, size=V - 100, replace=False))
        cc = np.stack([flat // (h * w), (flat // w) % h, flat % w], 1)
        coords[b, : V - 100] = cc
        mask[b, : V - 100] = True
    x = rng.normal(size=(B, V, c)).astype(np.float32)
    x[~mask] = 0
    return jnp.asarray(coords), jnp.asarray(mask), jnp.asarray(x, DT)


def chain_base(c):
    from dpcr_agb_tpu.ops.sparse_stem import _scatter_to_dense_impl

    def factory(n):
        def run(x, coords, mask):
            def body(cr, _):
                dense, _ = _scatter_to_dense_impl(coords, mask, cr, DIMS)
                nxt = cr + (dense[:, 0, 0, 0, :] * 1e-9
                            )[:, None, :].astype(cr.dtype)
                return nxt, None
            out, _ = jax.lax.scan(body, x, None, length=n)
            return out
        return run
    return factory


def _scatter_sorted(coords, mask, feats, dims, use_set=False,
                    sorted_flag=True):
    """Per-sample [s + V] table layout -> globally sorted unique indices."""
    d, h, w = dims
    b, v = mask.shape
    s = d * h * w
    cc = jnp.clip(coords, 0, jnp.asarray([d - 1, h - 1, w - 1]))
    in_b = jnp.all((coords >= 0) & (coords < jnp.asarray([d, h, w])), -1)
    valid = mask & in_b
    idx = (cc[..., 0] * h + cc[..., 1]) * w + cc[..., 2]
    dump = s + jnp.broadcast_to(jnp.arange(v, dtype=idx.dtype), (b, v))
    idx = jnp.where(valid, idx, dump)
    idx = idx + (jnp.arange(b, dtype=idx.dtype) * (s + v))[:, None]
    payload = jnp.concatenate(
        [jnp.where(valid[..., None], feats, 0),
         valid[..., None].astype(feats.dtype)], axis=-1)
    table = jnp.zeros((b * (s + v), payload.shape[-1]), feats.dtype)
    dn = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1,), inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0,))
    op = jax.lax.scatter if use_set else jax.lax.scatter_add
    table = op(table, idx.reshape(-1, 1), payload.reshape(b * v, -1), dn,
               indices_are_sorted=sorted_flag, unique_indices=True)
    dense = table.reshape(b, s + v, -1)[:, :s].reshape(b, d, h, w, -1)
    return dense[..., :-1], dense[..., -1:]


def chain_flags(c, use_set=False, sorted_flag=True):
    def factory(n):
        def run(x, coords, mask):
            def body(cr, _):
                dense, _ = _scatter_sorted(coords, mask, cr, DIMS, use_set,
                                           sorted_flag)
                nxt = cr + (dense[:, 0, 0, 0, :] * 1e-9
                            )[:, None, :].astype(cr.dtype)
                return nxt, None
            out, _ = jax.lax.scan(body, x, None, length=n)
            return out
        return run
    return factory


CASES = {
    "add4_base": (chain_base(3), 3),
    "add4_flags": (chain_flags(3), 3),
    "add64_base": (chain_base(64), 64),
    "add64_flags": (chain_flags(64), 64),
    "set64_flags": (chain_flags(64, use_set=True), 64),
    # unique-only: no sortedness precondition — robust to out-of-bounds
    # rows redirected to the dump region mid-sequence
    "add4_uniq": (chain_flags(3, sorted_flag=False), 3),
    "set64_uniq": (chain_flags(64, use_set=True, sorted_flag=False), 64),
    "add64_uniq": (chain_flags(64, sorted_flag=False), 64),
}


def main():
    only = os.environ.get("DPCR_SCATTER_ONLY")
    if only:
        fac, c = CASES[only]
        coords, mask, x = make(0, c)
        print(json.dumps({only: timed_diff(fac, (x, coords, mask))}))
        return
    import subprocess
    r = {}
    for name in CASES:
        env = dict(os.environ, DPCR_SCATTER_ONLY=name)
        p = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, capture_output=True, text=True,
                           timeout=1800)
        line = (p.stdout.strip().splitlines() or ["{}"])[-1]
        try:
            r.update(json.loads(line))
            print(f"{name:12s}: {r[name]:8.2f} ms", flush=True)
        except (json.JSONDecodeError, KeyError):
            err = p.stderr.strip().splitlines()[-1][:120] if p.stderr else ""
            print(f"{name:12s}: FAILED rc={p.returncode} {err}", flush=True)
    print(json.dumps(r))


if __name__ == "__main__":
    main()
