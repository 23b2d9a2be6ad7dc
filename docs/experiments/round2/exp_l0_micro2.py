"""Op-level decomposition of the CURRENT default L0 section (sparse stem,
grouped fold g=7, dense pool) at the bench shape — the step breakdown
showed L0 + head = 221.8 ms of the 238.7 ms step (stages: 16.9 ms), so
every further win must come from here. Components timed under the honest
chained protocol (scripts/bench_protocol.py):

  scatter3      scatter_to_dense_batch of the Cin=3 features (fwd)
  fold_g7       _fold_zy(dense3, k=7, g=7) fwd — builds the 3.1 GB table
  gather7       the 7-wide-row patch gather from a prebuilt folded table
  stem_fwd      whole stem_conv_sparse_batch fwd
  stem_dw       stem fwd + dW (the model's actual backward: no dx to data)
  stem_dw_remat jax.checkpoint(stem): re-gather in backward instead of
                saving the 527 MB patch matrix for dW
  bn_gelu       MaskedBatchNorm + gelu on rows, fwd+param grads
  scatter64     scatter_to_dense_batch of the 64ch rows, fwd + dx
  occ_pool      occupancy_pool on the [B,D,H,W,1] volume
  pool_fwd      dense_max_pool fwd (prebuilt occupancies)
  pool_fb       dense_max_pool fwd + dx (select_and_scatter backward)
  l0_section    the exact model L0 branch + global pool head, value+grad
                (validates the decomposition against vg_layers0 = 221.8)

Run ON THE REAL TPU:  python docs/experiments/round2/exp_l0_micro2.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.bench_protocol import timed_diff

B = int(os.environ.get("DPCR_BENCH_BS", 16))
V, CIN, COUT = 16000, 3, 64
DIMS = (88, 88, 80)
DT = jnp.bfloat16


def make_batch(seed=0):
    rng = np.random.default_rng(seed)
    d, h, w = DIMS
    coords = np.zeros((B, V, 3), np.int32)
    mask = np.zeros((B, V), bool)
    for b in range(B):
        flat = np.sort(rng.choice(d * h * w, size=V - 100, replace=False))
        c = np.stack([flat // (h * w), (flat // w) % h, flat % w], 1)
        coords[b, : V - 100] = c
        mask[b, : V - 100] = True
    x = rng.normal(size=(B, V, CIN)).astype(np.float32)
    x[~mask] = 0
    wts = rng.normal(size=(343, CIN, COUT)).astype(np.float32) * 0.05
    return (jnp.asarray(coords), jnp.asarray(mask),
            jnp.asarray(x, DT), jnp.asarray(wts, DT))


def _dus_feedback(vol, scalar):
    """Serialize scan iterations by touching ONE row of `vol` with a value
    derived from this iteration's output — in-place inside the scan carry,
    so the feedback costs bytes(one row), not bytes(vol)."""
    upd = vol[:1, :1, :1, :1, :] + scalar.astype(vol.dtype)
    return jax.lax.dynamic_update_slice(vol, upd, (0, 0, 0, 0, 0))


def chain_scatter3(n):
    from dpcr_agb_tpu.ops.sparse_stem import scatter_to_dense_batch

    def run(x, coords, mask):
        def body(c, _):
            dense, occ = scatter_to_dense_batch(coords, mask, c, DIMS)
            nxt = c + (dense[:, 0, 0, 0, :] * 1e-9)[:, None, :].astype(c.dtype)
            return nxt, None
        out, _ = jax.lax.scan(body, x, None, length=n)
        return out
    return run


def chain_fold(n):
    from dpcr_agb_tpu.ops.sparse_stem import (_fold_zy,
                                              scatter_to_dense_batch)

    def run(x, coords, mask):
        dense, _ = scatter_to_dense_batch(coords, mask, x, DIMS)

        def body(c, _):
            t = _fold_zy(c, 7, 7)
            return _dus_feedback(c, jnp.mean(t[:, :1, :1, :1, :]) * 1e-9), None
        out, _ = jax.lax.scan(body, dense, None, length=n)
        return out
    return run


def chain_gather(n):
    from dpcr_agb_tpu.ops.sparse_stem import (_fold_zy, _patch_indices_grouped,
                                              batched_rows,
                                              scatter_to_dense_batch)

    def run(x, coords, mask):
        dense, _ = scatter_to_dense_batch(coords, mask, x, DIMS)
        folded = _fold_zy(dense, 7, 7)
        flat = folded.reshape(-1, folded.shape[-1])
        d, h, w = DIMS
        cc = jnp.clip(coords, 0, jnp.asarray([d - 1, h - 1, w - 1]))
        idx0 = _patch_indices_grouped(cc, DIMS, 7, 7)       # [B,V,7]

        # Carry the SMALL idx array (feedback = always-zero int derived
        # from this iteration's rows): serializes iterations without
        # duplicating the 3.1 GB folded table as a scan carry, which
        # OOM'ed the original table-carry chain (l0_micro.log).
        def body(idx, _):
            rows = batched_rows(flat, idx)
            fb = (jnp.mean(rows[:1, :1].astype(jnp.float32))
                  * 1e-9).astype(idx.dtype)
            return idx + fb, None
        out, _ = jax.lax.scan(body, idx0, None, length=n)
        return out
    return run


def chain_gather_mm(n):
    """gather7 + the patch matmul (no scatter/fold in the loop): isolates
    the stem's post-gather cost — patch-matrix materialization + the
    [BV,1029]x[1029,64] dot + epilogue."""
    from dpcr_agb_tpu.ops.sparse_stem import (_fold_zy, _grouped_weights,
                                              _patch_indices_grouped,
                                              batched_rows,
                                              scatter_to_dense_batch)

    def run(x, coords, mask, wts):
        dense, _ = scatter_to_dense_batch(coords, mask, x, DIMS)
        folded = _fold_zy(dense, 7, 7)
        flat = folded.reshape(-1, folded.shape[-1])
        d, h, w = DIMS
        cc = jnp.clip(coords, 0, jnp.asarray([d - 1, h - 1, w - 1]))
        idx0 = _patch_indices_grouped(cc, DIMS, 7, 7)
        wf = _grouped_weights(wts, 7, 7)
        b, v = mask.shape

        def body(idx, _):
            rows = batched_rows(flat, idx)
            y = jnp.dot(rows.reshape(b * v, -1), wf,
                        preferred_element_type=jnp.float32)
            fb = (jnp.mean(y[:1, :1]) * 1e-9).astype(idx.dtype)
            return idx + fb, None
        out, _ = jax.lax.scan(body, idx0, None, length=n)
        return out
    return run


def chain_stem_fwd(n):
    from dpcr_agb_tpu.ops.sparse_stem import stem_conv_sparse_batch

    def run(x, coords, mask, wts):
        def body(c, _):
            y = stem_conv_sparse_batch(coords, mask, c, DIMS, wts, 7,
                                       compute_dtype=DT)
            return c + (y[:, :, :1] * 1e-9).astype(c.dtype), None
        out, _ = jax.lax.scan(body, x, None, length=n)
        return out
    return run


def _stem_dw_chain(n, remat):
    from dpcr_agb_tpu.ops.sparse_stem import stem_conv_sparse_batch
    stem = stem_conv_sparse_batch
    if remat:
        stem = jax.checkpoint(
            lambda c, m, f, w: stem_conv_sparse_batch(
                c, m, f, DIMS, w, 7, compute_dtype=DT))

    def run(x, coords, mask, wts):
        def loss(wi):
            if remat:
                y = stem(coords, mask, x, wi)
            else:
                y = stem(coords, mask, x, DIMS, wi, 7, compute_dtype=DT)
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

        def body(wi, _):
            g = jax.grad(loss)(wi)
            return wi - g.astype(wi.dtype) * 1e-9, None
        out, _ = jax.lax.scan(body, wts, None, length=n)
        return out
    return run


def chain_stem_dw(n):
    return _stem_dw_chain(n, remat=False)


def chain_stem_dw_remat(n):
    return _stem_dw_chain(n, remat=True)


def chain_bn_gelu(n):
    from dpcr_agb_tpu.nn.norm import MaskedBatchNorm

    def run(h64, mask):
        bn = MaskedBatchNorm(COUT, momentum=0.1)
        variables = bn.init(jax.random.PRNGKey(0), h64, mask,
                            use_running_average=False)

        def loss(p, c):
            y, _ = bn.apply({"params": p,
                             "batch_stats": variables["batch_stats"]},
                            c, mask, use_running_average=False,
                            mutable=["batch_stats"])
            y = jax.nn.gelu(y) * mask[..., None].astype(y.dtype)
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

        def body(c, _):
            h, p = c
            gh, gp = jax.grad(loss, argnums=(1, 0))(p, h)
            return (h - gh.astype(h.dtype) * 1e-9,
                    jax.tree.map(lambda a, b: a - 1e-9 * b, p, gp)), None
        (hout, _), _ = jax.lax.scan(
            body, (h64, variables["params"]), None, length=n)
        return hout
    return run


def chain_scatter64(n):
    from dpcr_agb_tpu.ops.sparse_stem import scatter_to_dense_batch

    def run(h64, coords, mask):
        def loss(c):
            dense, occ = scatter_to_dense_batch(coords, mask, c, DIMS)
            return jnp.sum(dense.astype(jnp.float32) ** 2) * 1e-6

        def body(c, _):
            g = jax.grad(loss)(c)
            return c - g.astype(c.dtype) * 1e-9, None
        out, _ = jax.lax.scan(body, h64, None, length=n)
        return out
    return run


def chain_occ_pool(n):
    from dpcr_agb_tpu.ops.dense_grid import occupancy_pool
    from dpcr_agb_tpu.ops.sparse_stem import scatter_to_dense_batch

    def run(x, coords, mask):
        _, occ = scatter_to_dense_batch(coords, mask, x, DIMS)

        def body(c, _):
            p = occupancy_pool(c)
            return _dus_feedback(c, jnp.mean(p[:, :1, :1, :1, :]) * 1e-9), \
                None
        out, _ = jax.lax.scan(body, occ, None, length=n)
        return out
    return run


def _pool_chain(n, backward):
    from dpcr_agb_tpu.ops.dense_grid import dense_max_pool, occupancy_pool
    from dpcr_agb_tpu.ops.sparse_stem import scatter_to_dense_batch

    def run(h64, coords, mask):
        dense, occ = scatter_to_dense_batch(coords, mask, h64, DIMS)
        occ_l = occupancy_pool(occ)

        if backward:
            def loss(c):
                y = dense_max_pool(c, occ, occ_l)
                return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

            def body(c, _):
                g = jax.grad(loss)(c)
                return c - g.astype(c.dtype) * 1e-9, None
        else:
            def body(c, _):
                y = dense_max_pool(c, occ, occ_l)
                return _dus_feedback(
                    c, jnp.mean(y[:, :1, :1, :1, :]) * 1e-9), None
        out, _ = jax.lax.scan(body, dense, None, length=n)
        return out
    return run


def chain_pool_fwd(n):
    return _pool_chain(n, backward=False)


def chain_pool_fb(n):
    return _pool_chain(n, backward=True)


def chain_pool_fused(n):
    """scatter64 + occupancy_pool + maxpool fwd + ROW-SPACE custom bwd
    (ops/sparse_stem.pooled_rows_fused) — the round-3 candidate replacing
    scatter64(chain)+pool_fb: grad w.r.t. the ROWS, like the model."""
    from dpcr_agb_tpu.ops.sparse_stem import pooled_rows_fused

    def run(h64, coords, mask):
        def loss(c):
            y, _ = pooled_rows_fused(coords, mask, c, DIMS)
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

        def body(c, _):
            g = jax.grad(loss)(c)
            return c - g.astype(c.dtype) * 1e-9, None
        out, _ = jax.lax.scan(body, h64, None, length=n)
        return out
    return run


def chain_l0_section(n):
    """The exact _dense_forward sparse-L0 branch + sum-pool head,
    value+grad w.r.t. all params — should reproduce vg_layers0."""
    from dpcr_agb_tpu.nn.norm import MaskedBatchNorm
    from dpcr_agb_tpu.ops.dense_grid import dense_max_pool, occupancy_pool
    from dpcr_agb_tpu.ops.sparse_stem import (scatter_to_dense_batch,
                                              stem_conv_sparse_batch)

    def run(x, coords, mask, wts):
        bn = MaskedBatchNorm(COUT, momentum=0.1)
        h0 = stem_conv_sparse_batch(coords, mask, x, DIMS, wts, 7,
                                    compute_dtype=DT)
        variables = bn.init(jax.random.PRNGKey(0), h0, mask,
                            use_running_average=False)
        head_w = jnp.zeros((COUT, 2), DT)

        def loss(p):
            wi, bp, hw = p
            rows = stem_conv_sparse_batch(coords, mask, x, DIMS, wi, 7,
                                          compute_dtype=DT)
            y, _ = bn.apply({"params": bp,
                             "batch_stats": variables["batch_stats"]},
                            rows, mask, use_running_average=False,
                            mutable=["batch_stats"])
            y = jax.nn.gelu(y) * mask[..., None].astype(y.dtype)
            dense, occ = scatter_to_dense_batch(coords, mask, y, DIMS)
            occ_l = occupancy_pool(occ)
            pooled = dense_max_pool(dense, occ, occ_l)
            g = jnp.sum(pooled.astype(jnp.float32) *
                        (occ_l > 0).astype(jnp.float32), axis=(1, 2, 3))
            out = jnp.dot(g, hw.astype(jnp.float32))
            return jnp.sum(out ** 2) * 1e-6

        def body(c, _):
            g = jax.grad(loss)(c)
            return jax.tree.map(
                lambda a, b: a - 1e-9 * b.astype(a.dtype), c, g), None
        (wout, _, _), _ = jax.lax.scan(
            body, (wts, variables["params"], head_w), None, length=n)
        return wout
    return run


# name -> (chain factory, which args it takes)
CHAINS = {
    "scatter3": (chain_scatter3, "xcm"),
    "fold_g7": (chain_fold, "xcm"),
    "gather7": (chain_gather, "xcm"),
    "gather_mm": (chain_gather_mm, "xcmw"),
    "stem_fwd": (chain_stem_fwd, "xcmw"),
    "stem_dw": (chain_stem_dw, "xcmw"),
    "stem_dw_remat": (chain_stem_dw_remat, "xcmw"),
    "bn_gelu": (chain_bn_gelu, "hm"),
    "scatter64": (chain_scatter64, "hcm"),
    "occ_pool": (chain_occ_pool, "xcm"),
    "pool_fwd": (chain_pool_fwd, "hcm"),
    "pool_fb": (chain_pool_fb, "hcm"),
    "pool_fused": (chain_pool_fused, "hcm"),
    "l0_section": (chain_l0_section, "xcmw"),
}
POOL_SUBSET = ["pool_fwd", "pool_fb", "l0_section"]


def _run_one(name):
    coords, mask, x, wts = make_batch()
    h64 = jnp.asarray(
        np.random.default_rng(1).normal(size=(B, V, COUT)) *
        np.asarray(mask)[..., None], DT)
    pick = {"x": x, "c": coords, "m": mask, "w": wts, "h": h64}
    chain, argspec = CHAINS[name]
    return timed_diff(chain, tuple(pick[a] for a in argspec))


def main():
    only = os.environ.get("DPCR_L0_MICRO_ONLY")
    if only:
        # child mode: one chain in a fresh process (full-run OOM isolation)
        print(json.dumps({only: _run_one(only)}))
        return
    if os.environ.get("DPCR_L0_MICRO_POOL_ONLY"):
        names = POOL_SUBSET   # e.g. under DPCR_POOL_BWD=pallas
    else:
        names = list(CHAINS)
    # each chain in its own subprocess: one chain's executables + transient
    # tables can approach the 16 GB HBM alone (gather7 OOM'ed a shared run)
    import subprocess
    r = {}
    for name in names:
        env = dict(os.environ, DPCR_L0_MICRO_ONLY=name)
        p = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, capture_output=True, text=True,
                           timeout=1800)
        line = (p.stdout.strip().splitlines() or ["{}"])[-1]
        try:
            r.update(json.loads(line))
            print(f"{name:14s}: {r[name]:8.2f} ms", flush=True)
        except (json.JSONDecodeError, KeyError):
            print(f"{name:14s}: FAILED rc={p.returncode} "
                  f"{p.stderr.strip().splitlines()[-1][:120] if p.stderr else ''}",
                  flush=True)
    print(json.dumps(r))


if __name__ == "__main__":
    main()
