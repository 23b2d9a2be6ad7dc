"""Sparse level-0 execution: compute the stem conv + first maxpool ONLY at
occupied voxels, with dense volumes used purely as gather storage.

Motivation (round-2 sweep, docs/experiments/round2/README.md): the dense
k7 stem conv over the full 88x88x80 volume is the training step's dominant
op (~140 ms of 284 ms at bs16) yet the NFI occupancy at level 0 is ~2% —
and MinkowskiConvolution semantics (reference SENet.py stem,
MinkowskiEngine docs) only ever NEED outputs at occupied sites (the
dense path multiplies by `occ_out` right after the conv). Every XLA-level
reformulation of the dense conv lost in-model (z-fold, firewalled fold,
manual pool backward — all measured slower or OOM), so this module stops
paying for empty sites instead:

  1. scatter features to the dense [B,D,H,W,Cin] volume (tiny: Cin=3)
  2. fold z fully AND y in groups of g by shifted SLICES — the taps become
     channels (slicing is pure bandwidth); `_pick_group` sizes g under a
     transient-HBM budget (DPCR_FOLD_BYTES)
  3. ONE batch-flattened row gather of k*ceil(k/g) WIDE rows per site
     -> [B,V, >=k^3*Cin] patches (junk y-slots get zero weight rows)
  4. ONE MXU matmul against the grouped weight matrix

Empty cells hold zeros, which IS the conv semantics for missing
neighbors; dense-path parity is test-asserted (tests/test_sparse_stem.py)
including forced group budgets.

GATHER COST MODEL (measured on v5e, docs/experiments/round2/
exp_gather_scaling.py + exp_stem_micro.py): HBM row gathers cost a flat
~7-22 ns/ROW nearly independent of row width, and scatters ~16 ns/row —
so the formulation above minimizes ROW COUNT, not bytes. The naive
[B,V,49]-narrow-row gather measured 282 ms at bs16; grouping cuts rows
7x. All gathers go through one flat 2D row-gather over the
batch-flattened table (`batched_rows`).

The first maxpool (kernel 3, stride 2 — Minkowski MaxPool semantics as in
ops/dense_grid.dense_max_pool) has three modes (DPCR_SPARSE_POOL):
"dense" (default) scatters the BN'd/activated rows back to the volume
and uses reduce_window — its select_and_scatter backward measured
cheaper than row-space scatter-adds; "rows" builds a [B,V1,27] neighbor
map from a z+y-folded int32 row-index volume and maxes gathered rows
(max_pool_sparse), trading the volume for ~170 ms of gather/scatter at
bs16; "scattermax" (scatter_max_pool_batch) pools rows straight into the
L1 volume via a 1..8-parent scatter-max — no full-res 64ch volume, no
reduce_window, no select_and_scatter backward (2M scatter rows at bs16
vs a 1.3 GB volume round-trip). Whole-step bench: sparse L0 (g=4, dense
pool) 66.5 plots/s vs 56.3 dense at bs16; g=7 69.1.
"""
from __future__ import annotations

import logging
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import layout

logger = logging.getLogger(__name__)


def batched_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table [R,C], idx [...] flat int32 -> [..., C]: the TPU-fast flat
    2D row gather (see module docstring)."""
    return table[idx.reshape(-1)].reshape(*idx.shape, table.shape[-1])


def _per_sample(op_batch, n_arrays: int, *args):
    """Run a [B,...]-batched op as vmap of its b=1 form: the batch dim
    stays explicit through every scatter/gather, which GSPMD partitions
    over the data axis with zero communication (ops/layout.py). The first
    n_arrays args are batched arrays; the rest are static/shared."""
    arrays, rest = args[:n_arrays], args[n_arrays:]
    out = jax.vmap(lambda *a: op_batch(*[x[None] for x in a], *rest))(
        *arrays)
    return jax.tree.map(lambda y: y[:, 0], out)


def scatter_to_dense_batch(coords, mask, feats, dims):
    """[B,V,3]+[B,V]+[B,V,C] -> dense [B,D,H,W,C] + occupancy [B,D,H,W,1];
    batch-flattened or per-sample per ops/layout.py."""
    if layout.BATCH_LOCAL:
        return _per_sample(_scatter_to_dense_impl, 3, coords, mask, feats,
                           dims)
    return _scatter_to_dense_impl(coords, mask, feats, dims)


# DPCR_SCATTER: "flags" tells XLA the scatter rows are UNIQUE (voxelized
# coords are unique per sample — transforms/core.unique_int_rows — and
# invalid rows get DISTINCT per-sample dump slots), skipping the
# read-modify-write dedup machinery. "sorted" additionally claims
# indices_are_sorted — ONLY valid under the loader's row-layout contract
# (data/batch.normalize_sparse_rows: per-sample valid rows sorted by flat
# key, in-volume, unique, padding at tail — established by the dense-path
# post_collate on every production path; measured 22.2 (sorted) vs 37.3
# (unique-only) vs 29.2 (legacy add) ms for the 64ch stem scatter,
# docs/experiments/round3/exp_scatter_flags.py + sweep4). "legacy" is the
# round-2 .at[].add form and assumes nothing.
SCATTER_MODE = os.environ.get("DPCR_SCATTER", "legacy")


def _scatter_to_dense_impl(coords: jnp.ndarray, mask: jnp.ndarray,
                           feats: jnp.ndarray, dims: Sequence[int],
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batch-flattened scatter_to_dense: one flat row scatter instead of a
    vmapped per-sample one (same ~2x row-rate rule as gathers; the vmapped
    form measured 14 ms at bs16 for the Cin=3 stem scatter).
    [B,V,3]+[B,V]+[B,V,C] -> dense [B,D,H,W,C] + occupancy [B,D,H,W,1].

    Occupancy is scattered SEPARATELY into a 1-D table rather than fused
    as a C+1-th payload channel: a [N, C+1] bf16 table is lane-padded to
    128 by the TPU (8,128) tiling, so at C=64 the fused form DOUBLED the
    table's zero-init/write/read traffic and extracting the occupancy
    channel re-read the whole table (round-3 profile: slice.91 = 7.6 ms
    at bs16 just to slice channel 65). The 1-D occ scatter adds B*V row
    ops against ~3 full-table passes of saved bandwidth.

    Duplicate VALID coords sum in legacy mode; under SCATTER_MODE="flags"
    they are undefined (unique_indices=True) — voxelization upstream
    guarantees uniqueness on every production path."""
    d, h, w = dims
    b, v = mask.shape
    s = d * h * w
    c = jnp.clip(coords, 0, jnp.asarray([d - 1, h - 1, w - 1]))
    in_bounds = jnp.all((coords >= 0) & (coords < jnp.asarray([d, h, w])),
                        axis=-1)
    valid = mask & in_bounds
    flat_idx = (c[..., 0] * h + c[..., 1]) * w + c[..., 2]
    payload = jnp.where(valid[..., None], feats, 0)
    occ_val = valid.astype(feats.dtype)
    if SCATTER_MODE in ("flags", "sorted"):
        # per-sample layout [s + V]: invalid row i dumps to slot s+i, so
        # ALL indices are unique, and under the normalize_sparse_rows
        # contract (valid rows sorted with padding at the tail, no
        # mid-sequence OOB) also globally sorted — which only the "sorted"
        # mode promises to XLA
        dump = s + jnp.broadcast_to(
            jnp.arange(v, dtype=flat_idx.dtype), (b, v))
        idx = jnp.where(valid, flat_idx, dump)
        idx = idx + (jnp.arange(b, dtype=idx.dtype) * (s + v))[:, None]
        table = jnp.zeros((b * (s + v), payload.shape[-1]), feats.dtype)
        dn = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(1,), inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0,))
        sorted_ = SCATTER_MODE == "sorted"
        table = jax.lax.scatter(
            table, idx.reshape(-1, 1), payload.reshape(b * v, -1), dn,
            indices_are_sorted=sorted_, unique_indices=True)
        dense = table.reshape(b, s + v, -1)[:, :s].reshape(b, d, h, w, -1)
        otab = jnp.zeros((b * (s + v),), feats.dtype)
        dn1 = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(), inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0,))
        otab = jax.lax.scatter(
            otab, idx.reshape(-1, 1), occ_val.reshape(-1), dn1,
            indices_are_sorted=sorted_, unique_indices=True)
        occ = otab.reshape(b, s + v)[:, :s].reshape(b, d, h, w, 1)
        return dense, occ
    flat_idx = flat_idx + (jnp.arange(b, dtype=flat_idx.dtype) * s)[:, None]
    flat_idx = jnp.where(valid, flat_idx, b * s)                # dump row
    table = jnp.zeros((b * s + 1, payload.shape[-1]), feats.dtype)
    table = table.at[flat_idx.reshape(-1)].add(
        payload.reshape(b * v, -1), mode="drop")
    dense = table[: b * s].reshape(b, d, h, w, -1)
    otab = jnp.zeros((b * s + 1,), feats.dtype)
    otab = otab.at[flat_idx.reshape(-1)].add(occ_val.reshape(-1),
                                             mode="drop")
    occ = otab[: b * s].reshape(b, d, h, w, 1)
    return dense, occ


def _fold_z(vol: jnp.ndarray, k: int, pad_value=0) -> jnp.ndarray:
    """[B,D,H,W,C] -> [B,D+2p,H+2p,W,k*C]: pad all spatial dims by p, then
    turn the k z(=W)-taps into channels (z fastest, matching the hypercube
    offset order of ops/voxel.hypercube_offsets)."""
    p = k // 2
    w = vol.shape[3]
    xp = jnp.pad(vol, ((0, 0), (p, p), (p, p), (p, p), (0, 0)),
                 constant_values=pad_value)
    return jnp.concatenate([xp[:, :, :, i:i + w] for i in range(k)], axis=-1)


# HBM row gathers cost a flat ~7-9 ns/ROW on v5e regardless of row width
# (docs/experiments/round2/exp_gather_scaling.py), so the patch gather is
# engineered for MINIMUM ROW COUNT: fold z fully AND y in groups of `g`
# into channels, so each site needs only k * ceil(k/g) gathered rows
# (g=k: 7 rows of 294 B vs 49 rows of 42 B — 7x fewer rows for the same
# bytes). The folded table costs B*(D+2p)*H2*W*g*k*C bytes of transient
# HBM; _pick_group picks the largest g under the budget `_fold_budget()`
# = DPCR_FOLD_BYTES if set, else 22% of the device HBM limit (= the
# tuned 3.5 GB at the v5e's 15.75 GiB: admits g=7 at the bs16 bench
# shape — 3.1 GB fold, measured 69.1 vs 66.5 plots/s at g=4 — while
# bigger shapes degrade into _auto_chunks chunking, never an OOM).
FOLD_BYTES_BUDGET = int(os.environ.get("DPCR_FOLD_BYTES", 0))


def _fold_budget() -> int:
    if FOLD_BYTES_BUDGET:
        return FOLD_BYTES_BUDGET
    from .membudget import hbm_bytes_limit
    return int(0.22 * hbm_bytes_limit())

# Process the stem's fold+gather in this many batch sub-chunks (lax.map):
# the folded table is TRANSIENT, so chunking divides its HBM footprint by
# the chunk count — which in turn lets _pick_group keep g=k (fewest gather
# rows) at batch sizes whose full-batch fold would blow the budget (bs32
# degraded to g=2 in round 2; chunked bs32 measured 65.7 vs 58.9 plots/s).
# Row count is unchanged; only table residency shrinks. Must divide the
# batch size. 0 (default) = AUTO: the smallest divisor of the batch that
# restores the full group size g=k, or no chunking if none helps.
FOLD_CHUNKS = int(os.environ.get("DPCR_FOLD_CHUNKS", 0))


def _auto_chunks(k: int, cin: int, dims, b: int, itemsize: int) -> int:
    """Smallest chunk count (a divisor of b, leaving >1 sample per chunk)
    whose per-chunk batch admits the full fold group g=k under the HBM
    budget; 1 (unchunked) when the full batch already folds at g=k or no
    divisor reaches it (a partial-g improvement never repays the lax.map
    serialization of the two big gathers)."""
    if _pick_group(k, cin, dims, b, itemsize) == k:
        return 1
    for c in range(2, b // 2 + 1):
        if b % c == 0 and b // c > 1 \
                and _pick_group(k, cin, dims, b // c, itemsize) == k:
            return c
    return 1


def _fold_geometry(h: int, k: int, g: int) -> Tuple[int, int]:
    """(extra y pad e, folded y-extent h2) for a y-group fold of size g.

    When g does not divide k, the last group's row for a site at y starts
    at folded row y + (ceil(k/g)-1)*g, which exceeds the plain
    h + 2p - (g-1) extent by e = ceil(k/g)*g - k rows at the top y border
    — so the z-folded tensor gets e extra zero rows appended on the high-y
    side before folding (the taps past k in that last group carry zero
    weight rows, so the padding value never reaches the output)."""
    p = k // 2
    e = -(-k // g) * g - k
    return e, h + 2 * p + e - (g - 1)


def _pick_group(k: int, cin: int, dims, b: int, itemsize: int) -> int:
    d, h, w = dims
    p = k // 2
    # the traced b is the GLOBAL batch; the fold table lives per device
    b = -(-b // layout.DATA_PARALLEL_DEGREE)
    for g in range(k, 0, -1):
        _, h2 = _fold_geometry(h, k, g)
        nbytes = b * (d + 2 * p) * h2 * w * g * k * cin * itemsize
        if nbytes <= _fold_budget():
            return g
    return 1


def _fold_zy(vol: jnp.ndarray, k: int, g: int, pad_value=0) -> jnp.ndarray:
    """z-fold then fold g consecutive y-taps into channels: out[a, b, w]
    covers y-taps dy in [0, g) relative to row b of the (extra-padded)
    z-folded tensor. Shape [B, D+2p, h2, W, g*k*C] with h2 per
    `_fold_geometry` (includes the non-divisor extra pad e)."""
    t = _fold_z(vol, k, pad_value)
    if g == 1:
        return t
    e, h2 = _fold_geometry(vol.shape[2], k, g)
    if e:
        t = jnp.pad(t, ((0, 0), (0, 0), (0, e), (0, 0), (0, 0)),
                    constant_values=pad_value)
    return jnp.concatenate([t[:, :, dy:dy + h2] for dy in range(g)], axis=-1)


def _patch_indices_grouped(coords: jnp.ndarray, dims, k: int, g: int,
                           ) -> jnp.ndarray:
    """Flat row indices [B,V, k*ceil(k/g)] into the batch-flattened zy-folded
    table for the (dx, y-group) taps per site. coords pre-clipped."""
    d, h, w = dims
    p = k // 2
    n_g = -(-k // g)
    _, h2 = _fold_geometry(h, k, g)
    b = coords.shape[0]
    base = (coords[..., 0] * h2 + coords[..., 1]) * w + coords[..., 2]
    base = base + (jnp.arange(b, dtype=base.dtype)
                   * ((d + 2 * p) * h2 * w))[:, None]
    dx, j = np.meshgrid(np.arange(k), np.arange(n_g), indexing="ij")
    off = (dx.ravel() * h2 + j.ravel() * g) * w              # [k*n_g]
    return base[:, :, None] + jnp.asarray(off, base.dtype)[None, None, :]


def _grouped_weights(weights: jnp.ndarray, k: int, g: int) -> jnp.ndarray:
    """[K^3,Cin,Cout] hypercube weights -> [k*n_g*g*k*Cin, Cout] matching
    the grouped patch layout (dy slots >= k are junk -> zero rows)."""
    cin, cout = weights.shape[-2], weights.shape[-1]
    n_g = -(-k // g)
    w5 = weights.reshape(k, k, k, cin, cout)
    if n_g * g > k:
        w5 = jnp.concatenate(
            [w5, jnp.zeros((k, n_g * g - k, k, cin, cout), w5.dtype)],
            axis=1)
    return w5.reshape(k * n_g * g * k * cin, cout)


def _patch_indices(coords: jnp.ndarray, dims: Sequence[int], k: int,
                   ) -> jnp.ndarray:
    """Flat row indices [B,V,k*k] into the batch-flattened z-folded volume
    ([B,D+2p,H+2p,W,kC] -> [(B*(D+2p)*(H+2p)*W), kC]) covering the k^2
    (dx,dy) taps per site. coords must be pre-clipped to the volume."""
    d, h, w = dims
    p = k // 2
    hp = h + 2 * p
    b = coords.shape[0]
    base = (coords[..., 0] * hp + coords[..., 1]) * w + coords[..., 2]
    base = base + (jnp.arange(b, dtype=base.dtype)
                   * ((d + 2 * p) * hp * w))[:, None]
    dx, dy = np.meshgrid(np.arange(k), np.arange(k), indexing="ij")
    off = (dx.ravel() * hp + dy.ravel()) * w                    # [k*k]
    return base[:, :, None] + jnp.asarray(off, base.dtype)[None, None, :]


def stem_conv_sparse_batch(coords: jnp.ndarray, mask: jnp.ndarray,
                           feats: jnp.ndarray, dims: Sequence[int],
                           weights: jnp.ndarray, kernel_size: int,
                           compute_dtype=jnp.float32) -> jnp.ndarray:
    """Sparse-site stem conv for a whole batch: same math as
    ops/dense_grid.dense_conv followed by gather_from_dense at `coords`
    (stride 1). coords [B,V,3] int32, mask [B,V], feats [B,V,Cin];
    weights [K^3,Cin,Cout] in hypercube order (z fastest).
    Returns [B,V,Cout] in compute_dtype (MXU f32 accumulate -> cast,
    mirroring dense_conv)."""
    cout = weights.shape[-1]
    b, v = mask.shape
    itemsize = np.dtype(compute_dtype).itemsize
    k = kernel_size
    if STEM_MODE == "knockout":
        # MEASUREMENT-ONLY standin (center tap): kills the scatter/fold/
        # gather pipeline but keeps shapes, masking, and dW alive so the
        # whole-step marginal cost of the real stem = bench(real) -
        # bench(knockout). Never a production mode — wrong math by design.
        y = jnp.dot(feats.astype(compute_dtype),
                    weights[k ** 3 // 2].astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        return jnp.where(mask[..., None], y, 0.0).astype(compute_dtype)
    if STEM_MODE == "conv2d":
        # dense conv2d path: no fold table, no chunking transients (the
        # z-folded tensor is k*cin channels, ~0.8 GB bf16 at bs32/z80)
        if layout.BATCH_LOCAL:
            return _per_sample(_stem_conv_core_conv2d, 3, coords, mask,
                               feats, dims, weights, k, compute_dtype)
        return _stem_conv_core_conv2d(coords, mask, feats, dims, weights,
                                      k, compute_dtype)
    if layout.BATCH_LOCAL:
        # group size from the true per-device batch (b=1 inside the vmap
        # lane would overestimate the budget headroom)
        g = _pick_group(k, feats.shape[-1], dims, b, itemsize)
        if STEM_MODE == "xminor" and g == k:
            return _per_sample(_stem_conv_core_xminor, 3, coords, mask,
                               feats, dims, weights, k, compute_dtype)
        return _per_sample(_stem_conv_core, 3, coords, mask, feats, dims,
                           weights, k, compute_dtype, g)
    chunks = FOLD_CHUNKS
    if chunks == 0:
        chunks = _auto_chunks(k, feats.shape[-1], dims, b, itemsize)
    logger.info(
        "stem fold plan: b=%d dims=%s budget=%.2fGB -> chunks=%d g=%d",
        b, tuple(dims), _fold_budget() / 1e9, chunks,
        _pick_group(k, feats.shape[-1], dims, b // max(1, chunks),
                    itemsize))
    # the xminor core NEEDS the full y-fold (g=k); its table is the same
    # size as the grouped g=k table, so the g=k budget check doubles as
    # its feasibility gate — degrade to the grouped path otherwise
    core = _stem_conv_core
    if STEM_MODE == "xminor" and _pick_group(
            k, feats.shape[-1], dims, b // chunks, itemsize) == k:
        core = _stem_conv_core_xminor
    if chunks > 1:
        if b % chunks != 0 or b == chunks:
            raise ValueError(
                f"DPCR_FOLD_CHUNKS={chunks} must divide the batch "
                f"size (got {b}) and leave >1 sample per chunk — refusing "
                "to fall back silently (the unchunked fold has a different "
                "memory/group-size profile)")
        bc = b // chunks
        if os.environ.get("DPCR_FOLD_UNROLL", "") == "1":
            # inline the chunks instead of lax.map: the round-5 bs32
            # profile put the stem's while loop at 153.7 ms with
            # ~58 ms-class copy-starts at its boundaries (loop-invariant
            # re-staging). A barrier chains chunk i+1 on chunk i's output
            # so the fold-table transients stay serialized (same peak
            # memory), while XLA may overlap the boundary copies.
            outs = []
            prev = None
            for ci in range(chunks):
                sl = slice(ci * bc, (ci + 1) * bc)
                cc_, mm, ff = coords[sl], mask[sl], feats[sl]
                if prev is not None:
                    # data-dependence on the previous chunk's result
                    ff, _ = jax.lax.optimization_barrier((ff, prev))
                yci = core(cc_, mm, ff, dims, weights, kernel_size,
                           compute_dtype)
                prev = yci
                outs.append(yci)
            return jnp.concatenate(outs, axis=0)
        y = jax.lax.map(
            lambda args: core(
                args[0], args[1], args[2], dims, weights, kernel_size,
                compute_dtype),
            (coords.reshape(chunks, bc, v, 3),
             mask.reshape(chunks, bc, v),
             feats.reshape(chunks, bc, v, -1)))
        return y.reshape(b, v, cout)
    return core(coords, mask, feats, dims, weights, kernel_size,
                compute_dtype)


def _stem_conv_core(coords, mask, feats, dims, weights, kernel_size,
                    compute_dtype, g=None):
    k = kernel_size
    cin, cout = weights.shape[-2], weights.shape[-1]
    d, h, w = dims
    b, v = mask.shape
    dense, _ = _scatter_to_dense_impl(coords, mask,
                                      feats.astype(compute_dtype), dims)
    if g is None:
        g = _pick_group(k, cin, dims, b, np.dtype(compute_dtype).itemsize)
    n_g = -(-k // g)
    folded = _fold_zy(dense, k, g)
    flat = folded.reshape(-1, g * k * cin)
    cc = jnp.clip(coords, 0, jnp.asarray([d - 1, h - 1, w - 1]))
    idx = _patch_indices_grouped(cc, dims, k, g)               # [B,V,k·n_g]
    rows = batched_rows(flat, idx)                             # [...,gkC]
    patches = rows.reshape(b * v, k * n_g * g * k * cin)
    wf = _grouped_weights(weights, k, g).astype(patches.dtype)
    y = jnp.dot(patches, wf,
                preferred_element_type=jnp.float32).reshape(b, v, cout)
    return jnp.where(mask[..., None], y, 0.0).astype(compute_dtype)


def _stem_conv_core_conv2d(coords, mask, feats, dims, weights, kernel_size,
                           compute_dtype):
    """DENSE reformulation of the stem (DPCR_STEM=conv2d): scatter with z
    as the leading spatial axis, fold the k z-taps into channels (zero
    pad — missing neighbors ARE zeros, the conv semantics), then ONE XLA
    conv2d over (x, y) with Cin = k*cin and z folded into the batch, and
    finally gather the rows at the occupied sites.

    Rationale: the grouped-gather path is HBM-row-rate-bound (~153 ms
    marginal at bs32); this trades its fold-table + 7-row/site gather +
    row scatter-add backward for ~39x redundant MXU FLOPs (2.6 TFLOP fwd
    at bs32/z80 vs 67 GFLOP at occupied sites) that the idle MXU may
    absorb — XLA's own 3D conv at Cin=3 measured 4.7% MFU (round 2), but
    after the z-fold the conv2d sees Cin=k*cin=21 and a clean implicit
    im2col K of k^2*21 = 1029. Whether XLA's conv2d fwd/bwd kernels beat
    the row physics is a bench question (round-5 perf session); math
    parity with _stem_conv_core is test-asserted."""
    k = kernel_size
    cin, cout = weights.shape[-2], weights.shape[-1]
    d, h, w = dims
    b, v = mask.shape
    p = k // 2
    # [B, W(z), D(x), H(y), cin]: permute coord columns, not volumes
    dense, _ = _scatter_to_dense_impl(
        coords[..., jnp.asarray([2, 0, 1])], mask,
        feats.astype(compute_dtype), (w, d, h))
    zp = jnp.pad(dense, ((0, 0), (p, p), (0, 0), (0, 0), (0, 0)))
    # z-taps as channels, z fastest within (dz, cin) — matches the
    # hypercube weight order after the (dx, dy) spatial split below
    zf = jnp.concatenate([zp[:, i:i + w] for i in range(k)], axis=-1)
    x2d = zf.reshape(b * w, d, h, k * cin)
    w4 = weights.reshape(k, k, k * cin, cout).astype(x2d.dtype)
    # no preferred_element_type=f32: it would make the conv OUTPUT f32 and
    # autodiff would then feed an f32 cotangent to the transposed conv
    # against the bf16 kernel (dtype-mismatch TypeError). TPU bf16 convs
    # accumulate in f32 on the MXU natively, so the result still rounds
    # f32->bf16 once, matching the grouped core's epilogue.
    y2d = jax.lax.conv_general_dilated(
        x2d, w4, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(compute_dtype)
    yv = y2d.reshape(b * w * d * h, cout)
    cc = jnp.clip(coords, 0, jnp.asarray([d - 1, h - 1, w - 1]))
    idx = ((cc[..., 2] + (jnp.arange(b, dtype=coords.dtype) * w)[:, None])
           * d + cc[..., 0]) * h + cc[..., 1]
    y = batched_rows(yv, idx)
    return jnp.where(mask[..., None], y, 0.0).astype(compute_dtype)


def _stem_conv_core_xminor(coords, mask, feats, dims, weights, kernel_size,
                           compute_dtype):
    """x-minor reformulation of `_stem_conv_core` (DPCR_STEM=xminor):
    scatter into [B,H,W,D,C] (x MINOR-most spatial axis), fold z fully and
    y fully (g=k) so the k dx-rows of a site are k CONSECUTIVE flat table
    rows, then view the table as rows of k*(k*k*Cin) — each site's whole
    k^3 patch lies inside TWO consecutive wide rows (the x-extent is
    padded to a multiple of k so wide rows never straddle an x-run).

    Row count drops k/2-fold vs the grouped gather (2 wide rows vs k) —
    and HBM row gathers are ROW-count-bound, not byte-bound (module
    docstring cost model). The per-site alignment shift s = base % k is
    absorbed into the matmul: ONE [BV, 2k^3 Cin] x [2k^3 Cin, k*Cout]
    product against k shifted copies of the grouped weights (zeros
    elsewhere), and a one-hot reduction picks each site's shift lane —
    k x the stem FLOPs, which the MXU has to spare (the grouped path is
    gather-bound at ~3% MXU utilization).

    Same math as _stem_conv_core (parity-tested bit-exactly on CPU):
    missing neighbors read zeros; out-of-volume coords are dropped by the
    scatter and masked rows return 0."""
    k = kernel_size
    cin, cout = weights.shape[-2], weights.shape[-1]
    d, h, w = dims
    b, v = mask.shape
    p = k // 2
    # [B,H,W,D,C]: permute the coord columns instead of transposing volumes
    dense, _ = _scatter_to_dense_impl(coords[..., jnp.asarray([1, 2, 0])],
                                      mask, feats.astype(compute_dtype),
                                      (h, w, d))
    dp = -(-(d + 2 * p) // k) * k              # x-extent, multiple of k
    xp = jnp.pad(dense, ((0, 0), (p, p), (p, p), (p, dp - d - p), (0, 0)))
    # Fold x in ALIGNED groups of k FIRST (cheapest tensor), then z, then
    # y fully — the table is BORN with k*k*k*Cin-wide rows, never
    # reshaped across the lane axis (a [N,kkC] -> [N/k, k^3 C] reshape is
    # a full-table relayout copy on TPU tiled layouts: the v1 xminor core
    # measured 87.8 ms vs grouped 80.8 because of it). Channel nesting
    # after the three folds is (dy, dz, dxg, c), dy major.
    t = jnp.concatenate([xp[:, :, :, j::k] for j in range(k)], axis=-1)
    t = jnp.concatenate([t[:, :, i:i + w] for i in range(k)], axis=-1)
    h2 = h + 2 * p - (k - 1)
    t = jnp.concatenate([t[:, dy:dy + h2] for dy in range(k)], axis=-1)
    row_w = k * k * k * cin
    wide = t.reshape(-1, row_w)                # [B*h2*w*(dp/k), k^3 Cin]
    wide = jnp.concatenate(
        [wide, jnp.zeros((1, row_w), wide.dtype)], axis=0)
    cc = jnp.clip(coords, 0, jnp.asarray([d - 1, h - 1, w - 1]))
    x = cc[..., 0]
    wide0 = ((cc[..., 1] * w) + cc[..., 2]) * (dp // k) + x // k
    wide0 = wide0 + (jnp.arange(b, dtype=wide0.dtype)
                     * (h2 * w * (dp // k)))[:, None]
    s = (x % k).reshape(-1)                                     # [BV]
    g2 = batched_rows(wide, jnp.stack([wide0, wide0 + 1], axis=-1))
    patches = g2.reshape(b * v, 2 * row_w)
    # k shifted weight layouts in one [2 k^3 Cin, k*Cout] matrix: for
    # shift s, tap (dx,dy,dz) lives in wide-row r=(s+dx)//k at channel
    # (dy, dz, (s+dx)%k, c) — a static permutation of the hypercube
    # weights (z fastest = dz minor within the (dy,dz) nesting).
    w5 = weights.reshape(k, k, k, cin, cout)            # (dx, dy, dz, c)
    wbig = jnp.zeros((2, k, k, k, cin, k, cout), weights.dtype)
    for si in range(k):
        for dx in range(k):
            r, dxg = divmod(si + dx, k)
            wbig = wbig.at[r, :, :, dxg, :, si, :].set(w5[dx])
    wbig = wbig.reshape(2 * row_w, k * cout).astype(patches.dtype)
    y_all = jnp.dot(patches, wbig, preferred_element_type=jnp.float32)
    lane = (s[:, None] == jnp.arange(k))[..., None]             # [BV,k,1]
    y = jnp.sum(jnp.where(lane, y_all.reshape(b * v, k, cout), 0.0),
                axis=1).reshape(b, v, cout)
    return jnp.where(mask[..., None], y, 0.0).astype(compute_dtype)


# DPCR_STEM: "grouped" (round-2 default: k-row grouped gather) or
# "xminor" (2-wide-row gather + shift-lane matmul, _stem_conv_core_xminor)
STEM_MODE = os.environ.get("DPCR_STEM", "grouped")


def pool_neighbor_map_batch(coords0, mask0, coords1, mask1, dims):
    if layout.BATCH_LOCAL:
        return _per_sample(_pool_neighbor_map_impl, 4, coords0, mask0,
                           coords1, mask1, dims)
    return _pool_neighbor_map_impl(coords0, mask0, coords1, mask1, dims)


def _pool_neighbor_map_impl(coords0: jnp.ndarray, mask0: jnp.ndarray,
                            coords1: jnp.ndarray, mask1: jnp.ndarray,
                            dims: Sequence[int]) -> jnp.ndarray:
    """[B,V1,27] LOCAL row indices into each sample's level-0 rows for the
    Minkowski MaxPool (kernel 3, stride 2) window around 2*u; V0 = shadow.

    Built from a dense int32 row-index volume (z-folded like the stem):
    one flat scatter + one batch-flattened [B,V1,9]-row gather — no
    per-offset searchsorted. Out-of-bounds level-0 coords never enter any
    window (scatter_to_dense_batch drop semantics)."""
    d, h, w = dims
    b, v0 = mask0.shape
    s = d * h * w
    # out-of-bounds coords are DROPPED, matching scatter_to_dense_batch
    in_vol = jnp.all((coords0 >= 0) & (coords0 < jnp.asarray([d, h, w])),
                     axis=-1)
    mask0 = mask0 & in_vol
    cc = jnp.clip(coords0, 0, jnp.asarray([d - 1, h - 1, w - 1]))
    flat_idx = (cc[..., 0] * h + cc[..., 1]) * w + cc[..., 2]
    gidx = flat_idx + (jnp.arange(b, dtype=flat_idx.dtype) * s)[:, None]
    gidx = jnp.where(mask0, gidx, b * s)                        # dump slot
    row_of = jnp.full((b * s + 1,), v0, jnp.int32)
    local = jnp.broadcast_to(jnp.arange(v0, dtype=jnp.int32)[None], (b, v0))
    row_of = row_of.at[gidx.reshape(-1)].set(local.reshape(-1), mode="drop")
    vol = row_of[: b * s].reshape(b, d, h, w, 1)
    folded = _fold_zy(vol, 3, 3, pad_value=v0)                  # [..., 9]
    flat = folded.reshape(-1, 9)
    c1 = jnp.clip(coords1 * 2, 0, jnp.asarray([d - 1, h - 1, w - 1]))
    idx = _patch_indices_grouped(c1, dims, 3, 3)                # [B,V1,3]
    rows = batched_rows(flat, idx)                              # [B,V1,3,9]
    nbr = rows.reshape(b, coords1.shape[1], 27)
    return jnp.where(mask1[..., None], nbr, v0)


def max_pool_sparse(h_rows, nbr, mask1):
    if layout.BATCH_LOCAL:
        return _per_sample(_max_pool_sparse_impl, 3, h_rows, nbr, mask1)
    return _max_pool_sparse_impl(h_rows, nbr, mask1)


def _max_pool_sparse_impl(h_rows: jnp.ndarray, nbr: jnp.ndarray,
                          mask1: jnp.ndarray) -> jnp.ndarray:
    """Masked max over gathered level-0 rows: h_rows [B,V,C], nbr [B,V1,27]
    local indices (V = shadow) -> [B,V1,C]. Shadow rows contribute -inf;
    sites with no real neighbor (can't happen for true L1 sites) and
    masked rows return 0. Backward is the gather's scatter-add."""
    b, v, c = h_rows.shape
    padded = jnp.concatenate(
        [h_rows, jnp.full((b, 1, c), -jnp.inf, h_rows.dtype)], axis=1)
    flat = padded.reshape(b * (v + 1), c)
    idx = nbr + (jnp.arange(b, dtype=nbr.dtype) * (v + 1))[:, None, None]
    g = batched_rows(flat, idx)                                 # [B,V1,27,C]
    out = jnp.max(g, axis=2)
    any_real = jnp.any(nbr < v, axis=-1)
    return jnp.where((any_real & mask1)[..., None], out, 0.0)


def scatter_max_pool_batch(coords, mask, h_rows, dims):
    if layout.BATCH_LOCAL:
        return _per_sample(_scatter_max_pool_impl, 3, coords, mask, h_rows,
                           dims)
    return _scatter_max_pool_impl(coords, mask, h_rows, dims)


def _scatter_max_pool_impl(coords: jnp.ndarray, mask: jnp.ndarray,
                           h_rows: jnp.ndarray, dims: Sequence[int],
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Minkowski MaxPool (kernel 3, stride 2) evaluated as ONE scatter-max
    from L0 rows directly into the L1 volume — no full-resolution volume,
    no reduce_window, no select_and_scatter backward.

    Each L0 site x contributes to the L1 sites u with |x - 2u|_inf <= 1,
    i.e. u_d in {x_d//2, (x_d+1)//2} per axis: 1..8 parents (8 static
    slots; duplicate slots where the two parents coincide are masked so
    the scatter-max VJP cannot double-route through identical updates).
    A companion channel rides along: a stride indicator scattered only in
    the all-lo slot (= x//2 = Minkowski's output-site set), whose cell max
    reproduces occupancy_pool exactly.

    Returns (pooled [B,d1,h1,w1,C] masked to occupied output sites,
    occ [B,d1,h1,w1,1]). Gradient note: exact value ties between
    DIFFERENT rows in one window split the cotangent across all
    maximizers (scatter-max VJP) where select_and_scatter picks one —
    measure-zero for real activations; the parity test uses distinct
    values."""
    d, h, w = dims
    d1, h1, w1 = -(-d // 2), -(-h // 2), -(-w // 2)
    b, v = mask.shape
    c = h_rows.shape[-1]
    s1 = d1 * h1 * w1
    # out-of-bounds coords are DROPPED, matching scatter_to_dense_batch
    # (the dense reference never sees them either)
    in_vol = jnp.all((coords >= 0) & (coords < jnp.asarray([d, h, w])),
                     axis=-1)
    mask = mask & in_vol
    cc = jnp.clip(coords, 0, jnp.asarray([d - 1, h - 1, w - 1]))
    lo = cc // 2                                   # ceil((x-1)/2) = x//2
    hi = (cc + 1) // 2                             # floor((x+1)/2)
    us, valids = [], []
    for bits in range(8):
        pick = [(bits >> a) & 1 for a in range(3)]
        u = jnp.stack([jnp.where(pick[a] == 1, hi[..., a], lo[..., a])
                       for a in range(3)], axis=-1)        # [B,V,3]
        dup = jnp.zeros(mask.shape, bool)
        for a in range(3):
            if pick[a]:
                dup = dup | (hi[..., a] == lo[..., a])
        in_b = jnp.all(u < jnp.asarray([d1, h1, w1]), axis=-1)
        us.append(u)
        valids.append(mask & in_b & ~dup)
    u8 = jnp.stack(us, axis=2)                              # [B,V,8,3]
    valid = jnp.stack(valids, axis=2)                       # [B,V,8]
    flat = (u8[..., 0] * h1 + u8[..., 1]) * w1 + u8[..., 2]
    flat = flat + (jnp.arange(b, dtype=flat.dtype) * s1)[:, None, None]
    flat = jnp.where(valid, flat, b * s1)                   # dump row
    stride_one = ((jnp.arange(8) == 0)[None, None, :] & mask[..., None]
                  ).astype(h_rows.dtype)                    # [B,V,8]
    payload = jnp.concatenate(
        [jnp.broadcast_to(h_rows[:, :, None, :], (b, v, 8, c)),
         stride_one[..., None]], axis=-1)
    payload = jnp.where(valid[..., None], payload,
                        jnp.asarray(-jnp.inf, h_rows.dtype))
    table = jnp.full((b * s1 + 1, c + 1), -jnp.inf, h_rows.dtype)
    table = table.at[flat.reshape(-1)].max(
        payload.reshape(b * v * 8, c + 1), mode="drop")
    dense = table[: b * s1].reshape(b, d1, h1, w1, c + 1)
    occ = (dense[..., -1:] > 0).astype(h_rows.dtype)
    occ = jax.lax.stop_gradient(occ)
    pooled = jnp.where(occ > 0, dense[..., :c], 0.0)
    return pooled, occ


def _pool_parents(coords, mask, dims):
    """Shared L0-row -> L1-parent enumeration for the Minkowski MaxPool
    (kernel 3, stride 2): each L0 site x lies in the window of the L1
    sites u with |x - 2u|_inf <= 1, i.e. u_d in {x_d//2, (x_d+1)//2} per
    axis — 1..8 parents in 8 static slots (duplicates masked).
    Returns (flat [B,V,8] row indices into the batch-flattened L1 grid
    with b*s1 as the dump row, valid [B,V,8], s1)."""
    d, h, w = dims
    d1, h1, w1 = -(-d // 2), -(-h // 2), -(-w // 2)
    b = mask.shape[0]
    s1 = d1 * h1 * w1
    in_vol = jnp.all((coords >= 0) & (coords < jnp.asarray([d, h, w])),
                     axis=-1)
    mask = mask & in_vol
    cc = jnp.clip(coords, 0, jnp.asarray([d - 1, h - 1, w - 1]))
    lo = cc // 2
    hi = (cc + 1) // 2
    us, valids = [], []
    for bits in range(8):
        pick = [(bits >> a) & 1 for a in range(3)]
        u = jnp.stack([jnp.where(pick[a] == 1, hi[..., a], lo[..., a])
                       for a in range(3)], axis=-1)
        dup = jnp.zeros(mask.shape, bool)
        for a in range(3):
            if pick[a]:
                dup = dup | (hi[..., a] == lo[..., a])
        in_b = jnp.all(u < jnp.asarray([d1, h1, w1]), axis=-1)
        us.append(u)
        valids.append(mask & in_b & ~dup)
    u8 = jnp.stack(us, axis=2)                              # [B,V,8,3]
    valid = jnp.stack(valids, axis=2)                       # [B,V,8]
    flat = (u8[..., 0] * h1 + u8[..., 1]) * w1 + u8[..., 2]
    flat = flat + (jnp.arange(b, dtype=flat.dtype) * s1)[:, None, None]
    return jnp.where(valid, flat, b * s1), valid, s1


def pooled_rows_fused(coords, mask, h_rows, dims):
    """scatter64 + occupancy_pool + dense maxpool, fused at the VJP level.

    Forward: bit-identical to the SPARSE_POOL_MODE="dense" branch (scatter
    rows to the full-res volume, reduce_window k3/s2, mask by pooled
    occupancy) — that forward measured cheapest in round 2. Backward:
    instead of select_and_scatter producing a full-res [B,D,H,W,C]
    cotangent volume that the scatter's VJP then re-gathers at coords, the
    L1 cotangents are routed straight to the rows: gather each row's 1..8
    parent L1 cells (ONE [B,V,8] row gather of the concatenated [y|ct]
    table, via _pool_parents) and accumulate ct where the row's value
    equals the window max (f32 accumulate). 2M gathered rows at bs16
    replace the 1.27 GB select_and_scatter + its residual volume.

    Tie semantics: a value tie between DIFFERENT rows in one window splits
    the cotangent across all maximizers where select_and_scatter picks one
    — measure-zero for real activations (same contract as
    scatter_max_pool_batch; parity tests use distinct values). Empty L1
    cells carry ct=0 so their y=0 rows can never route anything.

    Returns (pooled [B,d1,h1,w1,C], occ_l [B,d1,h1,w1,1] — occupancy is
    gradient-free, matching occupancy_pool's stop_gradient)."""
    from .dense_grid import POOL_FWD_MODE
    if POOL_FWD_MODE == "knockout":
        # MEASUREMENT-ONLY standin (bypasses the custom VJP entirely):
        # broadcast each sample's row mean into the L1 volume — no
        # scatter, no window max, plain-autodiff backward. Keeps shapes
        # and a live grad path to h_rows so the whole-step marginal cost
        # of the real pool = bench(real) - bench(knockout). Wrong math by
        # design; never a production mode.
        d, h, w = dims
        d1, h1, w1 = -(-d // 2), -(-h // 2), -(-w // 2)
        mean = jnp.mean(h_rows, axis=1)                     # [B,C]
        y = jnp.broadcast_to(mean[:, None, None, None, :],
                             (mask.shape[0], d1, h1, w1, h_rows.shape[-1]))
        occ_l = jax.lax.stop_gradient(
            jnp.ones((mask.shape[0], d1, h1, w1, 1), h_rows.dtype))
        return y, occ_l
    b, v = mask.shape
    c = h_rows.shape[-1]
    chunks = _pool_fwd_chunk_count(b, v, tuple(dims), c,
                                   np.dtype(h_rows.dtype).itemsize)
    if chunks > 1:
        # the forward's full-res scatter table is b*(s+v) lane-padded rows
        # of TRANSIENT HBM (b=64 f32 at the NFI z-extent = 26 GB — the
        # round-4 calibration compile OOM); lax.map over batch sub-chunks
        # divides it like the fold/pool-bwd tables, same row count
        cb = b // chunks
        logger.info(
            "pool-fwd plan: b=%d table %.2fGB over budget %.2fGB -> "
            "chunks=%d", b,
            _pool_fwd_table_bytes(b, v, tuple(dims), c,
                                  np.dtype(h_rows.dtype).itemsize) / 1e9,
            _pool_fwd_budget() / 1e9, chunks)

        def split(x):
            return x.reshape(chunks, cb, *x.shape[1:])

        y, occ_l = jax.lax.map(
            lambda a: pooled_rows_fused(a[0], a[1], a[2], dims),
            (split(coords), split(mask), split(h_rows)))
        return (y.reshape(b, *y.shape[2:]),
                occ_l.reshape(b, *occ_l.shape[2:]))
    if layout.BATCH_LOCAL:
        return _per_sample(_pooled_rows_fused, 3, coords, mask, h_rows,
                           tuple(dims))
    return _pooled_rows_fused(coords, mask, h_rows, tuple(dims))


# The pool forward's dense scatter table ([b*(s+v), C] payload rows, lane-
# aligned at C=64, + the 1-D occupancy table)
# is the step's single biggest transient at full resolution;
# budget it like the fold table so batch growth (BN calibration at the
# reference's batch 64, README.md:164-170) degrades into chunking instead
# of an OOM. DPCR_POOL_FWD_BYTES overrides; default 45% of device HBM
# admits the unchunked bs32/z104 bf16 table (6.73 GB) that the benched
# training path uses.
POOL_FWD_BYTES = int(os.environ.get("DPCR_POOL_FWD_BYTES", 0))


def _pool_fwd_budget() -> int:
    if POOL_FWD_BYTES:
        return POOL_FWD_BYTES
    from .membudget import hbm_bytes_limit
    return int(0.45 * hbm_bytes_limit())


def _pool_fwd_table_bytes(b: int, v: int, dims, c: int,
                          itemsize: int) -> int:
    from .dense_grid import POOL_FWD_MODE
    d, h, w = dims
    s = d * h * w
    if POOL_FWD_MODE == "scattermax":                # L1-resolution table
        s = -(-d // 2) * -(-h // 2) * -(-w // 2)
    # occupancy is a separate 1-D table (1 lane-row per site); the payload
    # table is exactly C channels wide (lane-aligned at C=64)
    lanes = -(-c // 128) * 128                       # TPU T(8,128) padding
    return b * (s + v) * (lanes + 1) * itemsize


def _pool_fwd_chunk_count(b: int, v: int, dims, c: int,
                          itemsize: int) -> int:
    budget = _pool_fwd_budget()
    per = _pool_fwd_table_bytes(1, v, dims, c, itemsize)
    for n in range(1, b + 1):
        if b % n == 0 and (b // n) * per <= budget:
            return n
    return b


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(3,))
def _pooled_rows_fused(coords, mask, h_rows, dims):
    return _pooled_rows_fwd(coords, mask, h_rows, dims)[0]


def _pooled_rows_fwd(coords, mask, h_rows, dims):
    from .dense_grid import POOL_FWD_MODE, dense_max_pool_xla, occupancy_pool
    if POOL_FWD_MODE == "scattermax":
        # rows straight into the L1 volume — no full-res 65ch volume at all
        y, occ_l = _scatter_max_pool_impl(coords, mask, h_rows, dims)
    else:
        hv, occ_v = _scatter_to_dense_impl(coords, mask, h_rows, dims)
        occ_l = occupancy_pool(occ_v)
        y = dense_max_pool_xla(hv, occ_v, occ_l,
                               separable=POOL_FWD_MODE == "separable")
    return (y, occ_l), (coords, mask, h_rows, y, occ_l)


# DPCR_POOL_BWD_GATHER: how the fused pool VJP fetches each row's 8
# parent (y, ct) cells. "slots8" (round-3 initial form) gathers 8 narrow
# rows per site = 2.05M rows at bs16; "cube" exploits that the 8 parents
# are a 2x2x2 block of ADJACENT L1 cells at corner coords//2, so an
# overlap-folded table (8 shifted concats — pure bandwidth, ~2.5 GB
# transient at bs16) turns the fetch into ONE wide row per site = 256k
# rows. HBM gathers are row-count-bound (~8-22 ns/row regardless of
# width, module docstring), so cube trades ~6 ms of streaming for ~20 ms
# of row-rate. Identical math: junk cells (dup/OOB slots) are masked by
# the same `valid` the slots8 form uses.
#
# "auto" (default) picks by the traced batch extent: slots8 wins at bs16
# (72.33 vs 69.63 plots/s) but COLLAPSES at bs32 (36.31 vs cube's 68.81 —
# its [B,V,8,2C] f32 intermediate leaves the HBM working set; sweep4/5
# A/Bs, docs/experiments/round3/README.md), so auto = cube when the
# per-call batch exceeds 16. BATCH_LOCAL (mesh) calls see b=1 per vmap
# lane and resolve to slots8.
POOL_BWD_GATHER = os.environ.get("DPCR_POOL_BWD_GATHER", "auto")

# The cube table is [B,d1,h1,w1,16C] and XLA holds its 8 shifted slice
# operands alive alongside it (the optimization_barrier keeps the concat
# materialized on purpose), so the backward's transient peak is ~2x the
# table. At the paper-protocol dims (bs32, NFI z-extent 104 -> L1 grid
# 44x44x52, C=64) that is 2 x 6.14 GiB — the round-3 dress-rehearsal OOM
# ("Used 15.95G of 15.75G", docs/experiments/round3/sweep7.log). When
# the peak exceeds `_pool_bwd_budget()` (DPCR_POOL_BWD_BYTES if set,
# else 60% of device HBM) the backward runs in lax.map batch chunks:
# the table is transient, so chunking divides the peak by the chunk
# count at unchanged gather-row count (same argument as FOLD_CHUNKS).
# DPCR_POOL_BWD_CHUNKS forces a chunk count (0 = derive from budget).
POOL_BWD_BYTES = int(os.environ.get("DPCR_POOL_BWD_BYTES", 0))
POOL_BWD_CHUNKS = int(os.environ.get("DPCR_POOL_BWD_CHUNKS", 0))


def _pool_bwd_budget() -> int:
    if POOL_BWD_BYTES:
        return POOL_BWD_BYTES
    from .membudget import hbm_bytes_limit
    return int(0.60 * hbm_bytes_limit())


def _pool_bwd_chunk_count(b: int, peak_bytes: int) -> int:
    """Smallest divisor of b whose per-chunk transient peak fits the
    budget (1 = unchunked; b = per-sample always fits at NFI scales)."""
    if POOL_BWD_CHUNKS:
        return POOL_BWD_CHUNKS
    budget = _pool_bwd_budget()
    if peak_bytes <= budget:
        return 1
    for n in range(2, b + 1):
        if b % n == 0 and peak_bytes // n <= budget:
            return n
    return b


def _pool_bwd_rows(coords, mask, h_rows, y, ctm, dims, mode):
    """Route L1 cotangents back to the rows for one (sub-)batch: gather
    each row's 8 parent (y, ct) cells and accumulate ct where the row's
    value equals the window max. `mode` picks the fetch shape (cube =
    one wide row/site off an overlap-folded table; slots8 = 8 narrow
    rows/site)."""
    b, v = mask.shape
    c = h_rows.shape[-1]
    flat, valid, s1 = _pool_parents(coords, mask, dims)
    if mode == "cube":
        d, h, w = dims
        d1, h1, w1 = -(-d // 2), -(-h // 2), -(-w // 2)
        tab = jnp.concatenate([y, ctm], axis=-1)        # [B,d1,h1,w1,2C]
        tp = jnp.pad(tab, ((0, 0), (0, 1), (0, 1), (0, 1), (0, 0)))
        # slot `bits` (bit a <-> axis a, set = hi parent) reads cell
        # lo + (bit0,bit1,bit2); hi==lo slots read a junk neighbor that
        # `valid` masks (they are exactly the dup-masked slots)
        cube = jnp.concatenate(
            [tp[:, (bits & 1):(bits & 1) + d1,
                ((bits >> 1) & 1):((bits >> 1) & 1) + h1,
                ((bits >> 2) & 1):((bits >> 2) & 1) + w1]
             for bits in range(8)], axis=-1)            # [...,16C]
        # keep the folded table materialized: fusing the concat into the
        # gather would decompose it back into 8 narrow row-gathers
        cube = jax.lax.optimization_barrier(cube)
        cc = jnp.clip(coords, 0, jnp.asarray([d - 1, h - 1, w - 1]))
        lo = cc // 2
        base = (lo[..., 0] * h1 + lo[..., 1]) * w1 + lo[..., 2]
        base = base + (jnp.arange(b, dtype=base.dtype) * s1)[:, None]
        g = batched_rows(cube.reshape(b * s1, 16 * c), base)
        g = g.reshape(b, v, 8, 2 * c)
    else:
        tab = jnp.concatenate([y, ctm], axis=-1).reshape(b * s1, 2 * c)
        tab = jnp.concatenate([tab, jnp.zeros((1, 2 * c), tab.dtype)],
                              axis=0)
        g = batched_rows(tab, flat)                         # [B,V,8,2C]
    eq = (g[..., :c] == h_rows[:, :, None, :]) & valid[..., None]
    dx = jnp.sum(jnp.where(eq, g[..., c:].astype(jnp.float32), 0.0), axis=2)
    return jnp.where(mask[..., None], dx, 0.0).astype(h_rows.dtype)


def _pooled_rows_bwd(dims, res, cts):
    coords, mask, h_rows, y, occ_l = res
    ct_y, _ = cts                      # occupancy output is gradient-free
    b, v = mask.shape
    c = h_rows.shape[-1]
    ctm = jnp.where(occ_l > 0, ct_y, 0).astype(y.dtype)
    mode = POOL_BWD_GATHER
    if mode == "auto":
        mode = "cube" if b > 16 else "slots8"
    chunks = 1
    if mode == "cube":
        d1, h1, w1 = (-(-dims[0] // 2), -(-dims[1] // 2), -(-dims[2] // 2))
        cube_bytes = b * d1 * h1 * w1 * 16 * c * np.dtype(y.dtype).itemsize
        chunks = _pool_bwd_chunk_count(b, 2 * cube_bytes)
        logger.info(
            "pool-bwd plan: mode=cube b=%d L1=%dx%dx%d C=%d table=%.2fGB "
            "peak~%.2fGB budget=%.2fGB -> chunks=%d", b, d1, h1, w1, c,
            cube_bytes / 1e9, 2 * cube_bytes / 1e9,
            _pool_bwd_budget() / 1e9, chunks)
    if chunks > 1 and b % chunks != 0:
        raise ValueError(
            f"DPCR_POOL_BWD_CHUNKS={chunks} must divide the batch size "
            f"(got {b})")
    if chunks > 1:
        bc = b // chunks
        if os.environ.get("DPCR_FOLD_UNROLL", "") == "1":
            # see stem_conv_sparse_batch: inline chunks + barrier instead
            # of lax.map (round-5 profile: the pool-bwd while = 57.8 ms)
            outs = []
            prev = None
            for ci in range(chunks):
                sl = slice(ci * bc, (ci + 1) * bc)
                hh = h_rows[sl]
                if prev is not None:
                    hh, _ = jax.lax.optimization_barrier((hh, prev))
                d = _pool_bwd_rows(coords[sl], mask[sl], hh, y[sl],
                                   ctm[sl], dims, mode)
                prev = d
                outs.append(d)
            dx = jnp.concatenate(outs, axis=0)
        else:
            def split(x):
                return x.reshape(chunks, bc, *x.shape[1:])

            dx = jax.lax.map(
                lambda a: _pool_bwd_rows(*a, dims, mode),
                (split(coords), split(mask), split(h_rows), split(y),
                 split(ctm)))
            dx = dx.reshape(b, v, c)
    else:
        dx = _pool_bwd_rows(coords, mask, h_rows, y, ctm, dims, mode)
    f0 = jax.dtypes.float0
    return (np.zeros(coords.shape, f0), np.zeros(mask.shape, f0), dx)


_pooled_rows_fused.defvjp(_pooled_rows_fwd, _pooled_rows_bwd)


# ---- per-sample wrappers (parity-test surface) -----------------------------

def stem_conv_sparse(coords: jnp.ndarray, mask: jnp.ndarray,
                     feats: jnp.ndarray, dims: Sequence[int],
                     weights: jnp.ndarray, kernel_size: int,
                     stride: int = 1,
                     compute_dtype=jnp.float32) -> jnp.ndarray:
    """Single-sample stem_conv_sparse_batch (tests; the model uses the
    batched form directly)."""
    if stride != 1:
        raise NotImplementedError("sparse stem supports stride 1 "
                                  "(NFI presets); dense path covers "
                                  "first_stride=2 archs")
    return stem_conv_sparse_batch(coords[None], mask[None], feats[None],
                                  dims, weights, kernel_size,
                                  compute_dtype)[0]


def pool_neighbor_map(coords0: jnp.ndarray, mask0: jnp.ndarray,
                      coords1: jnp.ndarray, mask1: jnp.ndarray,
                      dims: Sequence[int]) -> jnp.ndarray:
    """Single-sample pool map in ops/voxel.max_pool_apply layout [27, V1]."""
    nbr = pool_neighbor_map_batch(coords0[None], mask0[None],
                                  coords1[None], mask1[None], dims)[0]
    return jnp.swapaxes(nbr, 0, 1)
