"""Fixed-shape batch assembly — the TPU replacement for the reference's
collate functions (datasets/batch.py SimpleBatch, PyG Batch).

Everything the jitted step consumes is a `Batch` of statically-shaped padded
arrays (SURVEY.md §7 decision 1):
  * dense point clouds:  pos [B,N,3], x [B,N,C], mask [B,N]
  * sparse voxel clouds: coords [B,V,3] int32 (PAD_COORD at padding), same
    x/mask layout — per-sample padding keeps the batch axis shardable across a
    data-parallel mesh.
Point/voxel counts are padded to bucket sizes (powers of two by default) so
XLA compiles one program per bucket, not per batch.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np

PAD_COORD = np.int32(-(2 ** 20))  # impossible voxel coordinate


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Batch:
    pos: Any                      # [B, N, 3] f32
    x: Any                        # [B, N, C] f32
    mask: Any                     # [B, N] bool
    y_reg: Any                    # [B, T] f32 (NaN = missing)
    y_reg_mask: Any               # [B, T] bool
    area_idx: Any                 # [B] i32
    label_idx: Any                # [B] i64
    is_double: Any                # [B] bool
    valid: Any = None             # [B] bool (False = batch-padding sample)
    coords: Any = None            # [B, N, 3] i32 (sparse models only)
    stats: Any = None             # [B, S] f32
    aux: Any = None               # model-specific precomputed arrays (e.g.
                                  # host-built level pyramids / kernel maps)

    def tree_flatten(self):
        fields = dataclasses.fields(self)
        children = tuple(getattr(self, f.name) for f in fields)
        return children, tuple(f.name for f in fields)

    @classmethod
    def tree_unflatten(cls, names, children):
        return cls(**dict(zip(names, children)))

    @property
    def batch_size(self) -> int:
        return self.pos.shape[0]

    @property
    def num_points(self) -> int:
        return self.pos.shape[1]


def bucket_size(n: int, buckets: Optional[Sequence[int]] = None,
                minimum: int = 256) -> int:
    """Smallest bucket >= n; default buckets are powers of two."""
    if buckets:
        for b in sorted(buckets):
            if n <= b:
                return int(b)
        return int(max(buckets))
    b = minimum
    while b < n:
        b *= 2
    return b


@dataclasses.dataclass
class CollateSpec:
    """Policy for batch assembly, derived from the model's conv_type + data cfg."""
    conv_type: str = "dense"              # dense | sparse
    num_points: Optional[int] = None      # fixed N (dense presets) or None
    buckets: Optional[Sequence[int]] = None
    min_bucket: int = 512
    use_coords: bool = False


def collate(samples: List[dict], spec: CollateSpec,
            pad_to_batch: Optional[int] = None,
            n_valid: Optional[int] = None) -> Batch:
    """Pad a list of transform-layer sample dicts into one fixed-shape Batch.
    pad_to_batch > len(samples) repeats the first sample into padding rows
    marked valid=False with all-False y_reg_mask (ragged final eval batches
    keep the jitted step's static shape). n_valid=0 with one template sample
    builds an all-padding batch (a multi-host process whose slice of the
    ragged final batch is empty must still execute the collective step)."""
    n_real = len(samples) if n_valid is None else n_valid
    if pad_to_batch is not None and pad_to_batch > len(samples):
        samples = list(samples) + [samples[0]] * (pad_to_batch - len(samples))
    bs = len(samples)
    counts = [s["pos"].shape[0] for s in samples]
    if spec.num_points is not None:
        n_pad = spec.num_points
        if max(counts) > n_pad:
            raise ValueError(f"sample with {max(counts)} points exceeds fixed "
                             f"num_points={n_pad}")
    else:
        n_pad = bucket_size(max(counts), spec.buckets, spec.min_bucket)

    c_dim = 0
    for s in samples:
        if s.get("x") is not None:
            c_dim = int(s["x"].shape[-1])
            break
    t_dim = 0
    for s in samples:
        if s.get("y_reg") is not None:
            t_dim = int(np.atleast_1d(s["y_reg"]).shape[-1])
            break

    pos = np.zeros((bs, n_pad, 3), dtype=np.float32)
    x = np.zeros((bs, n_pad, c_dim), dtype=np.float32)
    mask = np.zeros((bs, n_pad), dtype=bool)
    y_reg = np.full((bs, t_dim), np.nan, dtype=np.float32)
    y_reg_mask = np.zeros((bs, t_dim), dtype=bool)
    area_idx = np.zeros(bs, dtype=np.int32)
    label_idx = np.zeros(bs, dtype=np.int64)
    is_double = np.zeros(bs, dtype=bool)
    coords = None
    if spec.use_coords:
        coords = np.full((bs, n_pad, 3), PAD_COORD, dtype=np.int32)
    stats = None
    if samples[0].get("stats") is not None:
        stats = np.zeros((bs, len(np.atleast_1d(samples[0]["stats"]))),
                         dtype=np.float32)

    for i, s in enumerate(samples):
        n = counts[i]
        pos[i, :n] = s["pos"]
        mask[i, :n] = True
        if c_dim and s.get("x") is not None:
            x[i, :n] = s["x"]
        if t_dim and s.get("y_reg") is not None:
            y_reg[i] = np.atleast_1d(s["y_reg"])
            if s.get("y_reg_mask") is not None:
                y_reg_mask[i] = np.atleast_1d(s["y_reg_mask"])
            else:
                y_reg_mask[i] = ~np.isnan(y_reg[i])
        area_idx[i] = int(s.get("area_idx", 0))
        label_idx[i] = int(s.get("label_idx", i))
        is_double[i] = bool(s.get("is_double", False))
        if coords is not None:
            if "coords" not in s:
                raise ValueError("sparse collate requires quantized 'coords' "
                                 "(add GridSampling3D(quantize_coords=True))")
            coords[i, :n] = s["coords"]
        if stats is not None and s.get("stats") is not None:
            stats[i] = np.atleast_1d(s["stats"])

    valid = np.zeros(bs, dtype=bool)
    valid[:n_real] = True
    y_reg_mask[n_real:] = False  # padding samples never contribute to loss
    return Batch(pos=pos, x=x, mask=mask, y_reg=y_reg, y_reg_mask=y_reg_mask,
                 area_idx=area_idx, label_idx=label_idx, is_double=is_double,
                 valid=valid, coords=coords, stats=stats)


def encode_wire(batch: "Batch", drop_pos: bool = False,
                x_dtype=None) -> "Batch":
    """Shrink the host->device payload of a Batch without changing step
    math (decoded by training/step.decode_wire inside the jit):

      * coords int32 -> int16 on the wire. Every consumer only ever tests
        coords against [0, dims) with dims << 32767, so clipping to the
        int16 range maps any out-of-volume value (incl. PAD_COORD) to a
        value that is STILL out of volume — bit-identical drop semantics
        after the in-jit upcast.
      * x -> x_dtype (the model's compute dtype, e.g. bf16). Only valid
        when the model's first use is `x.astype(dtype)` with the same
        dtype: bf16->f32->bf16 round-trips exactly, so the step output is
        bit-identical to shipping f32.
      * pos dropped when the model never reads it (SparseResNet paths).

    At the bs16/16k sparse bench shape this cuts the batch from 9.7 to
    3.4 MB — on a remote-TPU transport (20-35 MB/s measured,
    docs/experiments/round3/sweep4.log h2d_only) H2D is the e2e
    bottleneck, and on real hardware it is still PCIe traffic saved."""
    repl = {}
    if batch.coords is not None and \
            np.asarray(batch.coords).dtype == np.int32:
        c = np.asarray(batch.coords)
        repl["coords"] = np.clip(c, -2 ** 15, 2 ** 15 - 1).astype(np.int16)
    if x_dtype is not None and batch.x is not None:
        x = np.asarray(batch.x)
        if x.dtype != x_dtype:
            repl["x"] = x.astype(x_dtype)
    if drop_pos and batch.pos is not None:
        repl["pos"] = None
    return dataclasses.replace(batch, **repl) if repl else batch


def normalize_sparse_rows(batch: "Batch", dims: Sequence[int]) -> "Batch":
    """Host-side row normalization for the dense-grid sparse-L0 path: drop
    out-of-volume voxels (the device scatters drop them anyway — reference
    semantics: the dense MinkowskiEngine tensor never sees them), then sort
    each sample's valid rows by flat grid key (x-major, z-minor) with all
    padding compacted to the tail.

    This establishes the layout contract the device scatters exploit under
    DPCR_SCATTER="sorted": per-sample row indices strictly increasing and
    unique (`lax.scatter(indices_are_sorted=True, unique_indices=True)`
    skips XLA's read-modify-write dedup machinery — 22.2 vs 29.2 ms for the
    64ch stem scatter at the bs16 bench shape,
    docs/experiments/round3/exp_scatter_flags.py). Uniqueness is the
    voxelizer's guarantee (transforms/core.unique_int_rows); violations are
    detected here and raised rather than silently producing undefined
    scatter results. ~1 ms/batch of numpy at the bs16/16k shape, amortized
    by the loader's prefetch threads."""
    pos = np.asarray(batch.pos)
    x = np.asarray(batch.x)
    mask = np.asarray(batch.mask)
    coords = np.asarray(batch.coords)
    d, h, w = (int(v) for v in dims)
    c = coords.astype(np.int64)
    in_b = ((c >= 0) & (c < np.array([d, h, w], np.int64))).all(-1)
    ok = mask & in_b
    key = (c[..., 0] * h + c[..., 1]) * w + c[..., 2]
    key = np.where(ok, key, np.iinfo(np.int64).max)
    order = np.argsort(key, axis=1, kind="stable")
    skey = np.take_along_axis(key, order, axis=1)
    mask2 = np.take_along_axis(ok, order, axis=1)
    if bool((
            (skey[:, 1:] == skey[:, :-1]) & mask2[:, 1:]).any()):
        raise ValueError(
            "duplicate voxel coords within a sample — upstream voxelization "
            "must produce unique rows (GridSampling3D quantize_coords)")
    coords2 = np.take_along_axis(coords, order[..., None], axis=1)
    coords2[~mask2] = PAD_COORD
    return dataclasses.replace(
        batch,
        pos=np.take_along_axis(pos, order[..., None], axis=1),
        x=np.take_along_axis(x, order[..., None], axis=1),
        mask=mask2, coords=coords2)
