"""Sparse voxel-grid engine — the TPU-native replacement for MinkowskiEngine
(reference modules/MinkowskiEngine/*, SURVEY.md §7 stage 5 "the hard core").

Representation (per sample, fully static shapes):
  * coords [V,3] int32 in units of the current tensor stride, mask [V] bool
  * a `VoxelGrid` caches the sorted linear keys + permutation so every conv /
    pool at the same resolution reuses one argsort

Algorithms (all jit/vmap-friendly, no host round-trips — unlike the
reference's hash-map kernel maps):
  * linear key packing: 10 bits/axis (coords in [-512, 511])
  * downsampling: sort -> segment-ids -> scatter (unique + pooled features)
  * kernel maps: probe key = stride*out + offset, binary search into the
    sorted key array (jnp.searchsorted), missing -> shadow row V (zero
    feature, mirroring neighbors.cpp:202 / blocks.py:383 semantics)
  * convolution: gather neighbor features per kernel offset -> one matmul per
    offset chunk on the MXU, accumulated with lax.scan

Kernel offsets are generated in MinkowskiEngine's "hypercube" order
(common.py:51-212); for odd kernel size k the region is centered:
offsets in [-(k//2), k//2]^3 in input-stride units.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

COORD_BITS = 10
COORD_OFFSET = 1 << (COORD_BITS - 1)          # 512
SENTINEL_KEY = jnp.int32(1 << (3 * COORD_BITS))  # sorts after all valid keys
SHADOW = -1  # marker replaced by V inside gather helpers


def hypercube_offsets(kernel_size: int, dimension: int = 3) -> np.ndarray:
    """[K, 3] int32 offsets, z fastest (matching Minkowski region iteration)."""
    if kernel_size % 2 == 1:
        r = np.arange(-(kernel_size // 2), kernel_size // 2 + 1)
    else:
        r = np.arange(0, kernel_size)
    grids = np.meshgrid(*([r] * dimension), indexing="ij")
    return np.stack([g.ravel() for g in grids], axis=1).astype(np.int32)


def pack_keys(coords: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """coords [V,3] int32 (|c| < 512) + valid [V] -> sortable int32 keys."""
    c = jnp.clip(coords, -COORD_OFFSET, COORD_OFFSET - 1) + COORD_OFFSET
    key = (c[..., 0] << (2 * COORD_BITS)) | (c[..., 1] << COORD_BITS) | c[..., 2]
    return jnp.where(valid, key, SENTINEL_KEY)


class VoxelGrid(NamedTuple):
    """One resolution level of one sample."""
    coords: jnp.ndarray       # [V, 3] int32 (unit coords at this level)
    mask: jnp.ndarray         # [V] bool
    keys_sorted: jnp.ndarray  # [V] int32 ascending (sentinels last)
    order: jnp.ndarray        # [V] int32: keys_sorted[i] == key(coords[order[i]])

    @property
    def num_voxels(self) -> int:
        return self.coords.shape[0]


def build_grid(coords: jnp.ndarray, mask: jnp.ndarray) -> VoxelGrid:
    keys = pack_keys(coords, mask)
    order = jnp.argsort(keys)
    return VoxelGrid(coords=coords, mask=mask, keys_sorted=keys[order],
                     order=order.astype(jnp.int32))


def lookup(grid: VoxelGrid, probe_coords: jnp.ndarray,
           probe_valid: jnp.ndarray) -> jnp.ndarray:
    """Indices into grid.coords for each probe coord; V (shadow) if absent."""
    v = grid.num_voxels
    pk = pack_keys(probe_coords, probe_valid)
    pos = jnp.searchsorted(grid.keys_sorted, pk).astype(jnp.int32)
    pos_c = jnp.minimum(pos, v - 1)
    found = (grid.keys_sorted[pos_c] == pk) & (pk != SENTINEL_KEY)
    return jnp.where(found, grid.order[pos_c], v)


def kernel_map(in_grid: VoxelGrid, out_grid: VoxelGrid,
               offsets: jnp.ndarray, stride: int) -> jnp.ndarray:
    """[K, V_out] gather indices into the input level (V_in = shadow).
    Output coord u covers input coords stride*u + offset."""
    base = out_grid.coords * stride                      # [V_out, 3]
    probe = base[None, :, :] + offsets[:, None, :]       # [K, V_out, 3]
    return lookup(in_grid, probe, out_grid.mask[None, :])


def downsample(grid: VoxelGrid, feats: Optional[jnp.ndarray], stride: int,
               v_out: int, mode: str = "unique",
               ) -> Tuple[VoxelGrid, Optional[jnp.ndarray]]:
    """Coarsen to the stride lattice: out coords = unique(floor(in/stride)).

    mode: 'unique' (coords only), 'mean'/'max'/'sum' also pool feats.
    If unique count exceeds v_out, the spatially-largest keys are dropped
    (deterministic; mirrors the reference's point-cap truncations).
    """
    v_in = grid.num_voxels
    down = jnp.floor_divide(grid.coords, stride)
    keys = pack_keys(down, grid.mask)
    order = jnp.argsort(keys)
    skeys = keys[order]
    sdown = down[order]
    valid_sorted = skeys != SENTINEL_KEY
    prev = jnp.concatenate([jnp.full((1,), -1, skeys.dtype), skeys[:-1]])
    is_first = (skeys != prev) & valid_sorted
    seg = jnp.cumsum(is_first) - 1                       # [V_in] int
    n_unique = jnp.sum(is_first)

    out_coords = jnp.zeros((v_out, 3), jnp.int32)
    scatter_idx = jnp.where(is_first & (seg < v_out), seg, v_out)
    out_coords = out_coords.at[scatter_idx].set(sdown, mode="drop")
    out_mask = (jnp.arange(v_out) < jnp.minimum(n_unique, v_out))

    out_feats = None
    if feats is not None and mode != "unique":
        sfeats = feats[order]
        contrib_idx = jnp.where(valid_sorted & (seg < v_out), seg, v_out)
        if mode == "max":
            neg = jnp.full((v_out, feats.shape[-1]), -jnp.inf, feats.dtype)
            out_feats = neg.at[contrib_idx].max(
                jnp.where(valid_sorted[:, None], sfeats, -jnp.inf), mode="drop")
            out_feats = jnp.where(out_mask[:, None], out_feats, 0.0)
        else:
            acc = jnp.zeros((v_out, feats.shape[-1]), feats.dtype)
            acc = acc.at[contrib_idx].add(
                jnp.where(valid_sorted[:, None], sfeats, 0.0), mode="drop")
            if mode == "mean":
                cnt = jnp.zeros((v_out,), feats.dtype).at[contrib_idx].add(
                    valid_sorted.astype(feats.dtype), mode="drop")
                acc = acc / jnp.maximum(cnt, 1.0)[:, None]
            out_feats = acc
    return build_grid(out_coords, out_mask), out_feats


def gather_neighbors(feats: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """feats [V,C], idx [...]-> [..., C] with shadow row V = zeros."""
    padded = jnp.concatenate(
        [feats, jnp.zeros((1, feats.shape[-1]), feats.dtype)], axis=0)
    return padded[idx]


def sparse_conv_apply(feats: jnp.ndarray, nbr_idx: jnp.ndarray,
                      weights: jnp.ndarray, offset_chunk: Optional[int] = None,
                      target_cols: int = 256) -> jnp.ndarray:
    """Gather–matmul–accumulate convolution.

    feats [V_in, Cin]; nbr_idx [K, V_out] (V_in = shadow); weights
    [K, Cin, Cout]. Returns [V_out, Cout] f32. Scans over offset chunks so
    the gathered neighbor tensor never exceeds [chunk, V_out, Cin]; the
    default chunk targets ~target_cols gathered columns per step, which keeps
    the matmul K-dimension MXU-sized while bounding the transient gather.
    """
    k = nbr_idx.shape[0]
    cin = feats.shape[-1]
    cout = weights.shape[-1]
    v_out = nbr_idx.shape[1]
    if offset_chunk is None:
        offset_chunk = max(1, target_cols // max(cin, 1))
    padded = jnp.concatenate(
        [feats, jnp.zeros((1, cin), feats.dtype)], axis=0)

    chunk = max(1, min(offset_chunk, k))
    n_chunks = -(-k // chunk)
    pad_k = n_chunks * chunk - k
    if pad_k:
        nbr_idx = jnp.concatenate(
            [nbr_idx, jnp.full((pad_k, v_out), feats.shape[0], nbr_idx.dtype)])
        weights = jnp.concatenate(
            [weights, jnp.zeros((pad_k, cin, cout), weights.dtype)])
    nbr_idx = nbr_idx.reshape(n_chunks, chunk, v_out)
    weights = weights.reshape(n_chunks, chunk * cin, cout)

    def body(acc, xs):
        idx_c, w_c = xs
        g = padded[idx_c]                                 # [chunk, V_out, Cin]
        g = jnp.moveaxis(g, 0, 1).reshape(v_out, chunk * cin)
        acc = acc + jnp.dot(g, w_c.astype(g.dtype),
                            preferred_element_type=jnp.float32)
        return acc, None

    init = jnp.zeros((v_out, cout), jnp.float32)
    out, _ = jax.lax.scan(body, init, (nbr_idx, weights))
    return out


def max_pool_apply(feats: jnp.ndarray, nbr_idx: jnp.ndarray,
                   out_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked max pool over gathered neighbors: feats [V_in,C],
    nbr_idx [K,V_out] -> [V_out,C]. Shadow rows contribute -inf."""
    v_in, c = feats.shape
    padded = jnp.concatenate(
        [feats, jnp.full((1, c), -jnp.inf, feats.dtype)], axis=0)
    g = padded[nbr_idx]                                   # [K, V_out, C]
    out = jnp.max(g, axis=0)
    any_real = jnp.any(nbr_idx < v_in, axis=0)
    return jnp.where((any_real & out_mask)[:, None], out, 0.0)
