"""Device-side neighborhood ops for KPConv — the TPU-native replacement for
the reference's per-batch C++ host round trip (SURVEY.md §3.5: nanoflann
radius search in cpp_neighbors/neighbors.cpp:211-332 and voxel-barycenter
subsampling in cpp_subsampling/grid_subsampling.cpp:5-211, called from
models/instance/kpconv.py:145-264 every step).

Design:
  * `radius_neighbors`: brute-force squared distances computed as a matmul
    (|q|^2 + |s|^2 - 2 q.s rides the MXU), tiled over queries with lax.scan
    so the [Nq, Ns] matrix never materializes; top-k nearest within the
    radius, ascending by distance — equivalent to the reference's sorted
    radius list cropped by neighborhood_limits (kpconv.py:133-143). Padding
    = shadow index Ns (matches neighbors.cpp:202 semantics).
  * `grid_subsample`: voxel-barycenter downsampling (mean position per cell)
    on the sort/segment machinery of ops/voxel.py. Optional per-sample random
    grid orientation (common.py:39-144) via a caller-supplied rotation.
  * `fps`: farthest point sampling (openpoints CUDA kernel equivalent,
    kpconv.py:52-71) as a lax.fori_loop.

All functions are per-sample and vmap/jit friendly with static shapes.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .voxel import build_grid, downsample, pack_keys

_FAR = 1e8


def _pad_to(x, n, axis=0, value=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def radius_neighbors(q_pts: jnp.ndarray, q_mask: jnp.ndarray,
                     s_pts: jnp.ndarray, s_mask: jnp.ndarray,
                     radius: float, k: int, tile: int = 1024) -> jnp.ndarray:
    """[Nq, k] int32 indices of the k nearest supports within `radius` of each
    query, ascending by distance; Ns = shadow where fewer are in range."""
    nq = q_pts.shape[0]
    ns = s_pts.shape[0]
    tile = min(tile, nq)
    n_tiles = -(-nq // tile)
    q_pad = _pad_to(q_pts, n_tiles * tile).reshape(n_tiles, tile, 3)

    s_sq = jnp.sum(jnp.square(s_pts), axis=-1)                   # [Ns]
    s_far = jnp.where(s_mask, 0.0, _FAR)
    r2 = radius * radius

    def body(_, q_tile):
        d2 = (jnp.sum(jnp.square(q_tile), -1, keepdims=True) + s_sq[None, :]
              - 2.0 * jnp.dot(q_tile, s_pts.T,
                              preferred_element_type=jnp.float32))
        d2 = d2 + s_far[None, :]
        neg, idx = jax.lax.top_k(-d2, min(k, ns))                # ascending d2
        in_range = (-neg) < r2
        out = jnp.where(in_range, idx, ns).astype(jnp.int32)
        if k > ns:
            out = _pad_to(out, k, axis=1, value=ns)
        return None, out

    _, tiles = jax.lax.scan(body, None, q_pad)
    nbr = tiles.reshape(n_tiles * tile, -1)[:nq]
    return jnp.where(q_mask[:, None], nbr, ns)


def grid_subsample(pos: jnp.ndarray, mask: jnp.ndarray, dl: float,
                   n_out: int, rotation: Optional[jnp.ndarray] = None,
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Voxel-barycenter subsample: cell = floor(pos/dl) (after optional grid
    rotation), output = mean of member positions (inverse-rotated back).
    Returns (pos_out [n_out,3] f32, mask_out [n_out])."""
    p = pos if rotation is None else pos @ rotation
    coords = jnp.floor(p / dl).astype(jnp.int32)
    grid = build_grid(coords, mask)
    out_grid, bary = downsample(grid, p, 1, n_out, mode="mean")
    if rotation is not None:
        bary = bary @ rotation.T
    # park invalid rows far away so downstream radius searches never hit them
    bary = jnp.where(out_grid.mask[:, None], bary, _FAR)
    return bary, out_grid.mask


def random_rotation(rng_key) -> jnp.ndarray:
    """Uniform-ish random 3D rotation (axis-angle, common.py:58-70 style)."""
    k1, k2, k3 = jax.random.split(rng_key, 3)
    theta = jax.random.uniform(k1) * 2 * jnp.pi
    phi = (jax.random.uniform(k2) - 0.5) * jnp.pi
    u = jnp.array([jnp.cos(theta) * jnp.cos(phi),
                   jnp.sin(theta) * jnp.cos(phi),
                   jnp.sin(phi)])
    alpha = jax.random.uniform(k3) * 2 * jnp.pi
    c, s = jnp.cos(alpha), jnp.sin(alpha)
    ux, uy, uz = u
    cross = jnp.array([[0.0, -uz, uy], [uz, 0.0, -ux], [-uy, ux, 0.0]])
    return c * jnp.eye(3) + s * cross + (1 - c) * jnp.outer(u, u)


def fps(pos: jnp.ndarray, mask: jnp.ndarray, n_samples: int,
        start: int = 0) -> jnp.ndarray:
    """Farthest point sampling indices [n_samples] (invalid rows excluded)."""
    n = pos.shape[0]
    d_init = jnp.where(mask, jnp.inf, -jnp.inf)

    def body(i, carry):
        dists, idxs = carry
        last = idxs[i - 1]
        d_new = jnp.sum(jnp.square(pos - pos[last]), axis=-1)
        d_new = jnp.where(mask, d_new, -jnp.inf)
        dists = jnp.minimum(dists, d_new)
        idxs = idxs.at[i].set(jnp.argmax(dists))
        return dists, idxs

    idxs = jnp.zeros(n_samples, jnp.int32).at[0].set(start)
    _, idxs = jax.lax.fori_loop(1, n_samples, body, (d_init, idxs))
    return idxs
