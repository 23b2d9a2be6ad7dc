"""Masked reductions over padded point/voxel axes.

The TPU-native replacement for the reference's variable-length pooling
(MinkowskiGlobalPooling, KPConv global blocks iterating `lengths`,
modules/KPConv/blocks.py:683-738): every tensor is padded to a static shape
`[..., N, C]` with a boolean validity `mask [..., N]`; reductions only see
valid rows.
"""
from __future__ import annotations

import jax.numpy as jnp

_NEG_INF = -1e30


def masked_sum(x: jnp.ndarray, mask: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    """Sum over `axis` counting only rows where mask is True.

    x: [..., N, C]; mask: [..., N] -> [..., C]
    """
    m = jnp.expand_dims(mask, -1).astype(x.dtype)
    return jnp.sum(x * m, axis=axis)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, axis: int = -2,
                eps: float = 1e-12) -> jnp.ndarray:
    m = jnp.expand_dims(mask, -1).astype(x.dtype)
    total = jnp.sum(x * m, axis=axis)
    count = jnp.sum(m, axis=axis)
    return total / jnp.maximum(count, eps)


def masked_max(x: jnp.ndarray, mask: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    """Max over valid rows; all-padding gives 0 (matches zero-feature shadow
    semantics of the reference, modules/KPConv/blocks.py:383)."""
    m = jnp.expand_dims(mask, -1)
    filled = jnp.where(m, x, jnp.asarray(_NEG_INF, x.dtype))
    out = jnp.max(filled, axis=axis)
    any_valid = jnp.any(mask, axis=-1, keepdims=True)
    return jnp.where(any_valid, out, jnp.zeros_like(out))


GLOBAL_POOL = {
    "sum": masked_sum,
    "add": masked_sum,
    "mean": masked_mean,
    "avg": masked_mean,
    "max": masked_max,
}


def masked_moments(x: jnp.ndarray, mask: jnp.ndarray, axes,
                   eps: float = 1e-12):
    """Per-channel mean/variance over all valid rows of the given axes.

    x: [..., C]; mask broadcastable to x[..., 0]. Returns (mean[C], var[C],
    count[]) — the building block for batch norm over padded sparse/dense
    features (reference: BN over concatenated valid rows,
    modules/MinkowskiEngine/common.py:229-318).
    """
    m = jnp.expand_dims(mask, -1).astype(x.dtype)
    count = jnp.maximum(jnp.sum(m, axis=axes), eps)
    mean = jnp.sum(x * m, axis=axes) / count
    var = jnp.sum(jnp.square(x - mean) * m, axis=axes) / count
    return mean, var, count
