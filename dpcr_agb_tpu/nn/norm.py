"""Normalization layers over padded (masked) feature tensors.

`MaskedBatchNorm` reproduces torch/Minkowski BatchNorm semantics on TPU:
  * batch statistics computed over *valid* rows only (the reference normalizes
    the concatenated sparse feature rows, which are exactly our masked rows)
  * torch momentum convention: running = (1-m)*running + m*batch
  * unbiased running variance (torch tracks Bessel-corrected var)
  * optional `axis_name` syncs moments across a data-parallel mesh axis —
    the reference's nn.DataParallel computed *per-GPU* BN (trainer.py:149-150);
    cross-replica is the better-behaved default at large global batch and is
    configurable (SURVEY.md §7 hard-part 3)
  * `use_running_average` drives eval; `calibrate_bn` runs train-mode stats
    updates under stop_gradient (reference calibrate_bn.py:8-21)
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.masked import masked_moments


class MaskedBatchNorm(nn.Module):
    features: int
    momentum: float = 0.1          # torch convention
    epsilon: float = 1e-5
    affine: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None   # computation dtype; stats are f32

    @nn.compact
    def __call__(self, x, mask, use_running_average: bool = False):
        """x: [..., N, C] (any number of leading axes), mask: [..., N]."""
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(self.features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(self.features, jnp.float32))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean, var, count = masked_moments(xf, mask, axes)
            if self.axis_name is not None:
                # sync moments across the mesh axis: weighted by counts
                total = jax.lax.psum(count, self.axis_name)
                g_mean = jax.lax.psum(mean * count, self.axis_name) / total
                g_var = (jax.lax.psum((var + jnp.square(mean - g_mean)) * count,
                                      self.axis_name) / total)
                mean, var, count = g_mean, g_var, total
            if not self.is_initializing():
                m = self.momentum
                n = jnp.maximum(count, 2.0)
                unbiased = var * n / (n - 1.0)
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased

        y = (x - mean.astype(x.dtype)) * jax.lax.rsqrt(
            var.astype(x.dtype) + jnp.asarray(self.epsilon, x.dtype))
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (self.features,))
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y * scale.astype(x.dtype) + bias.astype(x.dtype)
        return y


class MaskedLayerNorm(nn.Module):
    """Per-row layer norm (padding rows produce garbage but are masked
    downstream). Mirrors MinkowskiLayerNorm (common.py:369-386)."""
    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask=None, use_running_average: bool = False):
        del mask, use_running_average
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return y * scale + bias


class MaskedInstanceNorm(nn.Module):
    """Per-sample, per-channel normalization over valid rows — Minkowski
    InstanceNorm equivalent (SENet.py:39-40 norm_type 'in')."""
    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask, use_running_average: bool = False):
        del use_running_average  # no running stats
        m = jnp.expand_dims(mask, -1).astype(jnp.float32)
        xf = x.astype(jnp.float32)
        count = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 1e-12)
        mean = jnp.sum(xf * m, axis=-2, keepdims=True) / count
        var = jnp.sum(jnp.square(xf - mean) * m, axis=-2, keepdims=True) / count
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return (y * scale + bias).astype(x.dtype)


class MaskedGRN(nn.Module):
    """Global response normalization over valid rows (MinkowskiGRN,
    modules/MinkowskiEngine/common.py:322-341): per-channel L2 norm across
    the whole (masked) point set, normalized by its channel mean, applied
    as a learnable residual gate. Unused by the paper's SENet configs; kept
    for module-surface completeness."""
    features: int

    @nn.compact
    def __call__(self, x, mask):
        gamma = self.param("gamma", nn.initializers.zeros, (1, self.features))
        beta = self.param("beta", nn.initializers.zeros, (1, self.features))
        xm = jnp.where(mask[..., None], x, 0.0)
        # reduce over every axis but channels (rows of the sparse tensor)
        axes = tuple(range(x.ndim - 1))
        gx = jnp.sqrt(jnp.sum(jnp.square(xm), axis=axes, keepdims=True))
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return jnp.where(mask[..., None], gamma * (x * nx) + beta + x, 0.0)
