"""Shared network blocks: activations, SE layer, DropPath, separate-linear
regression heads — masked-tensor equivalents of the reference's Minkowski
blocks (modules/MinkowskiEngine/{common,senet_block}.py) and the
SeparateLinear head (models/instance/minkowski.py:15-26).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.masked import masked_mean
from .init import torch_linear_bias, torch_linear_weight, trunc_normal

# reference activation registry (modules/MinkowskiEngine/common.py:32-40,
# modules/KPConv/architectures.py:21-30; celu uses alpha=0.54)
ACTIVATIONS = {
    "relu": jax.nn.relu,
    "celu": partial(jax.nn.celu, alpha=0.54),
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "elu": jax.nn.elu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "gelu": jax.nn.gelu,
    "lrelu": jax.nn.leaky_relu,
}


class TorchLinear(nn.Module):
    """Dense layer with torch nn.Linear default init (see nn/init.py)."""
    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kinit = self.kernel_init or torch_linear_weight
        binit = self.bias_init or torch_linear_bias(in_dim)
        kernel = self.param("kernel", kinit, (in_dim, self.features))
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", binit, (self.features,))
            y = y + bias.astype(x.dtype)
        return y


class SeparateLinear(nn.Module):
    """One independent Linear(in, 1) per regression target, concatenated —
    trunc_normal(0.02) weights, zero bias (minkowski.py:15-26,43-45)."""
    num_targets: int

    @nn.compact
    def __call__(self, x):
        outs = []
        for i in range(self.num_targets):
            outs.append(TorchLinear(1, kernel_init=trunc_normal(0.02),
                                    bias_init=nn.initializers.zeros,
                                    name=f"linear_{i}")(x))
        return jnp.concatenate(outs, axis=-1)


class SELayer(nn.Module):
    """Squeeze-excite over valid rows: masked global mean -> bottleneck MLP ->
    sigmoid -> broadcast multiply (senet_block.py:33-54). Computed in f32 like
    the reference's custom_fwd(cast_inputs=float32)."""
    channels: int
    act: Callable
    reduction: int = 16

    @nn.compact
    def __call__(self, x, mask):
        xf = x.astype(jnp.float32)
        y = masked_mean(xf, mask)                       # [..., C]
        y = TorchLinear(self.channels // self.reduction, name="fc1")(y)
        y = self.act(y)
        y = TorchLinear(self.channels, name="fc2")(y)
        y = jax.nn.sigmoid(y)
        return (xf * jnp.expand_dims(y, -2)).astype(x.dtype)


class DropPath(nn.Module):
    """Per-sample stochastic depth (common.py:344-366): drops the whole
    residual branch of a sample with prob `rate`, rescales survivors."""
    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if self.rate == 0.0 or deterministic:
            return x
        rng = self.make_rng("dropout")
        # one coin per sample: x is [B, N, C] (batched) or [N, C] under vmap —
        # the leading axis is the sample axis inside the per-sample module
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        coin = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(coin, x / keep, jnp.zeros_like(x))


class Dropout(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if self.rate == 0.0 or deterministic:
            return x
        rng = self.make_rng("dropout")
        keep = 1.0 - self.rate
        coin = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(coin, x / keep, jnp.zeros_like(x))
