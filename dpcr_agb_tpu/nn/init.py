"""Weight initializers matching the reference's torch defaults, so training
dynamics are comparable.

* `trunc_normal(0.02)` — used by the reference for heads, Minkowski convs and
  linears (models/instance/minkowski.py:43-45, modules/MinkowskiEngine/SENet.py:80-88)
* torch `nn.Linear` default — kaiming-uniform(a=sqrt(5)) on weight and
  uniform(±1/sqrt(fan_in)) on bias — used wherever the reference leaves torch
  defaults in place (e.g. MinkowskiPointNet blocks).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def trunc_normal(stddev: float = 0.02):
    # torch.nn.init.trunc_normal_ truncates at ±2 std
    return jax.nn.initializers.truncated_normal(stddev=stddev, lower=-2.0, upper=2.0)


def torch_linear_weight(key, shape, dtype=jnp.float32):
    """flax kernel shape is [in, out]; torch kaiming_uniform(a=sqrt(5)) on
    [out, in] reduces to U(±1/sqrt(fan_in))."""
    fan_in = shape[0]
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_bias(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def zeros(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)
