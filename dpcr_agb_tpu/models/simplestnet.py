"""Sanity model: 3 pointwise conv blocks + masked average pool + head
(reference models/instance/simplestnet.py:27-91; note the reference pools
with adaptive_avg_pool1d over the padded axis — we pool over valid points,
which is the intended semantics for fixed-point presets where all points are
valid)."""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import SeparateLinear, TorchLinear
from ..nn.norm import MaskedBatchNorm
from ..ops.masked import masked_mean


class SimplestNet(nn.Module):
    num_reg_targets: int
    bn_axis_name: Any = None

    @nn.compact
    def __call__(self, batch, train: bool = False,
                 enable_dropout: bool = False):
        del enable_dropout  # no dropout in this model
        mask = batch.mask
        h = jnp.concatenate([batch.x.astype(jnp.float32),
                             batch.pos.astype(jnp.float32)], -1)
        for i, width in enumerate([64, 128, 128]):
            h = TorchLinear(width, name=f"conv{i}")(h)
            h = nn.gelu(h)
            h = MaskedBatchNorm(width, axis_name=self.bn_axis_name,
                                name=f"bn{i}")(
                h, mask, use_running_average=not train)
        g = masked_mean(h, mask)
        return SeparateLinear(self.num_reg_targets, name="head")(g)
