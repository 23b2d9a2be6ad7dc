"""MPointNet — the paper's "PointNet" row: shared MLPs 64/128/1024 over voxel
features, masked global pool, MLP 512/256, dropout, SeparateLinear head
(reference modules/MinkowskiEngine/PointNet.py:9-49 wrapped by
models/instance/minkowski.py:29-89).

TPU-native formulation: the sparse tensor is a padded dense [B, N, C] with a
validity mask — pointwise MLPs are batched matmuls on the MXU, BN masks
padding, the global pool is a masked reduction. Forward runs in f32 like the
reference's custom_fwd(cast_inputs=float32).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import ACTIVATIONS, Dropout, SeparateLinear, TorchLinear
from ..nn.norm import MaskedBatchNorm
from ..ops.masked import GLOBAL_POOL


class MPointNet(nn.Module):
    num_reg_targets: int
    activation: str = "gelu"
    global_pool: str = "sum"
    embedding_channel: int = 1024
    dropout: float = 0.0
    bn_momentum: float = 0.1
    add_pos: bool = True
    bn_axis_name: Any = None

    @nn.compact
    def __call__(self, batch, train: bool = False,
                 enable_dropout: bool = False,
                 return_point_features: bool = False):
        """enable_dropout keeps Dropout active in eval mode — the reference's
        enable_dropout_in_eval for MC-style voting (base_model.py:352-360).
        return_point_features short-circuits after the shared MLPs and
        returns the per-point embedding [B, N, embedding_channel] — the
        `get_local_feat` surface consumed by the PointNetForward inference
        transform (reference inference_transforms.py:80)."""
        act = ACTIVATIONS[self.activation]
        mask = batch.mask
        feats = batch.x.astype(jnp.float32)
        if self.add_pos:
            feats = jnp.concatenate([batch.pos.astype(jnp.float32), feats], -1)

        def block(x, width, name):
            x = TorchLinear(width, use_bias=False, name=f"{name}_lin")(x)
            x = MaskedBatchNorm(width, momentum=self.bn_momentum,
                                axis_name=self.bn_axis_name,
                                name=f"{name}_bn")(
                x, mask, use_running_average=not train)
            return act(x)

        h = block(feats, 64, "b1")
        h = block(h, 128, "b2")
        h = block(h, self.embedding_channel, "b3")
        if return_point_features:
            return h

        g = GLOBAL_POOL[self.global_pool](h, mask)          # [B, E]
        # post-pool MLPs: BN over the batch axis (every pooled row is valid)
        pooled_mask = jnp.ones(g.shape[:-1], bool)

        def pooled_block(x, width, name):
            x = TorchLinear(width, use_bias=False, name=f"{name}_lin")(x)
            x = MaskedBatchNorm(width, momentum=self.bn_momentum,
                                axis_name=self.bn_axis_name,
                                name=f"{name}_bn")(
                x, pooled_mask, use_running_average=not train)
            return act(x)

        g = pooled_block(g, 512, "m1")
        g = pooled_block(g, 256, "m2")
        g = Dropout(self.dropout)(g, deterministic=not (train or enable_dropout))
        return SeparateLinear(self.num_reg_targets, name="final")(g)
