"""Inference transforms — run a pretrained model inside the data pipeline
(reference core/data_transform/inference_transforms.py:11-87).

`ModelInference` restores a checkpoint produced by this framework's trainer
and rebuilds just the network (no optimizer/loss machinery); subclasses
implement `__call__`. `PointNetForward` attaches the per-point embedding of a
pretrained MPointNet as a named feature (the reference calls a
`model.get_local_feat()` that no longer exists anywhere in its tree — dead
legacy from upstream torch-points3d; here the surface is
`MPointNet(..., return_point_features=True)`, the pre-pool [N, E] embedding).

These run host-side per sample (cold path, like the reference's DataLoader
workers); the forward itself executes on the default jax backend.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .core import Transform, register


class _ShimDataset:
    """Minimal dataset stand-in for model construction from a checkpoint
    (the reference's MockDataset role, utils/mock.py:20-74)."""

    def __init__(self, num_reg_classes: int):
        self.num_reg_classes = num_reg_classes


@register
class ModelInference(Transform):
    """Base: restore `checkpoint_dir/model_name.ckpt`, rebuild the net from
    the stored run_config, load `weight_name` params. Subclass and implement
    `__call__` (reference inference_transforms.py:11-42)."""

    def __init__(self, checkpoint_dir: str, model_name: str,
                 weight_name: str = "latest",
                 feat_name: Optional[str] = None,
                 num_classes: Optional[int] = None, mock_dataset: bool = True):
        from ..models.factory import _BUILDERS
        from ..training.state import Checkpoint

        path = os.path.join(checkpoint_dir, f"{model_name}.ckpt")
        ckpt = Checkpoint.from_bytes(open(path, "rb").read())
        run_cfg = ckpt.run_config
        # the stored model option carries its own inner `model_name` (e.g.
        # MPointNet -> "MinkowskiPointNet"); do not overwrite it
        option = dict(run_cfg["models"][run_cfg["model_name"]])
        state = ckpt.get_model_state(weight_name)
        self.variables = {"params": state["params"]}
        if state.get("batch_stats"):
            self.variables["batch_stats"] = state["batch_stats"]
        if num_classes is None:
            num_classes = len(ckpt.dataset_properties.get(
                "target_stats", {}).get("scale", [])) or 2
        # bn_axis_name=None: single-device host-side forward
        self.net, _ = _BUILDERS[option["class"]](
            option, _ShimDataset(num_classes), None)
        self.feat_name = feat_name

    def __call__(self, rng, sample):
        raise NotImplementedError("subclass ModelInference")


@register
class PointNetForward(ModelInference):
    """Attach a pretrained MPointNet's per-point embedding as
    sample[feat_name] (reference inference_transforms.py:45-87)."""

    def __init__(self, checkpoint_dir: str, model_name: str,
                 weight_name: str = "latest", feat_name: str = "pointnet_feat",
                 num_classes: Optional[int] = None, mock_dataset: bool = True):
        super().__init__(checkpoint_dir, model_name, weight_name, feat_name,
                         num_classes, mock_dataset)

    def __call__(self, rng, sample):
        import jax.numpy as jnp

        from ..data.batch import Batch

        pos = np.asarray(sample["pos"], np.float32)
        n = len(pos)
        x = sample.get("x")
        if x is None:
            x = np.ones((n, 1), np.float32)
        x = np.asarray(x, np.float32)
        batch = Batch(
            pos=jnp.asarray(pos[None]), x=jnp.asarray(x[None]),
            mask=jnp.ones((1, n), bool), y_reg=None, y_reg_mask=None,
            area_idx=None, label_idx=None, is_double=None)
        feats = self.net.apply(self.variables, batch, train=False,
                               return_point_features=True)
        sample = dict(sample)
        sample[self.feat_name] = np.asarray(feats[0], np.float32)
        return sample
