"""Checkpoint-only serving bundle — model, spec, pipelines and weights
rebuilt WITHOUT a labeled dataset (the reference cannot do this: its eval
needs the dataset to instantiate anything, trainer.py:92-138).

Used by predict.py (label-free inference CLI) and scripts/export_model.py
(StableHLO deployment artifact).
"""
from __future__ import annotations

import dataclasses
import logging
import os
from typing import Callable, List, Optional

import numpy as np

log = logging.getLogger(__name__)


@dataclasses.dataclass
class ServingBundle:
    net: object
    spec: object                      # InstanceSpec with checkpoint stats
    conv_type: str
    collate_spec: object
    post_collate: Optional[Callable]
    pre_transform: Optional[Callable]
    eval_transform: Optional[Callable]
    params: dict
    batch_stats: dict
    reg_targets: List[str]
    feature_cols: List[str]
    data_cfg: dict
    option: dict


def load_serving_bundle(checkpoint_dir: str, model_name: str,
                        weight_name: str = "latest",
                        transform_type: Optional[str] = None,
                        feature_dimension: Optional[int] = None,
                        ) -> ServingBundle:
    """Rebuild everything needed for inference from the checkpoint alone.

    feature_dimension: the model input channel count. When None it is
    inferred later by the caller from the first transformed sample (exactly
    LasDataset.feature_dimension) — only KPConv needs it at build time, so
    pass it for KPConv exports.
    """
    from .models.base import InstanceSpec
    from .models.factory import _BUILDERS, _collate_spec, make_post_collate
    from .training.state import Checkpoint
    from .transforms import instantiate_transforms

    path = os.path.join(checkpoint_dir, f"{model_name}.ckpt")
    ckpt = Checkpoint.from_bytes(open(path, "rb").read())
    rc = ckpt.run_config
    data_cfg = rc["data"]
    option = rc["models"][model_name]

    tt = transform_type or data_cfg["transform_type"]
    tt_used = next((c for c in (f"{tt}_eval", tt) if c in data_cfg), None)
    if tt_used is None:
        raise ValueError(f"transform preset {tt!r} not in the stored config")
    tt_cfg = dict(data_cfg[tt_used] or {})
    pre_tf = instantiate_transforms(tt_cfg.get("pre_transform")
                                    or data_cfg.get("pre_transform"))
    eval_tf = instantiate_transforms(tt_cfg.get("test_transform"))

    ts = ckpt.dataset_properties["target_stats"]
    n_targets = len(ts["scale"])
    reg_targets = list(ckpt.dataset_properties.get("reg_targets", [])) or \
        [f"target_{i}" for i in range(n_targets)]

    feat_dim = feature_dimension or 0  # class bodies can't close over args

    class _Shim:
        num_reg_classes = n_targets
        feature_dimension = feat_dim
        dataset_opt = data_cfg
        double_batch = False

    net, conv_type = _BUILDERS[option["class"]](option, _Shim(), None)
    conv_type = option.get("conv_type", conv_type)
    get = option.get if hasattr(option, "get") else option.__getitem__
    spec = InstanceSpec(
        num_reg_targets=n_targets,
        scale=np.asarray(ts["scale"], np.float32),
        center=np.asarray(ts["center"], np.float32),
        weights=np.asarray(ts["weights"], np.float32),
        out_activation=str(get("reg_out_activation", "linear")
                           or "linear").lower(),
        report_activation=str(get("reg_out_report_activation", "linear")
                              or "linear").lower(),
    )
    saved = ckpt.get_model_state(weight_name)
    return ServingBundle(
        net=net, spec=spec, conv_type=conv_type,
        collate_spec=_collate_spec(conv_type, option, _Shim()),
        post_collate=make_post_collate(net),
        pre_transform=pre_tf, eval_transform=eval_tf,
        params=saved["params"], batch_stats=saved.get("batch_stats", {}),
        reg_targets=reg_targets,
        feature_cols=list(data_cfg.get("features", []) or []),
        data_cfg=data_cfg, option=option)
