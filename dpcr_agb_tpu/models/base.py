"""Instance-regression task machinery (reference models/instance/base.py:16-208),
as pure functions over fixed-shape arrays.

Targets are standardized inside the loss: labels = (y - center)/scale, with
per-target normalization standard|min-max|none (+ overrides + scale_mult)
computed from the dataset's per-area train-split stats. Predictions live in
standardized space; `reg_output` de-standardizes for reporting.

Divergences from the reference (documented per SURVEY.md §7 hard-part 6):
  * double-batch loss: the reference references a never-assigned `reg_out2`
    (base.py:161 — would crash); we implement the intended behavior: paired
    consecutive views are averaged 0.5/0.5 elementwise before the mean.
  * `has_mol_targets`/`has_cls_targets` are always defined (False here —
    the NFI task is regression-only).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

F16_EPS = float(np.finfo(np.float16).eps)


# --- elementwise losses (reference base.py:16-41; smoothl1 beta=1 torch default)
def smoothl1(x, y):
    d = jnp.abs(x - y)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def l2(x, y):
    return jnp.square(x - y)


def l1(x, y):
    return jnp.abs(x - y)


def mape(x, y):
    nonzero = y != 0
    safe_y = jnp.where(nonzero, y, 1.0)
    return jnp.where(nonzero, jnp.abs((y - x) / safe_y), 0.0)


def smape(x, y):
    return jnp.abs(y - x) / (jnp.abs(x) + jnp.abs(y) + F16_EPS)


REG_LOSSES: Dict[str, Callable] = {
    "smoothl1": smoothl1, "l2": l2, "l1": l1, "mape": mape, "smape": smape,
}

OUT_ACT: Dict[str, Callable] = {
    "linear": lambda x: x,
    "elu": lambda x: jnp.where(x > 0, x, jnp.expm1(x)),
    "relu": lambda x: jnp.maximum(x, 0),
}


@dataclasses.dataclass(frozen=True)
class InstanceSpec:
    """Static task config threaded into the jitted loss (all fields either
    python constants or small numpy arrays baked as jnp constants)."""
    num_reg_targets: int
    scale: np.ndarray              # [T]
    center: np.ndarray             # [T]
    weights: np.ndarray            # [T]
    loss_names: Sequence[str] = ("smoothl1",)
    out_activation: str = "linear"
    report_activation: str = "linear"
    double_batch: bool = False

    @property
    def has_reg_targets(self) -> bool:
        return self.num_reg_targets > 0

    # regression-only task: flags the reference left undefined (kpconv.py:126-131)
    has_mol_targets: bool = False
    has_cls_targets: bool = False


def _avg_stat(stats_dict: dict, feat_idx: np.ndarray, default: float) -> float:
    """nanmean over every entry (areas AND 'total', mirroring the reference's
    iteration over get_*_targets().values(), base.py:116-134) that has train
    stats."""
    vals = [np.asarray(area["train"], dtype=np.float64)[feat_idx]
            for area in stats_dict.values() if "train" in area]
    if not vals:
        return default
    arr = np.array(vals, dtype=np.float64)
    if np.isnan(arr).all(axis=0).any():
        return default
    return float(np.nanmean(arr, axis=0)[0])


def build_instance_spec(dataset, option) -> InstanceSpec:
    """Port of get_task_weights_scale_center (base.py:86-114) for regression."""
    get = option.get if hasattr(option, "get") else option.__getitem__
    reg_targets = [t for t in dataset.targets
                   if dataset.targets[t]["task"] == "regression"]
    n = len(reg_targets)
    scale = np.ones(n)
    center = np.zeros(n)
    weights = np.ones(n)
    targets_idx = np.asarray(dataset.reg_targets_idx, dtype=bool)
    for i, t in enumerate(reg_targets):
        tcfg = dataset.targets[t]
        weights[i] = tcfg.get("weight", 1)
        norm = tcfg.get("normalization", "standard")
        feat_idx = np.zeros_like(targets_idx)
        feat_idx[np.flatnonzero(targets_idx)[i]] = True
        if norm == "standard":
            center[i] = _avg_stat(dataset.get_mean_targets(), feat_idx, 0.0)
            scale[i] = _avg_stat(dataset.get_std_targets(), feat_idx, 1.0)
        elif norm == "min-max":
            center[i] = _avg_stat(dataset.get_min_targets(), feat_idx, 0.0)
            scale[i] = _avg_stat(dataset.get_max_targets(), feat_idx, 1.0) - center[i]
        center[i] = tcfg.get("center_override", center[i])
        scale[i] = tcfg.get("scale_override", scale[i])
        scale[i] *= tcfg.get("scale_mult", 1.0)

    loss_strs = get("reg_loss_fn", "smoothl1") or "smoothl1"
    loss_names = tuple(s.strip() for s in str(loss_strs).split(",") if s.strip())
    for s in loss_names:
        if s not in REG_LOSSES:
            raise ValueError(f"Unknown reg loss: {s}")
    return InstanceSpec(
        num_reg_targets=n, scale=scale.astype(np.float32),
        center=center.astype(np.float32), weights=weights.astype(np.float32),
        loss_names=loss_names,
        out_activation=str(get("reg_out_activation", "linear") or "linear").lower(),
        report_activation=str(get("reg_out_report_activation", "linear")
                              or "linear").lower(),
        double_batch=bool(get("double_batch", getattr(dataset, "double_batch",
                                                      False))),
    )


def convert_outputs(spec: InstanceSpec, raw: jnp.ndarray) -> jnp.ndarray:
    """Head output -> standardized regression predictions (base.py:141-148)."""
    return OUT_ACT[spec.out_activation](raw[:, : spec.num_reg_targets])


def compute_reg_loss(spec: InstanceSpec, reg_out: jnp.ndarray,
                     y_reg: jnp.ndarray, y_mask: jnp.ndarray,
                     training: bool) -> jnp.ndarray:
    """Standardized masked regression loss (base.py:154-179).

    reg_out: [B,T] standardized predictions; y_reg: [B,T] raw targets (NaN ok
    at masked entries); y_mask: [B,T] bool. Returns total loss scalar
    (= mean(weights) * sum of loss fns), matching `loss += weights.mean() *
    loss_reg` — the reference averages target weights rather than weighting
    per-target.
    """
    scale = jnp.asarray(spec.scale)
    center = jnp.asarray(spec.center)
    y_safe = jnp.where(y_mask, jnp.nan_to_num(y_reg), 0.0)
    labels = (y_safe - center) / scale

    if training and spec.double_batch:
        out1, out2 = reg_out[0::2], reg_out[1::2]
        labels_p = labels[0::2]
        mask_p = y_mask[0::2]

        def masked_loss(fn):
            el = 0.5 * fn(out1, labels_p) + 0.5 * fn(out2, labels_p)
            w = mask_p.astype(el.dtype)
            return jnp.sum(el * w) / jnp.maximum(jnp.sum(w), 1.0)
    else:
        def masked_loss(fn):
            el = REG_LOSSES_APPLY(fn, reg_out, labels)
            w = y_mask.astype(el.dtype)
            return jnp.sum(el * w) / jnp.maximum(jnp.sum(w), 1.0)

    loss_reg = jnp.asarray(0.0, reg_out.dtype)
    for name in spec.loss_names:
        loss_reg = loss_reg + masked_loss(REG_LOSSES[name])
    return jnp.mean(jnp.asarray(spec.weights)) * loss_reg


def REG_LOSSES_APPLY(fn, out, labels):
    return fn(out, labels)


def reg_output(spec: InstanceSpec, reg_out: jnp.ndarray) -> jnp.ndarray:
    """De-standardize + report activation (base.py:181-185)."""
    out = reg_out * jnp.asarray(spec.scale) + jnp.asarray(spec.center)
    return OUT_ACT[spec.report_activation](out)
