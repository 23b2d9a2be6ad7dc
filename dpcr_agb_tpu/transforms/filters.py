"""Sample-level filters and point-class filters
(reference core/data_transform/filters.py:9-138).

Sample filters return a bool (keep the whole sample); ClassificationFilter is a
point transform that masks points by a class channel of x.
"""
from __future__ import annotations

import numpy as np

from .core import Transform, num_points, register


@register
class FCompose:
    """filters.py:9-37 — compose sample filters with a boolean op."""

    def __init__(self, list_filter, boolean_operation=np.logical_and):
        assert len(list_filter) > 0
        self.list_filter = list_filter
        self.boolean_operation = boolean_operation

    def __call__(self, rng, sample) -> bool:
        res = self.list_filter[0](rng, sample)
        for f in self.list_filter:
            res = self.boolean_operation(res, f(rng, sample))
        return bool(res)


@register
class PlanarityFilter:
    """filters.py:40-66 — keep samples by planarity of the covariance spectrum."""

    def __init__(self, thresh=0.3, is_leq=True):
        self.thresh, self.is_leq = thresh, is_leq

    def __call__(self, rng, sample) -> bool:
        pos = sample["pos"].astype(np.float64)
        centered = pos - pos.mean(axis=0, keepdims=True)
        cov = centered.T @ centered / len(pos)
        eig = np.sort(np.linalg.eigvalsh(cov))
        planarity = (eig[1] - eig[0]) / eig[2]
        return planarity <= self.thresh if self.is_leq else planarity > self.thresh


@register
class RandomFilter:
    """filters.py:69-86 — keep a sample with probability thresh."""

    def __init__(self, thresh=0.3):
        self.thresh = thresh

    def __call__(self, rng, sample) -> bool:
        return rng.random() < self.thresh


@register
class ClassificationFilter(Transform):
    """filters.py:89-138 — keep/remove points by a classification channel of x
    (e.g. LAS ground class 2 in the noground variant), optionally dropping the
    channel afterwards."""

    def __init__(self, feature_index: int, class_indices: list, keep: bool = True,
                 remove_feat: bool = True):
        self.feature_index = feature_index
        self.class_indices = list(class_indices)
        self.keep = keep
        self.remove_feat = remove_feat

    def __call__(self, rng, sample):
        x = sample["x"]
        cls = x[:, self.feature_index]
        mask = np.isin(cls, self.class_indices)
        if not self.keep:
            mask = ~mask
        n = num_points(sample)
        out = dict(sample)
        for key, item in sample.items():
            if (isinstance(item, np.ndarray) and item.ndim >= 1
                    and item.shape[0] == n and item.shape[0] != 1):
                out[key] = item[mask]
        if self.remove_feat:
            xf = out["x"]
            if xf.shape[1] == 1:
                out["x"] = None
            else:
                out["x"] = np.concatenate(
                    [xf[:, :self.feature_index], xf[:, self.feature_index + 1:]],
                    axis=1)
        return out
