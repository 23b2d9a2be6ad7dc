"""Feature-space augmentations (reference
core/data_transform/feature_augment.py:7-160) as pure (rng, sample)
transforms. The NFI LiDAR presets never use the chromatic ones (no rgb
channel in airborne plots) but the transform surface is kept complete;
`Jitter`/`DropFeature` work on any named feature array.
"""
from __future__ import annotations

import numpy as np

from .core import Sample, Transform, register


@register
class NormalizeRGB(Transform):
    """feature_augment.py:7-25 — scale rgb to [0,1] when it is 0-255."""

    def __init__(self, normalize: bool = True):
        self.normalize = normalize

    def __call__(self, rng, sample: Sample) -> Sample:
        rgb = np.asarray(sample["rgb"], np.float32)
        if self.normalize and not (rgb.max(initial=0) <= 1
                                   and rgb.min(initial=0) >= 0):
            rgb = rgb / 255.0
        sample = dict(sample)
        sample["rgb"] = rgb
        return sample


@register
class ChromaticTranslation(Transform):
    """feature_augment.py:28-49 — random global color shift (p=0.95)."""

    def __init__(self, trans_range_ratio: float = 1e-1):
        self.trans_range_ratio = trans_range_ratio

    def __call__(self, rng, sample: Sample) -> Sample:
        if rng.random() >= 0.95:
            return sample
        sample = dict(sample)
        tr = (rng.random((1, 3)).astype(np.float32) - 0.5) \
            * 2 * self.trans_range_ratio
        sample["rgb"] = np.clip(sample["rgb"] + tr, 0.0, 1.0)
        return sample


@register
class ChromaticAutoContrast(Transform):
    """feature_augment.py:52-86 — blend toward per-channel rescaled colors
    (p=0.2)."""

    def __init__(self, randomize_blend_factor: bool = True,
                 blend_factor: float = 0.5):
        self.randomize_blend_factor = randomize_blend_factor
        self.blend_factor = blend_factor

    def __call__(self, rng, sample: Sample) -> Sample:
        if rng.random() >= 0.2:
            return sample
        feats = np.asarray(sample["rgb"], np.float32)
        lo = feats.min(axis=0, keepdims=True)
        hi = feats.max(axis=0, keepdims=True)
        assert hi.max() > 0, "invalid color value. Color is supposed to be [0-255]"
        contrast = (feats - lo) / np.maximum(hi - lo, 1e-12)
        blend = (float(rng.random()) if self.randomize_blend_factor
                 else self.blend_factor)
        sample = dict(sample)
        sample["rgb"] = (1 - blend) * feats + blend * contrast
        return sample


@register
class ChromaticJitter(Transform):
    """feature_augment.py:90-112 — per-point gaussian color noise (p=0.95)."""

    def __init__(self, std: float = 0.01):
        self.std = std

    def __call__(self, rng, sample: Sample) -> Sample:
        if rng.random() >= 0.95:
            return sample
        sample = dict(sample)
        noise = rng.standard_normal(
            (sample["rgb"].shape[0], 3)).astype(np.float32) * self.std
        sample["rgb"] = np.clip(sample["rgb"] + noise, 0.0, 1.0)
        return sample


@register
class DropFeature(Transform):
    """feature_augment.py:115-137 — zero a named feature with probability."""

    def __init__(self, drop_proba: float = 0.2, feature_name: str = "rgb"):
        self.drop_proba = drop_proba
        self.feature_name = feature_name

    def __call__(self, rng, sample: Sample) -> Sample:
        if rng.random() >= self.drop_proba:
            return sample
        sample = dict(sample)
        sample[self.feature_name] = np.zeros_like(sample[self.feature_name])
        return sample


@register
class Jitter(Transform):
    """feature_augment.py:140-160 — gaussian noise on the assembled feature
    matrix `x` with probability p."""

    def __init__(self, mu: float = 0.0, sigma: float = 0.01, p: float = 0.95):
        self.mu = mu
        self.sigma = sigma
        self.p = p

    def __call__(self, rng, sample: Sample) -> Sample:
        if rng.random() >= self.p:
            return sample
        sample = dict(sample)
        x = np.asarray(sample["x"], np.float32)
        sample["x"] = x + rng.standard_normal(
            x.shape).astype(np.float32) * self.sigma + self.mu
        return sample
