"""Voxel-grid transforms (reference core/data_transform/grid_transform.py and
sparse_transforms.py), implemented with vectorized numpy.

GridSampling3D semantics (grid_transform.py:83-140):
  * coords = round(pos / size)                      <- ROUND, not floor
  * mode "last": shuffle all per-point arrays, then keep one random
    representative per voxel (the reference's consecutive_cluster scatter keeps
    the LAST index after shuffling — a uniform random representative)
  * mode "mean": scatter-mean float arrays; integer label keys get a majority
    vote (y, y_cls, instance_labels)
  * quantize_coords stores int32 voxel coords in sample['coords']
"""
from __future__ import annotations

import numpy as np

from .core import (Sample, Transform, num_points, register, shuffle_sample,
                   unique_int_rows)

_INTEGER_LABEL_KEYS = ["y", "y_cls", "instance_labels"]


def group_data(sample: Sample, inverse: np.ndarray, last_indices: np.ndarray,
               n_clusters: int, mode: str = "last", skip_keys=()) -> Sample:
    """Aggregate per-point arrays by voxel cluster (grid_transform.py:32-80)."""
    n = num_points(sample)
    out = dict(sample)
    for key, item in sample.items():
        if key in skip_keys or not (isinstance(item, np.ndarray)
                                    and item.ndim >= 1 and item.shape[0] == n):
            continue
        if mode == "last" or key == "batch" or key == "origin_id":
            out[key] = item[last_indices]
        elif mode == "mean":
            if key in _INTEGER_LABEL_KEYS and np.issubdtype(item.dtype, np.integer):
                # majority vote per cluster
                item_min = item.min()
                shifted = item - item_min
                k = int(shifted.max()) + 1
                votes = np.zeros((n_clusters, k), dtype=np.int64)
                np.add.at(votes, (inverse, shifted), 1)
                out[key] = (votes.argmax(axis=1) + item_min).astype(item.dtype)
            else:
                is_bool = item.dtype == np.bool_
                vals = item.astype(np.float64)
                sums = np.zeros((n_clusters,) + item.shape[1:], dtype=np.float64)
                np.add.at(sums, inverse, vals)
                counts = np.bincount(inverse, minlength=n_clusters).astype(np.float64)
                counts = counts.reshape((-1,) + (1,) * (item.ndim - 1))
                mean = sums / np.maximum(counts, 1)
                out[key] = mean.astype(bool if is_bool else np.float32)
    return out


@register
class GridSampling3D(Transform):
    def __init__(self, size, quantize_coords=False, mode="mean", verbose=False):
        assert mode in ("mean", "last")
        self.size = size
        self.quantize_coords = quantize_coords
        self.mode = mode

    def __call__(self, rng, sample):
        if self.mode == "last":
            sample = shuffle_sample(rng, sample)
        coords = np.round(sample["pos"] / self.size)
        uniq, inverse = unique_int_rows(coords)
        n_clusters = len(uniq)
        # last occurrence per cluster (matches PyG consecutive_cluster scatter)
        last_indices = np.zeros(n_clusters, dtype=np.int64)
        last_indices[inverse] = np.arange(len(inverse))
        sample = group_data(sample, inverse, last_indices, n_clusters,
                            mode=self.mode)
        if self.quantize_coords:
            sample["coords"] = (uniq if self.mode == "mean"
                                else coords[last_indices]).astype(np.int32)
        if self.mode == "mean":
            sample["pos"] = sample["pos"].astype(np.float32)
        sample["grid_size"] = np.array([self.size], dtype=np.float32)
        return sample


@register
class SaveOriginalPosId(Transform):
    """grid_transform.py:143-165 — add origin_id = arange(N) once."""

    KEY = "origin_id"

    def __call__(self, rng, sample):
        if self.KEY in sample:
            return sample
        sample = dict(sample)
        sample[self.KEY] = np.arange(num_points(sample), dtype=np.int64)
        return sample


@register
class RandomCoordsFlip(Transform):
    """sparse_transforms.py:24-60 — flip voxel coords about their max on each
    non-ignored axis with prob p."""

    def __init__(self, ignored_axis, is_temporal=False, p=0.95):
        assert 0 <= p <= 1
        mapping = {"x": 0, "y": 1, "z": 2}
        ignored = [mapping[a] for a in ignored_axis]
        d = 4 if is_temporal else 3
        self.flip_axes = sorted(set(range(d)) - set(ignored))
        self.p = p

    def __call__(self, rng, sample):
        coords = sample["coords"]
        for ax in self.flip_axes:
            if rng.random() < self.p:
                coords = coords.copy()
                coords[:, ax] = coords[:, ax].max() - coords[:, ax]
        sample = dict(sample)
        sample["coords"] = coords
        return sample


@register
class ShiftVoxels(Transform):
    """transforms.py:1032-1057 — add a random integer offset in [0,100) to the
    voxel coords with prob p (even/odd parity invariance trick)."""

    def __init__(self, apply_shift=True, p=0.5):
        self.apply_shift = apply_shift
        self.p = p

    def __call__(self, rng, sample):
        if self.apply_shift and rng.random() < self.p:
            if "coords" not in sample:
                raise ValueError("should quantize first using GridSampling3D")
            coords = sample["coords"]
            if not np.issubdtype(coords.dtype, np.integer):
                raise TypeError("coords are expected to be integer voxel coords")
            shift = (rng.random(3) * 100).astype(coords.dtype)
            sample = dict(sample)
            sample["coords"] = coords.copy()
            sample["coords"][:, :3] += shift
        return sample


@register
class ElasticDistortion(Transform):
    """grid_transform.py:168-231 — noise-grid trilinear distortion (unused by
    the NFI presets; provided for inventory parity)."""

    def __init__(self, apply_distorsion=True, granularity=(0.2, 0.8),
                 magnitude=(0.4, 1.6), p=0.5):
        self.apply_distorsion = apply_distorsion
        self.granularity = list(granularity)
        self.magnitude = list(magnitude)
        self.p = p

    @staticmethod
    def _distort(rng, pos, granularity, magnitude):
        from scipy.ndimage import uniform_filter, map_coordinates
        blurs = [np.ones((3, 1, 1)) / 3, np.ones((1, 3, 1)) / 3,
                 np.ones((1, 1, 3)) / 3]
        coords_min = pos.min(axis=0)
        dims = ((pos.max(axis=0) - coords_min) // granularity).astype(int) + 3
        noise = rng.standard_normal((*dims, 3)).astype(np.float32)
        from scipy.ndimage import convolve
        for _ in range(2):
            for blur in blurs:
                noise = np.stack(
                    [convolve(noise[..., c], blur, mode="constant")
                     for c in range(3)], axis=-1)
        sample_coords = (pos - coords_min) / granularity + 1
        disp = np.stack([
            map_coordinates(noise[..., c], sample_coords.T, order=1)
            for c in range(3)], axis=-1)
        return (pos + disp * magnitude).astype(np.float32)

    def __call__(self, rng, sample):
        if self.apply_distorsion and rng.random() < self.p:
            pos = sample["pos"]
            for g, m in zip(self.granularity, self.magnitude):
                pos = self._distort(rng, pos, g, m)
            sample = dict(sample)
            sample["pos"] = pos
        return sample
