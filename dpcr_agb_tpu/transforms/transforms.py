"""Point-cloud transforms (host-side numpy, explicit PRNG).

Each class documents the reference implementation it reproduces
(paths relative to /root/reference/torch-points3d/torch_points3d/).
Known reference bugs are FIXED here and noted inline (SURVEY.md §7 item 6).
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence

import numpy as np

from .core import (Sample, Transform, apply_index, apply_mask, num_points,
                   register, shuffle_sample)
from .geometry import (affine2d, dbscan1d_labels,
                       euler_angles_to_rotation_matrix, points_in_polygon,
                       transform_points2d)


# ---------------------------------------------------------------------------
# position scaling / centering
# ---------------------------------------------------------------------------

@register
class ScalePos(Transform):
    """core/data_transform/transforms.py:590-601 — mul/div pos by per-axis scale."""

    def __init__(self, scale_x=1.0, scale_y=1.0, scale_z=1.0, op="mul"):
        self.scale = np.array([[scale_x, scale_y, scale_z]], dtype=np.float32)
        self.op = op

    def __call__(self, rng, sample):
        pos = sample["pos"]
        sample = dict(sample)
        sample["pos"] = pos * self.scale if self.op == "mul" else pos / self.scale
        return sample


@register
class MoveCenterPosPerSample(Transform):
    """transforms.py:723-744 — constant shift of pos by (center_x/y/z)."""

    def __init__(self, center_x=0.5, center_y=0.5, center_z=0.5):
        self.center = np.array([[center_x, center_y, center_z]], dtype=np.float32)

    def __call__(self, rng, sample):
        sample = dict(sample)
        sample["pos"] = sample["pos"] + self.center
        return sample


@register
class StartZFromZero(Transform):
    """transforms.py:766-771 — z -= z.min()."""

    def __call__(self, rng, sample):
        pos = sample["pos"].copy()
        pos[:, 2] -= pos[:, 2].min()
        sample = dict(sample)
        sample["pos"] = pos
        return sample


def _mean_center(pos):
    return pos.mean(axis=0, keepdims=True)


def _quantile_center(pos):
    return (np.quantile(pos, 0.99, axis=0, keepdims=True)
            + np.quantile(pos, 0.01, axis=0, keepdims=True)) / 2.0


def _maxmin_center(pos):
    return (pos.max(axis=0, keepdims=True) + pos.min(axis=0, keepdims=True)) / 2.0


@register
class CenterPosPerSample(Transform):
    """transforms.py:604-657 — subtract a center (mean/quantile/maxmin) on
    selected axes."""

    _AGGS = {"mean": _mean_center, "quantile": _quantile_center,
             "maxmin": _maxmin_center}

    def __init__(self, center_x=True, center_y=True, center_z=False, center="mean"):
        self.mask = np.array([[center_x, center_y, center_z]], dtype=np.float32)
        if center not in self._AGGS:
            raise ValueError(f"Unknown center function: {center}")
        self.agg = self._AGGS[center]

    def __call__(self, rng, sample):
        if not self.mask.any():
            return sample
        sample = dict(sample)
        sample["pos"] = sample["pos"] - (
            self.agg(sample["pos"]) * self.mask).astype(np.float32)
        return sample


@register
class FixedCenterPosPerSample(Transform):
    """transforms.py:697-720 — recenter maxmin-center at (center_x/y/z)."""

    def __init__(self, center_x=0.5, center_y=0.5, center_z=0.5):
        self.center = np.array([[center_x, center_y, center_z]], dtype=np.float32)

    def __call__(self, rng, sample):
        pos = sample["pos"]
        pos = pos - _maxmin_center(pos) + self.center
        sample = dict(sample)
        sample["pos"] = pos.astype(np.float32)
        return sample


@register
class CenterXYbyZ(Transform):
    """transforms.py:660-694 — center xy on the maxmin midpoint of points whose
    z lies in a band; records pos_deviation and pos_center_points."""

    def __init__(self, center_x=0.0, center_y=0.0, z_thresh_min=0.0, z_thresh_max=1.0):
        self.z_min, self.z_max = z_thresh_min, z_thresh_max
        self.center = np.array([[center_x, center_y]], dtype=np.float32)

    def __call__(self, rng, sample):
        pos = sample["pos"].copy()
        zsel = (self.z_min < pos[:, 2]) & (pos[:, 2] < self.z_max)
        xy = pos[:, :2]
        amax = xy[zsel].max(axis=0, keepdims=True)
        amin = xy[zsel].min(axis=0, keepdims=True)
        pos[:, :2] = xy - (amax + amin) / 2.0 + self.center
        sample = dict(sample)
        sample["pos"] = pos
        sample["pos_deviation"] = (amax - amin).astype(np.float32)
        sample["pos_center_points"] = np.int64(zsel.sum())
        return sample


# ---------------------------------------------------------------------------
# random geometric augmentation
# ---------------------------------------------------------------------------

@register
class RandomNoise(Transform):
    """transforms.py:482-506 — clipped isotropic gaussian jitter with prob p."""

    def __init__(self, sigma=0.01, clip=0.05, p: Optional[float] = None):
        self.sigma, self.clip = sigma, clip
        self.p = 1.0 if p is None else p

    def __call__(self, rng, sample):
        if rng.random() < self.p:
            # float32 generation: ~2x cheaper than f64-then-cast on the
            # loader hot path, same distribution
            noise = np.clip(self.sigma * rng.standard_normal(
                sample["pos"].shape, dtype=np.float32),
                -self.clip, self.clip)
            sample = dict(sample)
            sample["pos"] = (sample["pos"] + noise).astype(np.float32)
        return sample


@register
class Random3AxisRotation(Transform):
    """features.py:12-65 — random Euler rotation; per-axis angle sampled with
    prob p within ±rot_axis degrees; axis matrices composed in random order."""

    def __init__(self, apply_rotation=True, rot_x=None, rot_y=None, rot_z=None,
                 p: Optional[float] = None):
        self.apply_rotation = apply_rotation
        if apply_rotation and rot_x is None and rot_y is None and rot_z is None:
            raise ValueError("At least one rot_ should be defined")
        self.degrees = [abs(min(r, 180)) if r else 0 for r in (rot_x, rot_y, rot_z)]
        self.p = 1.0 if p is None else p

    def __call__(self, rng, sample):
        if not self.apply_rotation:
            return sample
        thetas = np.zeros(3)
        for ax, deg in enumerate(self.degrees):
            if deg > 0 and rng.random() < self.p:
                thetas[ax] = np.deg2rad(rng.random() * 2 * deg - deg)
        order = rng.permutation(3)
        M = euler_angles_to_rotation_matrix(thetas, order=tuple(order))
        sample = dict(sample)
        sample["pos"] = (sample["pos"] @ M.T).astype(np.float32)
        if sample.get("norm") is not None:
            sample["norm"] = (sample["norm"] @ M.T).astype(np.float32)
        return sample


@register
class RandomShiftPos(Transform):
    """transforms.py:747-763 — shift all points by one uniform offset.

    Reference fixes applied: the reference (a) triggers on rand() > p (inverted
    probability; identical at the preset's p=0.5) and (b) reuses max_y for the
    z bound. We apply with prob p and honor max_z. The z divergence is nil in
    the NFI presets because StartZFromZero follows and cancels constant z shifts.
    """

    def __init__(self, max_x=0.01, max_y=0.01, max_z=0.01, p=0.5):
        self.max = np.array([[max_x, max_y, max_z]], dtype=np.float32)
        self.p = p

    def __call__(self, rng, sample):
        if rng.random() < self.p:
            shift = (rng.random((1, 3)).astype(np.float32) * 2 * self.max) - self.max
            sample = dict(sample)
            sample["pos"] = sample["pos"] + shift
        return sample


@register
class RandomScaling(Transform):
    """transforms.py:876-914 — per-axis random scale in [a, b]."""

    def __init__(self, scales=None):
        assert scales is not None and len(scales) == 2 and scales[0] <= scales[1]
        self.scales = scales

    def __call__(self, rng, sample):
        scale = (self.scales[0]
                 + rng.random(3).astype(np.float32) * (self.scales[1] - self.scales[0]))
        sample = dict(sample)
        sample["pos"] = sample["pos"] * scale
        if sample.get("norm") is not None:
            norm = sample["norm"] / scale
            sample["norm"] = norm / np.linalg.norm(norm, axis=1, keepdims=True)
        return sample


@register
class RandomSymmetry(Transform):
    """transforms.py:457-479 — mirror each enabled axis with prob 0.5 about its max."""

    def __init__(self, axis=(False, False, False)):
        self.axis = list(axis)

    def __call__(self, rng, sample):
        pos = sample["pos"]
        for i, ax in enumerate(self.axis):
            if ax and rng.random() < 0.5:
                pos = pos.copy()
                pos[:, i] = pos[:, i].max() - pos[:, i]
        sample = dict(sample)
        sample["pos"] = pos
        return sample


@register
class RandomTranslation(Transform):
    """features.py:69-90 — one uniform translation in [delta_min, delta_max]."""

    def __init__(self, delta_max=(1.0, 1.0, 1.0), delta_min=(-1.0, -1.0, -1.0)):
        self.delta_max = np.asarray(delta_max, dtype=np.float32)
        self.delta_min = np.asarray(delta_min, dtype=np.float32)

    def __call__(self, rng, sample):
        trans = rng.random(3).astype(np.float32) * (
            self.delta_max - self.delta_min) + self.delta_min
        sample = dict(sample)
        sample["pos"] = sample["pos"] + trans
        return sample


# ---------------------------------------------------------------------------
# point-count changing transforms
# ---------------------------------------------------------------------------

def _fixed_points_choice(rng, num_nodes: int, num: int, replace: bool,
                         allow_duplicates: bool) -> np.ndarray:
    """Index choice of FixedPointsOwn (transforms.py:1336-1346)."""
    if replace:
        return rng.integers(0, num_nodes, size=num)
    if not allow_duplicates:
        return rng.permutation(num_nodes)[:num]
    reps = math.ceil(num / num_nodes)
    return np.concatenate([rng.permutation(num_nodes) for _ in range(reps)])[:num]


@register
class FixedPointsOwn(Transform):
    """transforms.py:1312-1361 — sample exactly `num` points (resampling with
    minimal duplication when fewer are present)."""

    def __init__(self, num, replace=False, allow_duplicates=True, skip_list=None):
        self.num = num
        self.replace = replace
        self.allow_duplicates = allow_duplicates
        self.skip_list = list(skip_list or [])

    def __call__(self, rng, sample):
        n = num_points(sample)
        idx = _fixed_points_choice(rng, n, self.num, self.replace,
                                   self.allow_duplicates)
        out = apply_index(sample, idx, self.skip_list)
        assert out["pos"].shape[0] == self.num
        return out


@register
class MaxPoints(Transform):
    """transforms.py:1768-1796 — subsample (no duplicates) when > num points."""

    def __init__(self, num, skip_list=None):
        self.num = num
        self.inner = FixedPointsOwn(num, replace=False, allow_duplicates=False,
                                    skip_list=skip_list)

    def __call__(self, rng, sample):
        if num_points(sample) > self.num:
            return self.inner(rng, sample)
        return sample


@register
class MinPoints(Transform):
    """transforms.py:1742-1765 — upsample (duplicate) to num when fewer are
    present, using a FIXED RandomState(42) stream for determinism."""

    def __init__(self, num, skip_list=None):
        self.num = num
        self.inner = FixedPointsOwn(num, replace=False, allow_duplicates=True,
                                    skip_list=skip_list)

    def __call__(self, rng, sample):
        if num_points(sample) < self.num:
            return self.inner(np.random.default_rng(42), sample)
        return sample


@register
class RandomDropout(Transform):
    """transforms.py:1060-1087 — with prob dropout_application_ratio keep a
    (1 - dropout_ratio) fraction of points (never below min_points)."""

    def __init__(self, dropout_ratio=0.2, dropout_application_ratio=0.5,
                 min_points=0, skip_list=None):
        self.dropout_ratio = dropout_ratio
        self.dropout_application_ratio = dropout_application_ratio
        self.min_points = min_points
        self.skip_list = list(skip_list or [])

    def __call__(self, rng, sample):
        n = num_points(sample)
        if n > self.min_points and rng.random() < self.dropout_application_ratio:
            keep = int(n * (1 - self.dropout_ratio))
            return FixedPointsOwn(keep, skip_list=self.skip_list)(rng, sample)
        return sample


@register
class RandomGroundRemoval(Transform):
    """transforms.py:1131-1150 — remove points below a uniform threshold in
    [min_v, max_v] and shift z down by it; skipped if < min_points survive."""

    def __init__(self, min_v, max_v, p=0.5, min_points=500, skip_list=None):
        self.min_v, self.max_v, self.p = min_v, max_v, p
        self.min_points = min_points
        self.skip_list = list(skip_list or [])

    def __call__(self, rng, sample):
        if rng.random() >= self.p:
            return sample
        remove_v = rng.random() * (self.max_v - self.min_v) + self.min_v
        z = sample["pos"][:, 2]
        cond = z > remove_v
        if cond.sum() < self.min_points:
            return sample
        pos = sample["pos"].copy()
        pos[:, 2] -= remove_v
        sample = dict(sample)
        sample["pos"] = pos
        return apply_mask(sample, cond, self.skip_list)


@register
class AddRandomPoints(Transform):
    """transforms.py:775-823 — add ratio*N uniform points inside the cloud bbox
    (cap at n_max_points total).

    Reference bug fixed: the reference computes both bbox corners with amin
    (transforms.py:805-806), so every added point lands exactly on the min
    corner; we sample uniformly in the true [min, max] box as documented.
    """

    def __init__(self, n_max_points, add_ratio_min, add_ratio_max, p=0.5):
        self.n_max_points = n_max_points
        self.add_ratio_min, self.add_ratio_max = add_ratio_min, add_ratio_max
        self.p = p

    def __call__(self, rng, sample):
        n = num_points(sample)
        if n >= self.n_max_points or rng.random() >= self.p:
            return sample
        ratio = rng.random() * (self.add_ratio_max - self.add_ratio_min) \
            + self.add_ratio_min
        n_add = int(ratio * n)
        n_add += min(0, self.n_max_points - (n + n_add))
        if n_add <= 0:
            return sample
        pos = sample["pos"]
        lo, hi = pos.min(axis=0), pos.max(axis=0)
        new_pts = (rng.random((n_add, pos.shape[1])).astype(np.float32)
                   * (hi - lo) + lo)
        sample = dict(sample)
        sample["pos"] = np.concatenate([pos, new_pts], axis=0)
        return sample


@register
class CopyJitterRandomPoints(Transform):
    """transforms.py:826-873 — duplicate random points with clipped jitter,
    copying per-point features/labels unchanged."""

    def __init__(self, n_max_points, add_ratio_min, add_ratio_max, sigma, clip, p=0.5):
        self.n_max_points = n_max_points
        self.add_ratio_min, self.add_ratio_max = add_ratio_min, add_ratio_max
        self.sigma, self.clip, self.p = sigma, clip, p

    def __call__(self, rng, sample):
        n = num_points(sample)
        if n >= self.n_max_points or rng.random() >= self.p:
            return sample
        ratio = rng.random() * (self.add_ratio_max - self.add_ratio_min) \
            + self.add_ratio_min
        n_add = int(ratio * n)
        n_add += min(0, self.n_max_points - (n + n_add))
        if n_add <= 0:
            return sample
        idx = rng.integers(0, n, size=n_add)
        noise = np.clip(self.sigma * rng.standard_normal((n_add, 3)),
                        -self.clip, self.clip).astype(np.float32)
        out = dict(sample)
        out["pos"] = np.concatenate([sample["pos"], sample["pos"][idx] + noise], 0)
        for key in ("x", "y"):
            v = sample.get(key)
            if isinstance(v, np.ndarray) and v.ndim >= 1 and v.shape[0] == n:
                out[key] = np.concatenate([v, v[idx]], axis=0)
        return out


@register
class AddGround(Transform):
    """transforms.py:1719-1739 — if nearly empty, REPLACE the cloud with
    n_points synthetic ground points (z=0) — reference replaces, not appends."""

    def __init__(self, max_points, n_points, xy_min=0.0, xy_max=1.0):
        self.max_points, self.n_points = max_points, n_points
        self.xy_min, self.xy_range = xy_min, (xy_max - xy_min) / 2.0

    def __call__(self, rng, sample):
        if num_points(sample) < self.max_points:
            pos = rng.random((self.n_points, 3)).astype(np.float32) \
                * self.xy_range + self.xy_min
            pos[:, 2] = 0.0
            sample = dict(sample)
            sample["pos"] = pos
        return sample


# ---------------------------------------------------------------------------
# spatial crops / filters
# ---------------------------------------------------------------------------

@register
class ZFilter(Transform):
    """transforms.py:1607-1620 — keep points with z_min < z < z_max."""

    def __init__(self, z_min, z_max, skip_keys=()):
        # YAML 1.1 parses bare "-1e-5" as a string; coerce defensively
        self.z_min, self.z_max = float(z_min), float(z_max)
        self.skip_keys = list(skip_keys or [])

    def __call__(self, rng, sample):
        z = sample["pos"][:, 2]
        return apply_mask(sample, (z > self.z_min) & (z < self.z_max),
                          self.skip_keys)


@register
class CylinderExtend(Transform):
    """transforms.py:1364-1395 — keep points within xy-radius of the origin."""

    def __init__(self, radius, skip_list=None):
        self.radius = radius
        self.skip_list = list(skip_list or [])

    def __call__(self, rng, sample):
        xy = sample["pos"][:, :2]
        mask = (xy ** 2).sum(axis=1) <= self.radius ** 2
        return apply_mask(sample, mask, self.skip_list)


@register
class RectangleExtend(Transform):
    """transforms.py:1398-1428 — keep points inside a centered box.

    Reference bug fixed: transforms.py:1422-1424 tests `posx > -e_y` instead of
    `posy > -e_y`; we apply the mask per the documented semantics.
    """

    def __init__(self, e_x=1.0, e_y=1.0, e_z=1.0):
        self.e = np.array([e_x, e_y, e_z], dtype=np.float32)

    def __call__(self, rng, sample):
        pos = sample["pos"]
        mask = np.all((pos < self.e) & (pos > -self.e), axis=1)
        return apply_mask(sample, mask)


@register
class Polygon2dExtend(Transform):
    """transforms.py:1460-1498 — keep points inside a fixed 2D polygon (the NFI
    hexagon plot mask). Skeleton-point augmentation is not used by the NFI
    presets and is not implemented."""

    def __init__(self, polygon, skip_list=None, add_skeleton_pts=False,
                 num_skeleton_pts=100, height_skeleton_pts=1.0, cage_skeleton=False):
        if add_skeleton_pts:
            raise NotImplementedError("skeleton points unused by NFI presets")
        self.polygon = np.asarray(polygon, dtype=np.float64)
        self.skip_list = list(skip_list or [])

    def __call__(self, rng, sample):
        mask = points_in_polygon(sample["pos"][:, :2], self.polygon)
        return apply_mask(sample, mask, self.skip_list)


@register
class RandomPolygon2dExtend(Transform):
    """transforms.py:1501-1560 — pick a polygon, random scale/rotation about
    (0.5, 0.5), keep inside points (only if any survive)."""

    def __init__(self, polygons: List, skip_list=None, size_min=1.0, size_max=1.0,
                 rotate=180.0, add_skeleton_pts=False, num_skeleton_pts=100,
                 height_skeleton_pts=1.0, cage_skeleton=False):
        if add_skeleton_pts:
            raise NotImplementedError("skeleton points unused by NFI presets")
        self.polygons = [np.asarray(p, dtype=np.float64) if p != "None" else None
                         for p in polygons]
        self.size_min, self.size_max, self.rotate = size_min, size_max, rotate
        self.skip_list = list(skip_list or [])

    def __call__(self, rng, sample):
        poly = self.polygons[rng.integers(0, len(self.polygons))]
        if poly is None:
            return sample
        scale = rng.random() * (self.size_max - self.size_min) + self.size_min
        trans = (1 - scale) / 2.0
        deg = rng.random() * self.rotate * np.sign(rng.random() - 0.5)
        A = affine2d(scale=scale, translate=(trans, trans), rotate_deg=deg)
        verts = transform_points2d(A, poly)
        mask = points_in_polygon(sample["pos"][:, :2], verts)
        if mask.sum() > 0:
            sample = apply_mask(sample, mask, self.skip_list)
        return sample


@register
class EllipsoidCrop(Transform):
    """transforms.py:1558-1605 — crop an ellipsoid around a random point of the
    randomly-rotated cloud."""

    def __init__(self, a=1.0, b=1.0, c=1.0, rot_x=180, rot_y=180, rot_z=180):
        self.abc2 = np.array([a, b, c], dtype=np.float64) ** 2
        self.rotation = Random3AxisRotation(rot_x=rot_x, rot_y=rot_y, rot_z=rot_z)

    def __call__(self, rng, sample):
        i = rng.integers(0, num_points(sample))
        rotated = self.rotation(rng, dict(sample))
        centered = rotated["pos"] - rotated["pos"][i]
        mask = ((centered ** 2) / self.abc2).sum(axis=1) < 1
        return apply_mask(sample, mask)


@register
class CubeCrop(Transform):
    """transforms.py:1268-1309 — keep points inside a rotated cube of half-size
    c centered on a random voxel center."""

    def __init__(self, c=1.0, rot_x=180, rot_y=180, rot_z=180,
                 grid_size_center=0.01):
        self.c = c
        self.rotation = Random3AxisRotation(rot_x=rot_x, rot_y=rot_y, rot_z=rot_z)
        self.grid_size_center = grid_size_center

    def __call__(self, rng, sample):
        # random voxel center (via rounded-grid representative, as the reference
        # does with GridSampling3D(mode="last"))
        coords = np.round(sample["pos"] / self.grid_size_center)
        uniq = np.unique(coords, axis=0)
        center = uniq[rng.integers(0, len(uniq))] * self.grid_size_center
        moved = dict(sample)
        moved["pos"] = sample["pos"] - center
        moved = self.rotation(rng, moved)
        pos = moved["pos"] + center
        mask = np.all((pos - (center - self.c) > 0)
                      & ((center + self.c) - pos > 0), axis=1)
        return apply_mask(sample, mask)


# ---------------------------------------------------------------------------
# z-outlier removal (pre_transform path)
# ---------------------------------------------------------------------------

@register
class StatZOutlierRemoval(Transform):
    """transforms.py:509-523 — drop points with |z-zscore| >= threshold."""

    def __init__(self, threshold=4.0, skip_list=None):
        self.threshold = threshold
        self.skip_list = list(skip_list or [])

    def __call__(self, rng, sample):
        z = sample["pos"][:, 2]
        out = np.abs((z - z.mean()) / z.std())
        return apply_mask(sample, out < self.threshold, self.skip_list)


@register
class DBSCANZOutlierRemoval(Transform):
    """transforms.py:526-547 — 1D DBSCAN on z; keep the z range covered by
    non-noise points."""

    def __init__(self, eps=1.0, min_samples=10, skip_list=None):
        self.eps, self.min_samples = eps, min_samples
        self.skip_list = list(skip_list or [])

    def __call__(self, rng, sample):
        z = sample["pos"][:, 2]
        labels = dbscan1d_labels(z, self.eps, self.min_samples)
        keep = labels != -1
        if not keep.any():
            return sample
        mask = (z <= z[keep].max()) & (z >= z[keep].min())
        return apply_mask(sample, mask, self.skip_list)


@register
class OPTICSZOutlierRemoval(Transform):
    """transforms.py:546-565 — OPTICS (dbscan extraction) on z; keep the z
    range covered by non-noise points. sklearn stays host-side: this is a
    cold pre_transform path (unused by the NFI presets)."""

    def __init__(self, eps=1.0, min_samples=10, skip_list=None):
        self.eps, self.min_samples = eps, min_samples
        self.skip_list = list(skip_list or [])

    def __call__(self, rng, sample):
        from sklearn.cluster import OPTICS
        z = sample["pos"][:, 2]
        labels = OPTICS(eps=self.eps, min_samples=self.min_samples,
                        cluster_method="dbscan").fit_predict(z[:, None])
        keep = labels != -1
        if not keep.any():
            return sample
        mask = (z <= z[keep].max()) & (z >= z[keep].min())
        return apply_mask(sample, mask, self.skip_list)


@register
class KernelDensityZOutlierRemoval(Transform):
    """transforms.py:565-587 — gaussian KDE on z; keep the z range where
    log-density > log(p)."""

    def __init__(self, bandwidth=1.0, p=0.05, skip_list=None):
        self.bandwidth, self.p = bandwidth, p
        self.skip_list = list(skip_list or [])

    def __call__(self, rng, sample):
        from sklearn.neighbors import KernelDensity
        z = sample["pos"][:, 2:3].astype(np.float64)
        score = KernelDensity(kernel="gaussian", bandwidth=self.bandwidth) \
            .fit(z).score_samples(z)
        keep = score > np.log(self.p)
        if not keep.any():
            return sample
        zf = z[:, 0]
        mask = (zf <= zf[keep].max()) & (zf >= zf[keep].min())
        return apply_mask(sample, mask, self.skip_list)


@register
class DensityFilter(Transform):
    """Remove low-density points: count neighbors within radius_nn, keep
    points with more than min_num (reference transforms.py:1629-1660)."""

    def __init__(self, radius_nn: float = 0.04, min_num: int = 6,
                 skip_keys=()):
        self.radius_nn, self.min_num = radius_nn, min_num
        self.skip_keys = list(skip_keys or [])

    def __call__(self, rng, sample):
        from sklearn.neighbors import KDTree
        pos = sample["pos"]
        counts = KDTree(pos).query_radius(pos, self.radius_nn,
                                          count_only=True)
        mask = (counts - 1) > self.min_num  # exclude self like dist>0
        return apply_mask(sample, mask, self.skip_keys)


@register
class IrregularSampling(Transform):
    """Soft crop around a random grid-sampled center: keep prob decays with
    |p - center|^p (reference transforms.py:1663-1689)."""

    def __init__(self, d_half=2.5, p=2, grid_size_center=0.1, skip_keys=()):
        self.d_half, self.p = d_half, p
        self.grid_size = grid_size_center
        self.skip_keys = list(skip_keys or [])

    def __call__(self, rng, sample):
        pos = sample["pos"]
        cells = np.floor(pos / self.grid_size).astype(np.int64)
        _, first = np.unique(cells, axis=0, return_index=True)
        center = pos[first[rng.integers(0, len(first))]]
        d_p = (np.abs(pos - center) ** self.p).sum(1)
        sigma_2 = (self.d_half ** self.p) / (2 * np.log(2))
        thresh = np.exp(-d_p / (2 * sigma_2))
        mask = rng.random(len(pos)) < thresh
        return apply_mask(sample, mask, self.skip_keys)


@register
class PeriodicSampling(Transform):
    """Keep points at periodic radial distances from a random center
    (reference transforms.py:1692-1716)."""

    def __init__(self, period=0.1, prop=0.1, box_multiplier=1, skip_keys=()):
        self.pulse = 2 * np.pi / period
        self.thresh = np.cos(self.pulse * prop * period * 0.5)
        self.box_multiplier = box_multiplier
        self.skip_keys = list(skip_keys or [])

    def __call__(self, rng, sample):
        pos = sample["pos"]
        max_p, min_p = pos.max(0), pos.min(0)
        center = self.box_multiplier * rng.random(3).astype(np.float32) \
            * (max_p - min_p) + min_p
        d_p = np.linalg.norm(pos - center, axis=1)
        mask = np.cos(self.pulse * d_p) > self.thresh
        return apply_mask(sample, mask, self.skip_keys)
