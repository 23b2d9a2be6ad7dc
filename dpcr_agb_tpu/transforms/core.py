"""Transform-layer core: sample dict conventions, masking, registry, composition.

A *sample* is a plain dict of numpy arrays:
  * ``pos`` [N,3] float32 — always present
  * per-point arrays (leading dim == N): ``x``, ``ones``, ``pos_z``,
    ``xy_distance``, ``coords``, ...
  * per-sample arrays/scalars: ``y_reg`` [T], ``y_reg_mask`` [T], ``area_idx``,
    ``label_idx``, ``stats``, ``grid_size``, ...

Every transform is a callable ``t(rng, sample) -> sample`` taking an explicit
``np.random.Generator`` — no global RNG anywhere, so a worker's pipeline is a
pure function of (seed, epoch, sample index).  This replaces the reference's
implicit `random`/`torch.rand` streams (randomness parity is statistical, see
SURVEY.md §7 hard-part 5).

Masking semantics mirror the reference's ``apply_mask``
(core/data_transform/transforms.py:1090-1095): every array whose leading dim
equals len(pos) is masked, except keys in ``skip_list``.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

Sample = Dict[str, Any]

# registry name -> class
TRANSFORM_REGISTRY: Dict[str, type] = {}


def register(cls=None, *, name: Optional[str] = None):
    def wrap(c):
        key = name or c.__name__
        if key in TRANSFORM_REGISTRY and TRANSFORM_REGISTRY[key] is not c:
            raise ValueError(f"Duplicate transform registration: {key}")
        TRANSFORM_REGISTRY[key] = c
        return c
    return wrap(cls) if cls is not None else wrap


def num_points(sample: Sample) -> int:
    return int(sample["pos"].shape[0])


def _is_pointwise(key: str, value: Any, n: int, skip: Sequence[str]) -> bool:
    return (
        isinstance(value, np.ndarray)
        and value.ndim >= 1
        and value.shape[0] == n
        and key not in skip
    )


def apply_mask(sample: Sample, mask: np.ndarray, skip_list: Sequence[str] = ()) -> Sample:
    """Boolean-mask all per-point arrays (reference transforms.py:1090-1095)."""
    n = num_points(sample)
    out = dict(sample)
    for k, v in sample.items():
        if _is_pointwise(k, v, n, skip_list):
            out[k] = v[mask]
    return out


def apply_index(sample: Sample, idx: np.ndarray, skip_list: Sequence[str] = ()) -> Sample:
    """Index/reorder all per-point arrays; `pos` is always indexed (reference
    FixedPointsOwn semantics, transforms.py:1312-1361). Arrays with leading
    dim 1 are left alone (per-sample rows)."""
    n = num_points(sample)
    out = dict(sample)
    for k, v in sample.items():
        if k == "pos" or (_is_pointwise(k, v, n, skip_list) and v.shape[0] != 1):
            out[k] = v[idx]
    return out


def unique_int_rows(rows: np.ndarray):
    """(uniq, inverse) for integer-valued [N, D] rows — a fast replacement for
    ``np.unique(rows, axis=0, return_inverse=True)`` on the loader hot path.

    numpy's axis=0 unique views each row as raw bytes and sorts the void
    array, which costs ~5 ms per 16k-point cloud and dominated the transform
    pipeline (GridSampling3D was 72% of host loader time). Packing the
    columns into one mixed-radix int64 key and stable-sorting scalars is ~7x
    faster. Unique rows come back in numeric-lexicographic order (numpy's
    byte order differs for floats/negatives; no caller depends on row order).
    Rows must hold integral values (floor/round outputs); falls back to
    np.unique when the packed key would overflow int64.
    """
    if len(rows) == 0:  # degenerate plot (all points filtered upstream)
        return rows.copy(), np.empty(0, dtype=np.int64)
    c = rows.astype(np.int64) if rows.dtype != np.int64 else rows
    lo = c.min(axis=0)
    c = c - lo
    radix = c.max(axis=0).astype(np.int64) + 1
    bits = sum(int(r - 1).bit_length() for r in radix)
    if bits > 62:  # key overflow (never for plot-sized voxel grids)
        uniq, inverse = np.unique(rows, axis=0, return_inverse=True)
        return uniq, inverse.ravel()
    key = c[:, 0]
    for d in range(1, c.shape[1]):
        key = key * radix[d] + c[:, d]
    order = np.argsort(key, kind="stable")
    sk = key[order]
    isnew = np.empty(len(sk), dtype=bool)
    if len(sk):
        isnew[0] = True
        np.not_equal(sk[1:], sk[:-1], out=isnew[1:])
    inverse = np.empty(len(sk), dtype=np.int64)
    inverse[order] = np.cumsum(isnew) - 1
    uniq = rows[order[isnew]]
    return uniq, inverse


def shuffle_sample(rng: np.random.Generator, sample: Sample) -> Sample:
    """Permute all per-point arrays together (reference grid_transform.py:22-29;
    note: the reference shuffles *every* same-length tensor, ignoring skip lists)."""
    n = num_points(sample)
    perm = rng.permutation(n)
    out = dict(sample)
    for k, v in sample.items():
        if isinstance(v, np.ndarray) and v.ndim >= 1 and v.shape[0] == n:
            out[k] = v[perm]
    return out


class Transform:
    """Base class: subclasses implement __call__(rng, sample) -> sample."""

    def __call__(self, rng: np.random.Generator, sample: Sample) -> Sample:
        raise NotImplementedError

    def __repr__(self):
        attrs = ", ".join(f"{k}={v!r}" for k, v in vars(self).items()
                          if not k.startswith("_"))
        return f"{type(self).__name__}({attrs})"


class Compose(Transform):
    def __init__(self, transforms: List[Callable]):
        self.transforms = list(transforms)

    def __call__(self, rng, sample):
        for t in self.transforms:
            sample = t(rng, sample)
        return sample

    def __repr__(self):
        body = "\n".join(f"    {t!r}," for t in self.transforms)
        return f"Compose([\n{body}\n])"


def _to_plain(obj):
    """Cfg/list wrappers -> plain python."""
    if hasattr(obj, "to_dict"):
        return obj.to_dict()
    if isinstance(obj, dict):
        return {k: _to_plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_plain(v) for v in obj]
    return obj


def instantiate_transform(entry) -> Transform:
    """Build one transform from a config entry {transform: Name, params: {...}}
    (reference core/data_transform/__init__.py:18-45)."""
    entry = _to_plain(entry)
    name = entry["transform"]
    params = entry.get("params", {}) or {}
    if name not in TRANSFORM_REGISTRY:
        raise ValueError(f"Unknown transform: {name}. "
                         f"Known: {sorted(TRANSFORM_REGISTRY)}")
    return TRANSFORM_REGISTRY[name](**params)


def _flatten(entries):
    """Arbitrary list nesting is allowed so YAML presets can splice shared
    pipeline fragments with anchors/interpolations ([*prefix, *suffix],
    [${a}, ${b.test_transform}])."""
    for e in entries:
        if isinstance(e, (list, tuple)):
            yield from _flatten(e)
        else:
            yield e


def instantiate_transforms(cfg_list) -> Compose:
    """Build a Compose from a config list (reference __init__.py:48-94)."""
    if cfg_list is None:
        return Compose([])
    return Compose([instantiate_transform(e)
                    for e in _flatten(_to_plain(cfg_list))])


@register
class ClampBatchSize:
    """Drops samples from a batch when the cumulative point count exceeds
    ``num_points`` (reference core/data_transform/prebatchcollate.py:6-43).

    BATCH-LEVEL transform: called with the sample LIST just before collate
    (Loader ``pre_batch_collate``), not per-sample. Dropped samples shrink
    the effective batch; the fixed-shape collate pads the batch back to
    size with fully-masked rows, so device shapes are unchanged (the
    static-shape analogue of the reference's smaller dynamic batch).
    Divergence: where the reference can return an EMPTY list, at least the
    smallest sample is kept so a batch always exists."""

    batch_level = True

    def __init__(self, num_points: int = 100000):
        self._num_points = int(num_points)

    def __call__(self, samples: List[Sample]) -> List[Sample]:
        total = 0
        out = []
        for s in samples:
            n = len(s["pos"])
            if self._num_points and total + n > self._num_points:
                continue
            total += n
            out.append(s)
        if not out and samples:
            out = [min(samples, key=lambda s: len(s["pos"]))]
        if len(out) < len(samples):
            import logging
            logging.getLogger(__name__).warning(
                "ClampBatchSize: %d points exceed the %d budget; batch "
                "truncated to %d of %d samples",
                sum(len(s["pos"]) for s in samples), self._num_points,
                len(out), len(samples))
        return out

    def __repr__(self):
        return f"ClampBatchSize(num_points={self._num_points})"


def instantiate_batch_transforms(cfg_list) -> Optional[Callable]:
    """Compose BATCH-LEVEL transforms (list-of-samples -> list-of-samples),
    e.g. ClampBatchSize, from a preset's ``pre_batch_collate_transform``
    list. Returns None when the list is empty (no loader hook)."""
    if cfg_list is None:
        return None
    ts = [instantiate_transform(e) for e in _flatten(_to_plain(cfg_list))]
    for t in ts:
        if not getattr(t, "batch_level", False):
            raise ValueError(
                f"{t!r} is not a batch-level transform (expected e.g. "
                "ClampBatchSize in pre_batch_collate_transform)")
    if not ts:
        return None

    def apply(samples):
        for t in ts:
            samples = t(samples)
        return samples
    return apply


@register
class LotteryTransform(Transform):
    """Draw one transform uniformly per call (reference __init__.py:104-127)."""

    def __init__(self, transform_options):
        self.choices = instantiate_transforms(transform_options).transforms

    def __call__(self, rng, sample):
        return self.choices[rng.integers(len(self.choices))](rng, sample)


@register
class ComposeTransform(Transform):
    """Nested Compose from YAML (reference __init__.py:130-163)."""

    def __init__(self, transform_options):
        self.transform = instantiate_transforms(transform_options)

    def __call__(self, rng, sample):
        return self.transform(rng, sample)


@register
class RandomParamTransform(Transform):
    """Re-instantiate a transform with uniformly drawn parameters on every
    call (reference __init__.py:166-249). Each param spec is either
    {min, max, type: float|int} or {value: ...}."""

    def __init__(self, transform_name, transform_params):
        self.transform_name = transform_name
        self.transform_params = _to_plain(transform_params)

    def _draw(self, rng):
        params = {}
        for key, spec in self.transform_params.items():
            if "min" in spec and "max" in spec:
                v = rng.random() * (spec["max"] - spec["min"]) + spec["min"]
                params[key] = int(v) if spec.get("type") == "int" else float(v)
            elif "value" in spec:
                params[key] = spec["value"]
            else:
                raise NotImplementedError(f"param spec {spec!r}")
        return instantiate_transform(
            {"transform": self.transform_name, "params": params})

    def __call__(self, rng, sample):
        return self._draw(rng)(rng, sample)
