"""Neighbor-count calibration (reference debugging.find_neighbour_dist +
DistributionNeighbour, utils/debugging_vars.py:22-48 and the untracked
neighborhood_limits calibration of KPConv): sample plots, run the KPConv
radius/subsampling pyramid on host (native C++ ops), and report per-layer
neighbor-count percentiles — the numbers to feed
`models.KPConv.extra_options.neighborhood_limits`.
"""
from __future__ import annotations

import logging
from typing import List, Sequence

import numpy as np

from .. import native

log = logging.getLogger(__name__)


def calibrate_neighborhood_limits(
        samples: Sequence[dict], first_subsampling_dl: float,
        conv_radius: float = 2.5, num_layers: int = 5,
        percentile: float = 90.0, max_k: int = 256) -> List[int]:
    """For each pyramid layer, the neighbor count covering `percentile`% of
    query neighborhoods. `samples` are transform-layer dicts with `pos`."""
    counts: List[List[int]] = [[] for _ in range(num_layers)]
    for sample in samples:
        pts = np.asarray(sample["pos"], np.float32)
        r = first_subsampling_dl * conv_radius
        for layer in range(num_layers):
            nbr = native.radius_neighbors(pts, pts, r, max_k)
            counts[layer].extend((nbr < len(pts)).sum(axis=1).tolist())
            if layer < num_layers - 1:
                dl = 2 * r / conv_radius
                pts, _ = native.grid_subsample(pts, dl)
            r *= 2
    limits = []
    for layer in range(num_layers):
        arr = np.asarray(counts[layer])
        lim = int(np.percentile(arr, percentile)) if len(arr) else 0
        limits.append(max(lim, 1))
        log.info(
            f"layer {layer}: neighbors p50={np.percentile(arr, 50):.0f} "
            f"p90={np.percentile(arr, 90):.0f} "
            f"p99={np.percentile(arr, 99):.0f} max={arr.max()} -> "
            f"limit {limits[-1]}")
    return limits


def run_find_neighbour_dist(dataset, model_option, n_samples: int = 32,
                            percentile: float = 90.0) -> List[int]:
    """Trainer hook for debugging.find_neighbour_dist."""
    cfg = model_option.get("config") if hasattr(model_option, "get") else None
    if not cfg:
        log.warning("find_neighbour_dist: model has no KPConv-style config")
        return []
    get = cfg.get if hasattr(cfg, "get") else cfg.__getitem__
    arch = list(get("architecture", []))
    num_layers = sum(1 for b in arch if "strided" in b or "pool" in b) + 1
    rng = np.random.default_rng(0)
    ds = dataset.train_dataset or dataset.test_dataset
    transform = dataset.transform_for("train")
    idxs = rng.choice(len(ds), size=min(n_samples, len(ds)), replace=False)
    samples = [transform(rng, ds.get(int(i))) for i in idxs]
    return calibrate_neighborhood_limits(
        samples, float(get("first_subsampling_dl", 0.0125)),
        float(get("conv_radius", 2.5)), num_layers, percentile)
