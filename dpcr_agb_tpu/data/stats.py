"""Per-plot point statistics (reference get_local_stats,
datasets/instance/las_dataset.py:375-419): height moments, height/density
quantiles, and max KDE density on a 1 m grid. These drive the classical
baselines (pointcloud_stats_method) and the optional local_stats channel."""
from __future__ import annotations

from typing import Dict

import numpy as np
from scipy import stats as sps

QUANTILES = [0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99]


def compute_local_stats(pos: np.ndarray, suffix: str = "") -> Dict[str, float]:
    z = pos[:, 2].astype(np.float64)
    out: Dict[str, float] = {}
    out[f"h_mean{suffix}"] = float(z.mean())
    out[f"h_std{suffix}"] = float(z.std())
    mean = z.mean()
    out[f"h_coov{suffix}"] = float(z.std() / mean) if mean != 0 else 0.0
    out[f"h_kur{suffix}"] = float(sps.kurtosis(z))
    out[f"h_skew{suffix}"] = float(sps.skew(z))
    for q in QUANTILES:
        out[f"h_q{int(q * 100)}{suffix}"] = float(np.quantile(z, q))
    # density quantiles: points per xy cell on a 1 m grid
    xy = pos[:, :2]
    cells = np.floor(xy).astype(np.int64)
    _, counts = np.unique(cells, axis=0, return_counts=True)
    for q in QUANTILES:
        out[f"d_q{int(q * 100)}{suffix}"] = float(np.quantile(counts, q))
    out[f"d_max{suffix}"] = float(counts.max())
    return out
