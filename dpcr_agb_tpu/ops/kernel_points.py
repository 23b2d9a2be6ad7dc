"""Kernel-point disposition generation (reference
modules/KPConv/kernel_points.py:38-413).

We implement the spherical Monte-Carlo Lloyd variant (kernel_points.py:72-203)
for every K and cache dispositions under this package. Divergence from the
reference (documented): for K<=30 the reference uses a gradient-descent
optimizer over 100 candidates; Lloyd produces equivalent quasi-uniform
dispositions (the KPConv paper reports the two as interchangeable).
Load-time behavior matches: optional fixed center/vertical points, random
rotation + N(0, 0.01) jitter, scale by the block radius
(kernel_points.py:376-411).
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

_CACHE_DIR = os.path.join(os.path.dirname(__file__), "kernel_dispositions")


def spherical_lloyd(radius: float, num_points: int, fixed: str = "center",
                    n_iter: int = 60, n_samples: int = 40000,
                    seed: int = 42) -> np.ndarray:
    """Quasi-uniform points in a ball via Lloyd relaxation on Monte-Carlo
    samples. `fixed`: 'none' | 'center' | 'verticals' pins points like the
    reference (kernel_points.py:89-117)."""
    rng = np.random.RandomState(seed)
    dim = 3

    # initial points: random in ball
    pts = np.zeros((0, dim))
    while pts.shape[0] < num_points:
        cand = rng.uniform(-radius, radius, size=(2 * num_points, dim))
        cand = cand[np.linalg.norm(cand, axis=1) < radius]
        pts = np.concatenate([pts, cand])[:num_points]

    n_fixed = 0
    if fixed in ("center", "verticals"):
        pts[0] = 0.0
        n_fixed = 1
    if fixed == "verticals":
        pts[1] = [0, 0, radius / 2]
        pts[2] = [0, 0, -radius / 2]
        n_fixed = 3

    for _ in range(n_iter):
        samples = rng.uniform(-radius, radius, size=(n_samples, dim))
        samples = samples[np.linalg.norm(samples, axis=1) < radius]
        d2 = ((samples[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        owner = d2.argmin(axis=1)
        for i in range(n_fixed, num_points):
            members = samples[owner == i]
            if len(members):
                pts[i] = members.mean(axis=0)
        if fixed == "verticals":  # keep the vertical pair on the z axis
            pts[1, :2] = 0.0
            pts[2, :2] = 0.0
    return pts.astype(np.float32)


def load_kernel_points(radius: float, num_points: int, fixed: str = "center",
                       seed: Optional[int] = None,
                       jitter: float = 0.01) -> np.ndarray:
    """[K,3] disposition scaled to `radius`, with the reference's load-time
    random z-rotation + jitter (deterministic here via `seed`)."""
    os.makedirs(_CACHE_DIR, exist_ok=True)
    cache = os.path.join(_CACHE_DIR, f"k_{num_points:03d}_{fixed}_3D.npy")
    if os.path.exists(cache):
        pts = np.load(cache)
    else:
        pts = spherical_lloyd(1.0, num_points, fixed=fixed)
        np.save(cache, pts)

    rng = np.random.RandomState(0 if seed is None else seed)
    theta = rng.rand() * 2 * np.pi
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float32)
    pts = pts + rng.normal(scale=jitter, size=pts.shape)
    pts = radius * pts
    return (pts @ rot).astype(np.float32)
