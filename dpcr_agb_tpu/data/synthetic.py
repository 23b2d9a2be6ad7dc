"""Synthetic airborne-LiDAR forest generator.

Replaces the reference's MockDataset fixtures (utils/mock.py:9-74) with a
physically-plausible NFI-style dataset: cylindrical plots (xy_radius 15 m) of
ground + tree-crown points, with plot-level biomass/volume targets computed
from an allometric model of the simulated trees — so models can genuinely
learn (target R² > 0 is achievable) and the full pipeline (LAS IO, plot
extraction, transforms, training, eval export) can run end-to-end without the
real NFI download.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np
import pandas as pd

from .las_io import write_las


def generate_plot(rng: np.random.Generator, radius: float = 15.0,
                  density: float = 12.0, spatial_signal: bool = False):
    """One plot: returns (points [N,3] float32 local coords, biomass_Mg_ha,
    volume_m3_ha).

    spatial_signal=True mixes two species per plot whose allometric
    coefficients differ ~2x at EQUAL height — conifers (narrow conical
    crowns, dense wood) vs broadleaves (wide ellipsoidal crowns, lighter
    wood). The species is only readable from local 3D crown geometry, so
    plot-level height statistics underdetermine the targets: a
    global-stat model hits a ceiling that spatial architectures (voxel
    CNNs, KPConv) can exceed. The default generator's targets are
    stat-saturated (linear-on-stats R^2 ~0.94, RESULTS.md) — use this
    flag (data.synthetic_spatial=True) when benchmarking model ORDERING
    rather than pipeline mechanics."""
    area = np.pi * radius ** 2
    n_ground = max(50, int(area * density * rng.uniform(0.2, 0.5)))
    # ground: uniform disk with gentle slope + noise
    r = radius * np.sqrt(rng.random(n_ground))
    th = rng.random(n_ground) * 2 * np.pi
    gx, gy = r * np.cos(th), r * np.sin(th)
    slope = rng.uniform(-0.02, 0.02, size=2)
    gz = gx * slope[0] + gy * slope[1] + rng.normal(0, 0.05, n_ground)
    ground = np.stack([gx, gy, gz], axis=1)

    n_trees = rng.poisson(rng.uniform(2, 40))
    parts = [ground]
    biomass_kg = 0.0
    volume_m3 = 0.0
    for _ in range(n_trees):
        h = rng.gamma(4.0, 4.0)  # tree height, mean ~16 m
        h = float(np.clip(h, 2.0, 38.0))
        conifer = spatial_signal and rng.random() < 0.5
        dbh = 0.012 * h ** 1.3 * rng.uniform(0.8, 1.25)  # diameter (m)
        if spatial_signal:
            # conifer: narrow crown, dense wood; broadleaf: wide, light.
            # Crown geometry is the only observable carrying the species.
            crown_r = (np.clip(0.09 * h, 0.4, 2.2) if conifer
                       else np.clip(0.22 * h, 0.8, 6.0))
        else:
            crown_r = np.clip(0.16 * h, 0.6, 4.5)
        tr = (radius - 0.5) * np.sqrt(rng.random())
        tth = rng.random() * 2 * np.pi
        tx, ty = tr * np.cos(tth), tr * np.sin(tth)
        tz = tx * slope[0] + ty * slope[1]
        # airborne lidar sees mostly the upper crown
        n_pts = max(5, int(crown_r ** 2 * np.pi * density * rng.uniform(0.5, 1.5)))
        u = rng.random(n_pts) ** 0.4  # bias toward crown top
        cz = tz + h * (0.35 + 0.65 * (1 - u))
        if spatial_signal and conifer:
            # conical crown: radius shrinks linearly toward the top
            rel_h = (cz - tz) / max(h, 1e-6)
            cone = np.clip(1.2 * (1.0 - rel_h), 0.05, 1.0)
            cr = crown_r * np.sqrt(rng.random(n_pts)) * cone
        else:
            cr = crown_r * np.sqrt(rng.random(n_pts)) * (0.3 + 0.7 * u)
        cth = rng.random(n_pts) * 2 * np.pi
        cx = tx + cr * np.cos(cth)
        cy = ty + cr * np.sin(cth)
        parts.append(np.stack([cx, cy, cz + rng.normal(0, 0.1, n_pts)], axis=1))
        # allometry: stem volume ~ form factor * basal area * height
        v = 0.45 * np.pi * (dbh / 2) ** 2 * h
        if spatial_signal:
            v *= 1.35 if conifer else 0.75       # form factor by species
            wood_density = (rng.uniform(560, 640) if conifer
                            else rng.uniform(300, 380))
        else:
            wood_density = rng.uniform(420, 520)
        volume_m3 += v
        biomass_kg += v * wood_density

    pts = np.concatenate(parts, axis=0)
    keep = (pts[:, 0] ** 2 + pts[:, 1] ** 2) <= radius ** 2
    pts = pts[keep]
    area_ha = area / 1e4
    bmag_ha = biomass_kg / 1000.0 / area_ha
    v_ha = volume_m3 / area_ha
    return pts.astype(np.float32), bmag_ha, v_ha


def generate_nfi_like_dataset(root: str, n_plots: int = 60, seed: int = 0,
                              radius: float = 15.0,
                              label_format: str = "gpkg",
                              spatial_signal: bool = False) -> str:
    """Create `<root>/raw/` with per-plot .las files + a label table
    (nfi.gpkg or labels.csv) shaped like the reference's NFI layout:
    object-type area, pt_identifier column 'las_file', targets
    BMag_ha / V_ha, split column filled by the dataset's seed-42 splitter.
    """
    rng = np.random.default_rng(seed)
    raw = os.path.join(root, "raw")
    os.makedirs(os.path.join(raw, "plots"), exist_ok=True)
    rows = []
    for i in range(n_plots):
        pts, bmag, v = generate_plot(rng, radius=radius,
                                     spatial_signal=spatial_signal)
        # place the plot somewhere in a fake projected CRS
        cx, cy = rng.uniform(5e5, 6e5), rng.uniform(6e6, 6.1e6)
        world = pts + np.array([cx, cy, rng.uniform(0, 200)], dtype=np.float32)
        las_name = f"plots/plot_{i:04d}.las"
        cls = np.where(np.abs(pts[:, 2]
                              - np.median(pts[pts[:, 2] < 0.5, 2] if
                                          (pts[:, 2] < 0.5).any() else 0.0))
                       < 0.3, 2, 5)
        write_las(os.path.join(raw, las_name), world, classification=cls)
        rows.append({"las_file": f"plot_{i:04d}", "x": cx, "y": cy,
                     "BMag_ha": bmag, "V_ha": v})
    df = pd.DataFrame(rows)
    if label_format == "gpkg":
        from ..visualization.gpkg import write_gpkg
        label_file = os.path.join(raw, "nfi.gpkg")
        write_gpkg(label_file, df, layer="nfi")
    else:
        label_file = os.path.join(raw, "labels.csv")
        df.to_csv(label_file, index=False)
    return label_file


def generate_tree(rng: np.random.Generator):
    """One single tree (treeDB-style): crown + stem points, local coords."""
    h = float(np.clip(rng.gamma(4.0, 4.0), 3.0, 35.0))
    crown_r = np.clip(0.16 * h, 0.6, 4.5)
    n_pts = max(30, int(crown_r ** 2 * np.pi * rng.uniform(8, 25)))
    u = rng.random(n_pts) ** 0.4
    z = h * (0.3 + 0.7 * (1 - u))
    r = crown_r * np.sqrt(rng.random(n_pts)) * (0.3 + 0.7 * u)
    th = rng.random(n_pts) * 2 * np.pi
    pts = np.stack([r * np.cos(th), r * np.sin(th),
                    z + rng.normal(0, 0.1, n_pts)], axis=1)
    return pts.astype(np.float32), h


def generate_tree_db(root: str, n_trees: int = 40, seed: int = 1) -> str:
    """Create a synthetic treeDB dataset (reference conf/data/instance/treeDB):
    one .las per tree under raw/ALS/, labels with height_m + file_path."""
    rng = np.random.default_rng(seed)
    raw = os.path.join(root, "raw")
    os.makedirs(os.path.join(raw, "ALS"), exist_ok=True)
    rows = []
    for i in range(n_trees):
        pts, h = generate_tree(rng)
        cx, cy = rng.uniform(5e5, 6e5), rng.uniform(6e6, 6.1e6)
        world = pts + np.array([cx, cy, rng.uniform(0, 100)], np.float32)
        name = f"ALS/tree_{i:04d}.las"
        write_las(os.path.join(raw, name), world,
                  classification=np.full(len(pts), 5, np.int32))
        rows.append({"file_path": f"tree_{i:04d}", "x": cx, "y": cy,
                     "height_m": h})
    df = pd.DataFrame(rows)
    from ..visualization.gpkg import write_gpkg
    label_file = os.path.join(raw, "treeDB_epsg_25832.gpkg")
    write_gpkg(label_file, df, layer="treeDB")
    return label_file
