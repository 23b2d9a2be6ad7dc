"""Label-table loading and split handling (reference
datasets/instance/las_dataset.py:762-843 process_label_files_ and the
auto-split logic at :712-758), built on pandas.

Label files may be .csv (needs x/y columns for plot centers) or .gpkg
(GeoPackage point layers read via the stdlib-sqlite reader in
dpcr_agb_tpu.visualization.gpkg — no geopandas in this image).
"""
from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

log = logging.getLogger(__name__)


def read_label_file(path: str) -> pd.DataFrame:
    ext = os.path.splitext(path)[1].lower()
    if ext in (".csv", ".txt"):
        df = pd.read_csv(path)
        if "x" not in df.columns or "y" not in df.columns:
            df["x"] = 0.0
            df["y"] = 0.0
        return df
    if ext == ".gpkg":
        from ..visualization.gpkg import read_gpkg
        return read_gpkg(path)
    raise ValueError(f"Unsupported label file type: {path}")


def process_label_files(area: dict, area_name: str, targets: Dict[str, dict],
                        data_path: str) -> pd.DataFrame:
    """Load+merge an area's label files with target aliasing, unit factors, and
    classification mapping (las_dataset.py:762-843)."""
    label_files = area["label_files"]
    if isinstance(label_files, str):
        label_files = [label_files]
    assert len(label_files) > 0, f"no labels given, check area {area_name}"

    frames = []
    for lf in label_files:
        lb = read_label_file(os.path.join(data_path, "raw", lf))
        alias_targets = area.get("alias_targets", list(targets.keys()))
        assert len(alias_targets) == len(targets)
        target_metric_factor = area.get("target_metric_factor") or {}
        for ori_target, alias_target in zip(targets, alias_targets):
            task = targets[ori_target]["task"]
            if alias_target in lb.columns:
                lb[ori_target] = lb[alias_target]
                if task in ("regression", "mol"):
                    lb[ori_target] = pd.to_numeric(lb[ori_target], errors="coerce")
                    lb[ori_target] = lb[ori_target] * target_metric_factor.get(
                        ori_target, 1.0)
            else:
                lb[ori_target] = np.nan
            if task == "classification":
                lb[f"{ori_target}_"] = lb[ori_target].map(
                    targets[ori_target]["class_mapping"]).astype(float)
        frames.append(lb)
    labels = pd.concat(frames) if len(frames) > 1 else frames[0]

    target_keys = list(targets.keys())
    n_labels = len(labels)
    nans_allowed = area.get("nans_allowed", True)
    fully_missing = labels[target_keys].isna().all(axis=1).sum()
    if fully_missing > 0:
        log.info(f"{fully_missing} of {n_labels} labels fully missing in {area_name}")
        if fully_missing == n_labels:
            area["has_labels"] = False
    if not nans_allowed:
        labels = labels.dropna(axis=0, how="any", subset=target_keys)

    query = area.get("label_query")
    if query is not None:
        labels = labels.query(query)
        if n_labels > len(labels):
            log.warning(f"{n_labels - len(labels)} samples filtered by: {query}")

    labels = labels.set_index(np.arange(len(labels)))
    return labels


def ensure_split(labels: pd.DataFrame, area: dict, targets: Dict[str, dict],
                 split_col: str) -> pd.DataFrame:
    """Create a train/val/test split column when absent, with the reference's
    seed-42 shuffle semantics (las_dataset.py:712-758)."""
    if split_col in labels.columns:
        return labels
    target_keys = list(targets.keys())
    must = np.array(area.get("targets_must_be_present", [True] * len(target_keys)))
    lb = labels[list(np.array(target_keys)[must])]
    val_ratio = area.get("val_ratio", 0.1)
    test_ratio = area.get("test_ratio", 0.1)

    labels = labels.copy()
    if (lb.shape[1] > 0 and lb.isna().all().all()) or val_ratio == test_ratio == 0.0:
        labels[split_col] = "train"
        return labels

    if must.any():
        partly_missing = lb.isna().all(axis=1)
        missing_part = labels[partly_missing].copy()
        missing_part[split_col] = "train"
        full_part = labels[~partly_missing].copy()
    else:
        missing_part = pd.DataFrame()
        full_part = labels.copy()

    index = full_part.index.values.copy()
    rs = np.random.RandomState(42)
    rs.shuffle(index)
    train_end = int(len(index) * (1 - (val_ratio + test_ratio)))
    val_end = int(len(index) * (1 - test_ratio))
    full_part.loc[index[:train_end], split_col] = "train"
    if val_ratio != 0 and val_end > train_end:
        full_part.loc[index[train_end:val_end], split_col] = "val"
    if test_ratio != 0 and len(index) > val_end:
        full_part.loc[index[val_end:], split_col] = "test"
    out = pd.concat([missing_part, full_part]) if len(missing_part) else full_part
    return out
