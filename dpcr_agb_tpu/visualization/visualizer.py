"""Prediction export for the instance task (reference
visualization/visualizer.py:19-405, instance branch :220-247 + :120-145):
collects per-sample de-standardized predictions with area/label ids, then at
epoch end joins them onto the area label tables and appends
`<area>_preds.gpkg` / `<area>_<stage>_preds.csv` — the bridge the offline
eval notebooks consume.
"""
from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from .gpkg import write_gpkg

log = logging.getLogger(__name__)


class Visualizer:
    def __init__(self, viz_cfg, num_batches: Dict[str, int], batch_size: int,
                 save_dir: str, tracker_stage_names=None):
        get = viz_cfg.get if hasattr(viz_cfg, "get") else (viz_cfg or {}).get
        self._format = get("format", ["csv"])
        if isinstance(self._format, str):
            self._format = [self._format]
        self._save_csv = "csv" in self._format
        self._save_gpkg = "gpkg" in self._format
        self._save_ply = "ply" in self._format
        # 3D point-cloud panels (reference visualizer.py:300-369):
        # tensorboard add_mesh / wandb Object3D, z-colored for regression
        self._save_tb = "tensorboard" in self._format
        self._save_wandb = "wandb" in self._format
        # reference convention: num_samples_per_epoch -1 = every sample
        n3d = int(get("num_samples_per_epoch", 4) or 4)
        self._num_samples_3d = float("inf") if n3d < 0 else n3d
        self._wandb_max_points = int(get("wandb_max_points", 10000) or 10000)
        self._save_dir = save_dir
        self._deactivated = not (self._save_csv or self._save_gpkg
                                 or self._save_ply or self._save_tb
                                 or self._save_wandb)
        self._rows: List[dict] = []
        self._stage = "test"
        self._epoch = 0
        self._seen_3d = 0
        self._tb_writer = None

    @property
    def is_active(self) -> bool:
        return not self._deactivated

    @property
    def wants_pos(self) -> bool:
        """Only the point-cloud exporters consume positions; callers gate
        the device->host transfer of batch.pos on this."""
        return self._save_ply or self._save_tb or self._save_wandb

    def reset(self, epoch: int, stage: str):
        self._epoch = epoch
        self._stage = stage
        self._rows = []
        self._seen_3d = 0

    def save_visuals(self, reg_out: np.ndarray, y_reg: np.ndarray,
                     area_idx: np.ndarray, label_idx: np.ndarray,
                     area_names: List[str], reg_targets: List[str],
                     sample_mask: Optional[np.ndarray] = None,
                     pos: Optional[np.ndarray] = None,
                     pos_mask: Optional[np.ndarray] = None):
        """Collect one batch of de-standardized predictions (visualizer.py:220-247).
        With format "ply" and pos/pos_mask given, also writes each sample's
        point cloud to <save_dir>/viz/<area>/<label_idx>.ply with the
        predicted and true targets as per-point columns (the reference's
        per-sample ply export, visualizer.py:249-261)."""
        if self._deactivated:
            return
        reg_out = np.asarray(reg_out)
        y_reg = np.asarray(y_reg)
        area_idx = np.asarray(area_idx)
        label_idx = np.asarray(label_idx)
        for i in range(len(reg_out)):
            if sample_mask is not None and not sample_mask[i]:
                continue
            ai = int(area_idx[i])
            area = area_names[ai] if 0 <= ai < len(area_names) \
                else f"area{ai}"
            row = {"area": area, "label_idx": int(label_idx[i])}
            for t, name in enumerate(reg_targets):
                row[f"pred_{name}"] = float(reg_out[i, t])
                row[f"y_{name}"] = float(y_reg[i, t])
            self._rows.append(row)
            if self._save_ply and pos is not None:
                self._write_sample_ply(row, area, pos[i], None if
                                       pos_mask is None else pos_mask[i],
                                       reg_targets)
            if (self._save_tb or self._save_wandb) and pos is not None \
                    and self._seen_3d < self._num_samples_3d:
                self._seen_3d += 1
                p = np.asarray(pos[i], np.float32)
                if pos_mask is not None:
                    p = p[np.asarray(pos_mask[i], bool)]
                name = f"{area}_{row['label_idx']}"
                if self._save_tb:
                    self._write_tensorboard_mesh(name, p)
                if self._save_wandb:
                    self._write_wandb_cloud(name, p)

    def _write_sample_ply(self, row, area, pos_i, mask_i, reg_targets):
        from ..data.las_io import write_ply
        p = np.asarray(pos_i, np.float32)
        if mask_i is not None:
            p = p[np.asarray(mask_i, bool)]
        area_dir = os.path.join(self._save_dir, "viz",
                                f"{self._stage}_{self._epoch}", str(area))
        os.makedirs(area_dir, exist_ok=True)
        cols = {}
        for name in reg_targets:
            cols[f"pred_{name}"] = np.full(len(p), row[f"pred_{name}"],
                                           np.float32)
            cols[f"y_{name}"] = np.full(len(p), row[f"y_{name}"], np.float32)
        write_ply(os.path.join(area_dir, f"{row['label_idx']}.ply"), p,
                  **cols)

    @staticmethod
    def _z_colors(p: np.ndarray) -> np.ndarray:
        """uint8 [N,3] viridis-like z colormap without matplotlib on the
        hot path: simple 3-stop gradient (low=blue, mid=green, high=yellow)."""
        z = p[:, 2].astype(np.float64)
        span = max(z.max() - z.min(), 1e-9) if len(z) else 1.0
        t = (z - (z.min() if len(z) else 0.0)) / span
        r = np.clip(2 * t - 0.5, 0, 1)
        g = np.clip(1.5 * t + 0.2, 0, 1)
        b = np.clip(1.0 - 1.8 * t, 0, 1)
        return (np.stack([r, g, b], 1) * 255).astype(np.uint8)

    def _write_tensorboard_mesh(self, name: str, p: np.ndarray) -> None:
        """Reference save_tensorboard (visualizer.py:300-328): add_mesh
        point panel, colored by height for the regression task."""
        try:
            import torch
            if self._tb_writer is None:
                from torch.utils.tensorboard import SummaryWriter
                d = os.path.join(self._save_dir, "tensorboard_viz")
                os.makedirs(d, exist_ok=True)
                self._tb_writer = SummaryWriter(d)
            self._tb_writer.add_mesh(
                f"{self._stage}/{name}",
                torch.from_numpy(p[None]),
                colors=torch.from_numpy(self._z_colors(p)[None]),
                config_dict={"material": {"size": 0.3}},
                global_step=self._epoch)
        except Exception as e:  # torch-tb optional; never break eval
            log.warning(f"tensorboard 3D export unavailable: {e}")
            self._save_tb = False

    def _write_wandb_cloud(self, name: str, p: np.ndarray) -> None:
        """Reference save_wandb (visualizer.py:345-369): Object3D upload,
        subsampled to wandb_max_points."""
        try:
            import wandb
            if wandb.run is None:
                return
            if len(p) > self._wandb_max_points:
                sel = np.random.default_rng(0).permutation(
                    len(p))[: self._wandb_max_points]
                p = p[sel]
            cloud = np.concatenate(
                [p, self._z_colors(p).astype(np.float32)], axis=1)
            wandb.log({f"{self._stage}/{name}": wandb.Object3D(cloud)},
                      commit=False)
        except Exception as e:
            log.warning(f"wandb 3D export unavailable: {e}")
            self._save_wandb = False

    def finalize_epoch(self, dataset=None):
        """Join predictions onto label tables; write gpkg/csv (visualizer.py:120-145)."""
        if not (self._save_csv or self._save_gpkg) or not self._rows:
            self._rows = []
            return
        df = pd.DataFrame(self._rows)
        os.makedirs(self._save_dir, exist_ok=True)
        for area_name, area_df in df.groupby("area"):
            out = area_df.drop(columns=["area"]).copy()
            out["epoch"] = self._epoch
            out["stage"] = self._stage
            if dataset is not None:
                try:
                    labels = dataset.get_labels(str(area_name))
                    joined = out.join(
                        labels.add_prefix("label_"), on="label_idx", how="left")
                except Exception as e:  # labels table optional for synth runs
                    log.debug(f"label join skipped for {area_name}: {e}")
                    joined = out
            else:
                joined = out
            if self._save_csv:
                path = os.path.join(self._save_dir,
                                    f"{area_name}_{self._stage}_preds.csv")
                joined.to_csv(path, mode="a", index=False,
                              header=not os.path.exists(path))
            if self._save_gpkg:
                path = os.path.join(self._save_dir, f"{area_name}_preds.gpkg")
                gdf = joined.copy()
                x_col = "label_x" if "label_x" in gdf else "x"
                y_col = "label_y" if "label_y" in gdf else "y"
                gdf["x"] = gdf.get(x_col, np.nan)
                gdf["y"] = gdf.get(y_col, np.nan)
                write_gpkg(path, gdf, layer=f"{area_name}_preds", append=True)
        self._rows = []
