#!/usr/bin/env python
"""Score-table generation from exported predictions — the script replacement
for eval_scripts/eval_deep_learning_v2.ipynb (cells 4, 7, 9, 10):

  * loads one or more *trials* of prediction exports (the
    `<area>_<stage>_preds.csv` / `<area>_preds.gpkg` files written by the
    Visualizer at eval time)
  * applies the notebook's additive bias correction: per-target delta =
    mean(y - pred) computed on the train+val rows, added everywhere,
    predictions clipped at 0 (cell 7)
  * per-trial metrics on each stage: R2, MSE, RMSE, nRMSE (RMSE / mean y),
    MAPE (% over y != 0), mean error, mean bias (cell 9)
  * aggregates over trials: median + max for R2, median + min for
    RMSE/MAPE/|bias| — the README table convention

Usage:
    python eval_scores.py --trials run1/eval run2/eval ... [--stage test]
    python eval_scores.py --glob 'outputs/*/eval'
"""
from __future__ import annotations

import argparse
import glob as globmod
import json
import os
from collections import defaultdict

import numpy as np
import pandas as pd


def load_trial(trial_dir: str) -> pd.DataFrame:
    """All prediction csv files of one trial -> long DataFrame."""
    frames = []
    for path in sorted(globmod.glob(os.path.join(trial_dir, "*_preds.csv"))):
        base = os.path.basename(path)[: -len("_preds.csv")]
        area, _, stage = base.rpartition("_")
        df = pd.read_csv(path)
        if "stage" not in df.columns:
            df["stage"] = stage
        df["area"] = area or base
        frames.append(df)
    if not frames:
        raise FileNotFoundError(f"no *_preds.csv under {trial_dir}")
    return pd.concat(frames, ignore_index=True)


def target_names(df: pd.DataFrame):
    return [c[len("pred_"):] for c in df.columns if c.startswith("pred_")]


def bias_correct(df: pd.DataFrame, targets) -> pd.DataFrame:
    """Additive delta fitted on train+val, clip at 0 (notebook cell 7)."""
    fit = df[df["stage"].isin(["train", "val"])]
    if len(fit) == 0:
        fit = df
    out = df.copy()
    for t in targets:
        delta = np.nanmean(fit[f"y_{t}"] - fit[f"pred_{t}"])
        out[f"pred_{t}"] = np.clip(out[f"pred_{t}"] + delta, 0, None)
    return out


def trial_metrics(df: pd.DataFrame, stage: str, targets) -> dict:
    rows = df[df["stage"] == stage]
    out = {}
    for t in targets:
        y = rows[f"y_{t}"].values.astype(np.float64)
        p = rows[f"pred_{t}"].values.astype(np.float64)
        ok = ~np.isnan(y)
        y, p = y[ok], p[ok]
        err = y - p
        nz = y != 0
        out[t] = {
            "r2": float(1 - np.sum(err ** 2)
                        / np.sum((y - y.mean()) ** 2)),
            "mse": float(np.mean(err ** 2)),
            "rmse": float(np.sqrt(np.mean(err ** 2))),
            "nrmse": float(np.sqrt(np.mean(err ** 2)) / max(y.mean(), 1e-9)),
            "mape": float(np.mean(np.abs(err[nz] / y[nz])) * 100),
            "mean_error": float(np.mean(np.abs(err))),
            "mean_bias": float(np.mean(err)),
            "n": int(len(y)),
        }
    return out


def aggregate(per_trial: list, targets) -> dict:
    agg = {}
    for t in targets:
        vals = defaultdict(list)
        for m in per_trial:
            for k, v in m[t].items():
                vals[k].append(v)
        agg[t] = {
            "r2_median": float(np.median(vals["r2"])),
            "r2_max": float(np.max(vals["r2"])),
            "rmse_median": float(np.median(vals["rmse"])),
            "rmse_min": float(np.min(vals["rmse"])),
            "mape_median": float(np.median(vals["mape"])),
            "mape_min": float(np.min(vals["mape"])),
            "bias_median": float(np.median(vals["mean_bias"])),
            "bias_min_abs": float(min(vals["mean_bias"], key=abs)),
            "n_trials": len(per_trial),
        }
    return agg


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", nargs="*", default=None,
                    help="directories each holding one trial's *_preds.csv")
    ap.add_argument("--glob", default=None,
                    help="glob expanding to trial directories")
    ap.add_argument("--stage", default="test")
    ap.add_argument("--no-bias-correction", action="store_true")
    args = ap.parse_args(argv)

    trial_dirs = list(args.trials or [])
    if args.glob:
        trial_dirs += sorted(globmod.glob(args.glob))
    if not trial_dirs:
        ap.error("give --trials or --glob")

    per_trial = []
    targets = None
    for d in trial_dirs:
        df = load_trial(d)
        targets = targets or target_names(df)
        if not args.no_bias_correction:
            df = bias_correct(df, targets)
        per_trial.append(trial_metrics(df, args.stage, targets))

    result = aggregate(per_trial, targets)
    for t in targets:
        print(json.dumps({"target": t, "stage": args.stage,
                          **{k: round(v, 4) if isinstance(v, float) else v
                             for k, v in result[t].items()}}))
    return result


if __name__ == "__main__":
    main()
