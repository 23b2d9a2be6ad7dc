#!/usr/bin/env python
"""Dataset-size experiment driver — the reference's
`eval_scripts/eval_deep_learning_v2_size.ipynb` protocol (MSENet14/50 trained
on 100/75/50/25/12.5% of the training split, scored per fraction), VERDICT r3
missing item 3.

Thin orchestration over scripts/run_trials.py (which already handles
train -> calibrate_bn -> eval-with-export -> eval_scores aggregation per
fraction) + the data layer's `train_subset` (data/dataset.py:291-302, the
port of the reference's las_dataset.py train_subset). The reference ran this
on the <1y NFI subset with treeadd eval; here the dataset comes from the
caller's overrides so the same driver serves synthetic rehearsals and the
real NFI data (scripts/reproduce_nfi.md).

Example (synthetic smoke, 1 trial, 2 fractions):
  python scripts/run_size_experiment.py --trials 1 --fractions 1.0,0.5 \
    --out outputs/size_exp -- \
    task=instance models=instance/minkowski_baseline model_name=SENet14 \
    data=instance/synthetic/reg data.transform_type=sparse_xy \
    training=nfi/minkowski training.epochs=3 lr_scheduler=cosineawr \
    update_lr_scheduler_on=on_num_batch

Writes <out>/size_summary.json: {fraction: {n_train, scores}} plus a
README-style markdown table at <out>/size_table.md (median/max R², RMSE over
trials per fraction — the notebook's aggregation, via eval_scores.py).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--fractions", default="1.0,0.75,0.5,0.25,0.125",
                    help="comma list of train_subset fractions")
    ap.add_argument("--out", required=True)
    ap.add_argument("--calibrate-bn", type=int, default=0)
    ap.add_argument("--weight-name", default="total_BMag_ha_rmse")
    ap.add_argument("--stage", default="test")
    ap.add_argument("overrides", nargs="*",
                    help="train.py overrides (after `--`)")
    args = ap.parse_args(argv)
    if not args.overrides:
        ap.error("no train.py overrides given (pass them after `--`)")

    import run_trials  # scripts/ sibling
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    fractions = [float(f) for f in args.fractions.split(",")]
    summary = {}
    for frac in fractions:
        tag = f"{frac * 100:g}pct"
        out = os.path.join(args.out, tag)
        ov = list(args.overrides)
        if frac < 1.0:
            ov.append(f"data.train_subset={frac}")
        print(f"[size_exp] fraction {tag} -> {out}", flush=True)
        rc = run_trials.main(
            ["--trials", str(args.trials), "--out", out,
             "--calibrate-bn", str(args.calibrate_bn),
             "--weight-name", args.weight_name, "--stage", args.stage,
             "--"] + ov)
        if rc:
            summary[tag] = {"error": f"run_trials rc={rc}"}
            continue
        try:
            with open(os.path.join(out, "trials_summary.json")) as f:
                summary[tag] = json.load(f)
        except OSError as e:
            summary[tag] = {"error": str(e)}

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "size_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)

    # README-style table: rows = fraction, cols = per-target median/max R2,
    # median RMSE (the notebook's aggregation over trials)
    lines = ["| fraction | target | R2 med | R2 max | RMSE med | MAPE med |",
             "|---|---|---|---|---|---|"]
    for tag, s in summary.items():
        scores = (s or {}).get("scores") or {}
        for target, agg in scores.items():
            if not isinstance(agg, dict):
                continue
            lines.append(
                f"| {tag} | {target} "
                f"| {agg.get('r2_median', float('nan')):.3f} "
                f"| {agg.get('r2_max', float('nan')):.3f} "
                f"| {agg.get('rmse_median', float('nan')):.3f} "
                f"| {agg.get('mape_median', float('nan')):.3f} |")
    table = "\n".join(lines) + "\n"
    with open(os.path.join(args.out, "size_table.md"), "w") as f:
        f.write(table)
    print(table)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
