#!/usr/bin/env python
"""Multi-trial orchestration: train -> (optional BN recalibration) ->
eval-with-export -> aggregate, N seeds per model.

Automates the manual loop in scripts/reproduce_nfi.md (the reference's
published numbers are medians/extremes over 5 trials per model —
BASELINE.md; reference protocol: README.md:150-180 + the eval notebooks).

Each protocol stage (train / calibrate_bn / eval) runs as its own
sequential subprocess — still ONE TPU client at a time, but each stage's
host memory is returned to the OS (the in-process loop leaked to ~130 GB
RSS by trial 2 of the NFI rehearsal and was OOM-killed). Trials that
already have a checkpoint in their run_dir are skipped, so the script is
resumable.

Example (synthetic smoke):
  python scripts/run_trials.py --trials 2 --out outputs/senet14 \
    -- task=instance models=instance/minkowski_baseline model_name=SENet14 \
       data=instance/synthetic/reg data.transform_type=sparse_xy \
       training=nfi/minkowski training.epochs=3 lr_scheduler=cosineawr \
       update_lr_scheduler_on=on_num_batch

Everything after `--` is passed to train.py verbatim; eval overrides are
derived (transform preset -> its *_eval variant unless --eval-transform is
given). Aggregation calls eval_scores.main on the produced exports.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _get_override(overrides, key, default=None):
    for o in overrides:
        if o.startswith(key + "="):
            return o.split("=", 1)[1]
    return default


def _without(overrides, *keys):
    return [o for o in overrides
            if not any(o.startswith(k + "=") for k in keys)]


def derive_eval_transform(train_transform: str) -> str:
    """sparse_xy -> sparse_xy_eval, xy -> xy_eval, fixed_xy -> fixed_xy_eval;
    already-eval presets pass through."""
    if train_transform is None:
        return None
    if train_transform.endswith("_eval"):
        return train_transform
    return train_transform + "_eval"


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--seed-base", type=int, default=0)
    ap.add_argument("--out", required=True,
                    help="parent dir; trials land in <out>/trial<i>")
    ap.add_argument("--calibrate-bn", type=int, default=0, metavar="EPOCHS",
                    help="run calibrate_bn for EPOCHS before eval (0 = off)")
    ap.add_argument("--weight-name", default="total_BMag_ha_rmse")
    ap.add_argument("--eval-transform", default=None,
                    help="override the derived *_eval transform preset")
    ap.add_argument("--stage", default="test",
                    help="aggregation stage for eval_scores")
    ap.add_argument("--skip-aggregate", action="store_true")
    ap.add_argument("overrides", nargs="*",
                    help="train.py overrides (put them after `--`)")
    args = ap.parse_args(argv)
    if not args.overrides:
        ap.error("no train.py overrides given (pass them after `--`)")

    import subprocess

    def run_cli(script, cli_overrides):
        """One protocol stage = one subprocess, like the reference's
        per-command recipe (README.md:132-216). Sequential, so still one
        TPU client at a time; isolates each stage's host memory — the
        in-process loop accumulated ~130 GB RSS by trial 2 of the NFI
        rehearsal and was OOM-killed by the kernel (round 4)."""
        r = subprocess.run([sys.executable, os.path.join(REPO, script)]
                           + cli_overrides)
        if r.returncode != 0:
            raise SystemExit(
                f"[run_trials] {script} failed (rc={r.returncode})")

    train_tf = _get_override(args.overrides, "data.transform_type")
    eval_tf = args.eval_transform or derive_eval_transform(train_tf)
    model_name = _get_override(args.overrides, "model_name", "model")

    eval_dirs = []
    for i in range(args.trials):
        seed = args.seed_base + i
        run_dir = os.path.join(args.out, f"trial{seed}")
        eval_dir = os.path.join(run_dir, "eval")
        eval_dirs.append(eval_dir)
        ckpt = os.path.join(run_dir, f"{model_name}.ckpt")
        if os.path.exists(ckpt):
            print(f"[run_trials] trial{seed}: checkpoint exists, skip train",
                  flush=True)
        else:
            print(f"[run_trials] trial{seed}: training (seed={seed})",
                  flush=True)
            run_cli("train.py", args.overrides +
                    [f"seed={seed}", f"run_dir={run_dir}"])
        done_marker = os.path.join(eval_dir, ".eval_done")
        cal_marker = os.path.join(run_dir, ".cal_done")
        if args.calibrate_bn and os.path.exists(cal_marker):
            print(f"[run_trials] trial{seed}: calibration exists, skip",
                  flush=True)
        elif args.calibrate_bn and not os.path.exists(done_marker):
            # eval done implies its preceding calibration ran; skipping on
            # resume keeps relaunches from recalibrating finished trials
            print(f"[run_trials] trial{seed}: BN recalibration "
                  f"({args.calibrate_bn} epochs)", flush=True)
            cal = args.overrides + [
                f"seed={seed}", f"checkpoint_dir={run_dir}",
                f"epochs={args.calibrate_bn}", f"run_dir={run_dir}"]
            # reference protocol recalibrates at batch 64 with workers
            # (README.md:164-170); conf/calibrate_bn.yaml's root defaults
            # (batch_size 2, num_workers 0) are the reference's file
            # surface, not its run recipe
            if _get_override(args.overrides, "batch_size") is None:
                cal.append("batch_size=64")
            if _get_override(args.overrides, "num_workers") is None:
                cal.append("num_workers=4")
            run_cli("calibrate_bn.py", cal)
            with open(cal_marker, "w") as f:
                f.write("ok\n")
        if os.path.exists(done_marker):
            print(f"[run_trials] trial{seed}: eval exists, skip", flush=True)
            continue
        if os.path.isdir(eval_dir):
            # a killed attempt leaves partial exports; the visualizer
            # APPENDS per stage (reference behavior), so stale files would
            # duplicate prediction rows in the aggregation
            import shutil
            print(f"[run_trials] trial{seed}: clearing partial eval dir",
                  flush=True)
            shutil.rmtree(eval_dir)
        print(f"[run_trials] trial{seed}: eval ({eval_tf})", flush=True)
        ev = _without(args.overrides, "data.transform_type", "training",
                      "lr_scheduler", "update_lr_scheduler_on") + [
            f"checkpoint_dir={run_dir}", f"run_dir={eval_dir}",
            f"weight_name={args.weight_name}",
            "eval_stages=[train,val,test]"]
        if eval_tf:
            ev.append(f"data.transform_type={eval_tf}")
        # reference protocol evals at batch 32 with workers
        # (README.md:179-216), not conf/eval.yaml's file defaults
        if _get_override(args.overrides, "batch_size") is None:
            ev.append("batch_size=32")
        if _get_override(args.overrides, "num_workers") is None:
            ev.append("num_workers=4")
        run_cli("eval.py", ev)
        with open(done_marker, "w") as f:
            f.write("ok\n")

    if args.skip_aggregate:
        return 0
    import eval_scores
    print(f"[run_trials] aggregating {len(eval_dirs)} trials "
          f"(stage={args.stage})", flush=True)
    result = eval_scores.main(
        ["--glob", os.path.join(args.out, "trial*", "eval"),
         "--stage", args.stage])
    summary = {"trials": args.trials, "out": args.out,
               "eval_transform": eval_tf, "weight_name": args.weight_name,
               "scores": result}
    with open(os.path.join(args.out, "trials_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
