#!/usr/bin/env python
"""Evaluation entry point (reference torch-points3d/eval.py:10-34): loads a
checkpoint, disables shuffling, runs deterministic eval over `eval_stages`
with optional voting_runs / enable_dropout, exports predictions.

    python eval.py task=instance models=instance/minkowski_baseline \
        model_name=SENet14 data=instance/NFI/reg data.transform_type=sparse_xy_eval \
        checkpoint_dir=outputs/... weight_name=total_BMag_ha_rmse
"""
import logging
import os
import sys

from dpcr_agb_tpu.config import compose_from_checkpoint, load_config
from dpcr_agb_tpu.training.trainer import Trainer

CONF_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "conf")


def main(overrides=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s")
    overrides = list(overrides if overrides is not None else sys.argv[1:])
    # checkpoint-only evaluation: rebuild the run configuration stored in
    # the checkpoint when no data=/task= selections are given.
    cfg = compose_from_checkpoint(overrides)
    if cfg is None:
        cfg = load_config(CONF_DIR, "eval", overrides)
    else:
        # the restored run_config carries the TRAIN-time visualization;
        # the eval surface defaults to prediction export (conf/eval.yaml ->
        # visualization: eval — the reference's eval writes gpkg/csv, the
        # bridge to the eval notebooks). `visualization=<group>` overrides.
        viz = next((o.split("=", 1)[1] for o in overrides
                    if o.startswith("visualization=")), "eval")
        cfg["visualization"] = _viz_group(viz)
    return _run_eval(cfg)


def _viz_group(name: str) -> dict:
    import yaml
    with open(os.path.join(CONF_DIR, "visualization", f"{name}.yaml")) as f:
        return yaml.safe_load(f)


def _run_eval(cfg):
    if cfg.get("pretty_print"):
        print(cfg.pretty())
    # the trainer reads training.* keys; eval roots keep them at top level
    cfg["training"] = {
        "epochs": 0, "batch_size": cfg.get("batch_size", 2),
        "num_workers": cfg.get("num_workers", 0), "shuffle": False,
        "checkpoint_dir": cfg["checkpoint_dir"],
        "weight_name": cfg.get("weight_name", "latest"),
        "optim": {"base_lr": 1e-3,
                  "optimizer": {"class": "AdaBelief", "params": {}}},
    }
    trainer = Trainer(cfg, eval_mode=True)
    results = {}
    for stage in cfg.get("eval_stages", ["val", "test"]):
        results[stage] = trainer.eval(stage)
    return results


if __name__ == "__main__":
    main()
