#!/usr/bin/env python
"""BN-recalibration entry point (reference torch-points3d/calibrate_bn.py:8-21):
forward-only train-mode epochs so only BatchNorm running statistics update,
then the checkpoint is re-saved.

    python calibrate_bn.py task=instance models=... model_name=SENet14 \
        data=instance/NFI/reg data.transform_type=sparse_xy \
        checkpoint_dir=outputs/... epochs=20 batch_size=64
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
    # checkpoint-only calibration: rebuild the stored run config (same
    # surface as eval.py) when no data=/task= selections are given.
    cfg = compose_from_checkpoint(overrides)
    if cfg is None:
        cfg = load_config(CONF_DIR, "calibrate_bn", overrides)
    saved_training = dict(cfg.get("training") or {})
    cfg["training"] = {
        "epochs": 0,
        "batch_size": cfg.get("batch_size", saved_training.get("batch_size", 2)),
        "num_workers": cfg.get("num_workers", 0), "shuffle": True,
        # enable_mixed is deliberately absent: the trainer inherits the
        # TRAIN-time compute dtype from the checkpoint's run config on
        # resume (trainer.py) — the reference calibrates under the same
        # AMP autocast it trained with (its trainer.py:254-258)
        "checkpoint_dir": cfg["checkpoint_dir"],
        "weight_name": cfg.get("weight_name", "latest"),
        "optim": {"base_lr": 1e-3,
                  "optimizer": {"class": "AdaBelief", "params": {}}},
    }
    trainer = Trainer(cfg)
    trainer.iterate_epochs(int(cfg.get("epochs", 1)))
    return trainer


if __name__ == "__main__":
    main()
