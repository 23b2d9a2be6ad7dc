#!/usr/bin/env python
"""Training entry point (reference torch-points3d/train.py:7-18).

    python train.py task=instance models=instance/minkowski_baseline \
        model_name=SENet14 data=instance/NFI/reg data.transform_type=sparse_xy \
        training=nfi/minkowski lr_scheduler=cosineawr \
        update_lr_scheduler_on=on_num_batch
"""
import logging
import os
import sys

from dpcr_agb_tpu.config import load_config
from dpcr_agb_tpu.training.trainer import Trainer

CONF_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "conf")


def main(overrides=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s")
    cfg = load_config(CONF_DIR, "config", overrides or sys.argv[1:])
    if cfg.get("pretty_print"):
        print(cfg.pretty())
    trainer = Trainer(cfg)
    trainer.train()
    return trainer


if __name__ == "__main__":
    main()
