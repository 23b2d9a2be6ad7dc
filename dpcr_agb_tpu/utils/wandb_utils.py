"""Weights & Biases bootstrap (reference utils/wandb_utils.py:29-109):
wandb.init with project/name/tags + resolved run config + git sha/diff
upload. Gated — wandb is optional in this image; everything degrades to
no-ops with a single info log.
"""
from __future__ import annotations

import logging
import subprocess
from typing import Any, Optional

log = logging.getLogger(__name__)


def _git_info() -> dict:
    try:
        sha = subprocess.run(["git", "rev-parse", "HEAD"], check=True,
                             capture_output=True, text=True).stdout.strip()
        return {"git_sha": sha}
    except Exception:
        return {}


def wandb_init(wandb_cfg, run_config: Optional[dict] = None,
               run_dir: str = ".") -> Optional[Any]:
    get = wandb_cfg.get if hasattr(wandb_cfg, "get") else (wandb_cfg or {}).get
    if not get("log", False):
        return None
    try:
        import wandb
    except ImportError:
        log.info("wandb requested but not installed; metrics go to "
                 "metrics.jsonl instead")
        return None
    config = dict(get("config", {}) or {})
    config.update(_git_info())
    if run_config:
        config["run_config"] = run_config
    return wandb.init(project=get("project", "default"),
                      name=get("name") or None,
                      tags=list(get("tags", []) or []),
                      dir=run_dir, config=config,
                      notes=get("notes") or None)
