"""End-to-end trainer tests on tiny synthetic data (CPU): full train ->
checkpoint -> eval cycle through the real config tree, plus double-batch."""
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dpcr_agb_tpu.config import load_config  # noqa: E402
from dpcr_agb_tpu.training.trainer import Trainer  # noqa: E402

CONF = os.path.join(REPO, "conf")


def _cfg(tmp_path, *extra):
    return load_config(CONF, "config", [
        "task=instance", "models=instance/minkowski_baseline",
        "model_name=MPointNet", "data=instance/synthetic/reg",
        "data.transform_type=sparse_xy", "data.synthetic_plots=16",
        f"data.dataroot={tmp_path}/data", "training=nfi/minkowski",
        "training.epochs=1", "training.batch_size=4",
        "training.num_workers=2", f"run_dir={tmp_path}/run", *extra])


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    t = Trainer(_cfg(tmp))
    t.train()
    return tmp


def test_train_writes_checkpoint_and_metrics(run_dir):
    assert (run_dir / "run" / "MPointNet.ckpt").exists()
    recs = [json.loads(l) for l in open(run_dir / "run" / "metrics.jsonl")]
    stages = {r["stage"] for r in recs}
    assert {"train", "val", "test"} <= stages
    val = [r for r in recs if r["stage"] == "val"][-1]
    assert any(k.endswith("_rmse") for k in val)


def test_eval_restores_and_exports(run_dir):
    cfg = _cfg(run_dir, "visualization=eval",
                f"training.checkpoint_dir={run_dir}/run",
                f"run_dir={run_dir}/eval")
    t = Trainer(cfg, eval_mode=True)
    metrics = t.eval("test")
    assert any("total" in k for k in metrics)
    csvs = [f for f in os.listdir(run_dir / "eval")
            if f.endswith("_preds.csv")]
    assert csvs, "prediction export missing"


@pytest.mark.slow
def test_double_batch_training(run_dir):
    cfg = _cfg(run_dir, "data.sparse_xy.double_batch=True",
                f"run_dir={run_dir}/run_double", "debugging=early_break")
    t = Trainer(cfg)
    assert t.bundle.spec.double_batch
    t.train()
    # loader emitted paired duplicate samples
    batch = next(iter(t.loaders["train"].epoch(0)))
    dbl = np.asarray(batch.is_double)
    assert dbl[1::2].all() and not dbl[0::2].any()


@pytest.mark.slow
def test_training_determinism(tmp_path):
    """Same seed => bit-identical metrics across two full train runs
    (explicit PRNG-key plumbing; SURVEY.md §5.2 asks for this guarantee —
    the reference only seeds and hopes)."""
    recs = []
    for run in ("a", "b"):
        cfg = _cfg(tmp_path, f"run_dir={tmp_path}/det_{run}", "seed=7",
                   "training.num_workers=2")
        Trainer(cfg).train()
        recs.append([json.loads(l)
                     for l in open(tmp_path / f"det_{run}" / "metrics.jsonl")])
    assert len(recs[0]) == len(recs[1])
    for ra, rb in zip(*recs):
        assert ra == rb, (ra, rb)


@pytest.mark.slow
def test_ply_visualization_export(run_dir):
    cfg = _cfg(run_dir, "visualization=eval",
               "visualization.format=[csv,ply]",
               f"training.checkpoint_dir={run_dir}/run",
               f"run_dir={run_dir}/eval_ply")
    t = Trainer(cfg, eval_mode=True)
    t.eval("test")
    viz = run_dir / "eval_ply" / "viz"
    plys = list(viz.rglob("*.ply"))
    assert plys, "per-sample ply export missing"
    from dpcr_agb_tpu.data.las_io import read_ply
    props = read_ply(str(plys[0]))
    assert {"x", "y", "z"} <= set(props)
    assert any(c.startswith("pred_") for c in props)
    assert len(props["x"]) > 0
