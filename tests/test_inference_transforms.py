"""ModelInference / PointNetForward with a real pretrained-checkpoint
fixture: train MPointNet briefly on tiny synthetic data, then run the
inference transform inside a pipeline (reference
core/data_transform/inference_transforms.py:11-87)."""
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dpcr_agb_tpu.config import load_config  # noqa: E402
from dpcr_agb_tpu.training.trainer import Trainer  # noqa: E402

CONF = os.path.join(REPO, "conf")

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("inference_ckpt")
    cfg = load_config(CONF, "config", [
        "task=instance", "models=instance/minkowski_baseline",
        "model_name=MPointNet", "data=instance/synthetic/reg",
        "data.transform_type=sparse_xy", "data.synthetic_plots=8",
        f"data.dataroot={tmp}/data", "training=nfi/minkowski",
        "training.epochs=1", "training.batch_size=4",
        "training.num_workers=0", "debugging=early_break",
        f"run_dir={tmp}/run"])
    Trainer(cfg).train()
    return str(tmp / "run")


def test_pointnet_forward_attaches_features(ckpt_dir, rng):
    from dpcr_agb_tpu.transforms import PointNetForward

    t = PointNetForward(checkpoint_dir=ckpt_dir, model_name="MPointNet",
                        weight_name="latest", feat_name="pn_feat")
    n = 64
    sample = {"pos": rng.random((n, 3)).astype(np.float32),
              "x": np.ones((n, 3), np.float32)}
    out = t(rng, sample)
    assert out["pn_feat"].shape == (n, 1024)
    assert np.isfinite(out["pn_feat"]).all()
    # deterministic: same sample -> same features
    again = t(rng, dict(sample))
    np.testing.assert_array_equal(out["pn_feat"], again["pn_feat"])


def test_model_inference_base_raises(ckpt_dir, rng):
    from dpcr_agb_tpu.transforms import ModelInference

    t = ModelInference(checkpoint_dir=ckpt_dir, model_name="MPointNet")
    with pytest.raises(NotImplementedError):
        t(rng, {"pos": np.zeros((4, 3), np.float32)})
