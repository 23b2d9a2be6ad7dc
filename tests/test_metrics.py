"""Oracle tests for meters + InstanceTracker vs hand-computed / sklearn values."""
import numpy as np
import pytest
from sklearn.metrics import mean_absolute_error, mean_squared_error, r2_score

from dpcr_agb_tpu.metrics import (
    APPRXMeter, AverageValueMeter, InstanceTracker, MAEMeter, MSEMeter,
    R2Meter, TrackerSpec,
)


def test_mse_meter_rmse_incremental(rng):
    y = rng.normal(size=100)
    p = y + rng.normal(scale=0.3, size=100)
    m = MSEMeter(root=True)
    m.add(p[:37], y[:37])
    m.add(p[37:], y[37:])
    assert m.value() == pytest.approx(np.sqrt(mean_squared_error(y, p)))


def test_mae_meter(rng):
    y, p = rng.normal(size=50), rng.normal(size=50)
    m = MAEMeter()
    for i in range(0, 50, 10):
        m.add(p[i:i + 10], y[i:i + 10])
    assert m.value() == pytest.approx(mean_absolute_error(y, p))


def test_r2_meter_fixed_mean(rng):
    y = rng.normal(loc=3.0, size=200)
    p = y + rng.normal(scale=0.5, size=200)
    # when the fixed mean equals the empirical mean of y, matches sklearn
    m = R2Meter(target_mean=y.mean())
    m.add(p[:113], y[:113])
    m.add(p[113:], y[113:])
    assert m.value() == pytest.approx(r2_score(y, p))
    # empty meter returns 0.0 (reference r2meter.py:24)
    assert R2Meter(0.0).value() == 0.0


def test_apprx_meter():
    m = APPRXMeter()
    m.add(np.array([2.0, 2.0]), np.array([1.0, 1.0]))
    assert m.value() == pytest.approx(1.0)  # |1 - 4/2|


def test_average_value_meter():
    m = AverageValueMeter()
    for v in [1.0, 2.0, 3.0]:
        m.add(v)
    mean, std = m.value()
    assert mean == pytest.approx(2.0)
    assert std == pytest.approx(1.0)


def _spec(log_train=True):
    means = {
        "NFI": {"val": np.array([10.0, 100.0])},
        "total": {"val": np.array([10.0, 100.0])},
    }
    return TrackerSpec(
        area_names=["NFI"], reg_targets=["BMag_ha", "V_ha"],
        target_means=means, log_train_metrics=log_train)


def test_instance_tracker_keys_and_values(tmp_path, rng):
    tr = InstanceTracker(_spec(), stage="val", log_dir=str(tmp_path))
    tr.reset("val")
    y = np.abs(rng.normal(loc=10.0, size=(32, 2)))
    p = y + rng.normal(scale=1.0, size=(32, 2))
    tr.track({"losses": {"loss": 0.5, "loss_reg": 0.4},
              "reg_out": p, "reg_y": y, "area_idx": np.zeros(32, int)})
    m = tr.get_metrics()
    assert m["val_loss"] == pytest.approx(0.5)
    assert m["val_total_BMag_ha_rmse"] == pytest.approx(
        np.sqrt(mean_squared_error(y[:, 0], p[:, 0])))
    assert m["val_NFI_V_ha_mae"] == pytest.approx(
        mean_absolute_error(y[:, 1], p[:, 1]))
    # same points tracked under the named area and under total
    assert m["val_NFI_BMag_ha_rmse"] == pytest.approx(m["val_total_BMag_ha_rmse"])


def test_instance_tracker_nan_masking(tmp_path):
    tr = InstanceTracker(_spec(), stage="val", log_dir=str(tmp_path))
    tr.reset("val")
    y = np.array([[1.0, np.nan], [2.0, 4.0]])
    p = np.array([[1.5, 9.9], [2.0, 5.0]])
    tr.track({"losses": {}, "reg_out": p, "reg_y": y,
              "area_idx": np.zeros(2, int)})
    m = tr.get_metrics()
    # V_ha uses only the non-NaN row
    assert m["val_total_V_ha_mae"] == pytest.approx(1.0)
    assert m["val_total_BMag_ha_mae"] == pytest.approx(0.25)


def test_instance_tracker_train_suppression(tmp_path):
    tr = InstanceTracker(_spec(log_train=False), stage="train", log_dir=str(tmp_path))
    tr.reset("train")
    tr.track({"losses": {"loss": 1.0},
              "reg_out": np.ones((4, 2)), "reg_y": np.ones((4, 2)),
              "area_idx": np.zeros(4, int)})
    m = tr.get_metrics()
    assert list(m.keys()) == ["train_loss"]


def test_instance_tracker_sample_mask(tmp_path):
    tr = InstanceTracker(_spec(), stage="val", log_dir=str(tmp_path))
    tr.reset("val")
    y = np.array([[1.0, 1.0], [100.0, 100.0]])
    p = np.array([[2.0, 2.0], [0.0, 0.0]])
    tr.track({"losses": {}, "reg_out": p, "reg_y": y,
              "area_idx": np.zeros(2, int),
              "sample_mask": np.array([True, False])})
    m = tr.get_metrics()
    assert m["val_total_BMag_ha_mae"] == pytest.approx(1.0)


def test_metric_func_goals(tmp_path):
    tr = InstanceTracker(_spec(), stage="val", log_dir=str(tmp_path))
    assert tr.metric_func["loss"] is min
    assert tr.metric_func["_rmse"] is min


def test_publish_writes_jsonl(tmp_path):
    tr = InstanceTracker(_spec(), stage="val", log_dir=str(tmp_path))
    tr.track({"losses": {"loss": 0.7}})
    metrics, epoch = tr.get_publish_metrics(epoch=3)
    tr.publish_metrics(metrics, epoch)
    import json
    rec = json.loads((tmp_path / "metrics.jsonl").read_text().strip())
    assert rec["epoch"] == 3 and rec["val_loss"] == pytest.approx(0.7)


def test_publish_best_tables_logs_one_table_per_improved(monkeypatch):
    """Reference model_checkpoint.py:296-342: each newly-improved best
    metric logs a wandb.Table snapshotting all current metrics."""
    import sys
    import types
    from dpcr_agb_tpu.metrics.base_tracker import BaseTracker

    logged = {}

    class FakeTable:
        def __init__(self, columns):
            self.columns, self.rows = columns, []

        def add_data(self, *row):
            self.rows.append(row)

    fake = types.SimpleNamespace(Table=FakeTable,
                                 log=lambda d: logged.update(d))
    monkeypatch.setitem(sys.modules, "wandb", fake)
    tr = BaseTracker("val", wandb_log=False)
    tr._wandb = True  # force the gated path with the stub
    metrics = {"val_total_V_ha_rmse": 1.0, "val_total_V_ha_r2": 0.5}
    tr.publish_best_tables(["val_total_V_ha_rmse"], metrics, epoch=7)
    assert set(logged) == {"val_best_total_V_ha_rmse"}
    t = logged["val_best_total_V_ha_rmse"]
    assert t.columns == ["epoch", "metric", "value"]
    assert (7, "val_total_V_ha_rmse", 1.0) in t.rows
    assert (7, "val_total_V_ha_r2", 0.5) in t.rows
    # no-op without improvements
    logged.clear()
    tr.publish_best_tables([], metrics, epoch=8)
    assert logged == {}


class TestConfusionMatrix:
    def test_stats_match_sklearn_semantics(self, rng):
        from dpcr_agb_tpu.metrics.confusion_matrix import ConfusionMatrix
        gt = rng.integers(0, 3, 200)
        pr = rng.integers(0, 3, 200)
        cm = ConfusionMatrix(["a", "b", "c"])
        cm.count_predicted_batch(gt[:100], pr[:100])
        cm.count_predicted_batch(gt[100:], pr[100:])
        mat = cm.get_confusion_matrix()
        want = np.zeros((3, 3), np.int64)
        for g, p in zip(gt, pr):
            want[g, p] += 1
        np.testing.assert_array_equal(mat, want)
        stats, class_stats, _ = cm.get_stats()
        assert abs(stats["acc"] - (gt == pr).mean()) < 1e-9
        # macro accuracy == mean per-class recall
        accs = [((pr == c) & (gt == c)).sum() / (gt == c).sum()
                for c in range(3)]
        assert abs(stats["macc"] - np.mean(accs)) < 1e-9
        assert cm.get_overall_accuracy() == stats["acc"]
        iou = cm.get_average_intersection_union()
        assert 0.0 <= iou <= 1.0
        assert ("acc", "a") in class_stats
