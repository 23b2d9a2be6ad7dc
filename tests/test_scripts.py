"""Tests for the offline-analysis scripts (eval_scores, baselines) and the
experiment manager."""
import json
import os
import sys

import numpy as np
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import eval_scores  # noqa: E402
import baselines  # noqa: E402


@pytest.fixture
def trial_dir(tmp_path, rng):
    """One trial of prediction exports with a known bias."""
    d = tmp_path / "trial0"
    d.mkdir()
    y = rng.uniform(50, 400, size=300)
    pred = y + rng.normal(0, 20, size=300) - 10.0  # additive bias -10
    for stage, sl in [("train", slice(0, 200)), ("val", slice(200, 250)),
                      ("test", slice(250, 300))]:
        pd.DataFrame({
            "label_idx": np.arange(sl.stop - sl.start),
            "pred_BMag_ha": pred[sl], "y_BMag_ha": y[sl],
            "stage": stage,
        }).to_csv(d / f"AREA_{stage}_preds.csv", index=False)
    return str(d)


class TestEvalScores:
    def test_bias_correction_removes_known_bias(self, trial_dir):
        df = eval_scores.load_trial(trial_dir)
        targets = eval_scores.target_names(df)
        assert targets == ["BMag_ha"]
        corrected = eval_scores.bias_correct(df, targets)
        fit = corrected[corrected["stage"].isin(["train", "val"])]
        residual = (fit["y_BMag_ha"] - fit["pred_BMag_ha"]).mean()
        assert abs(residual) < 1e-6  # delta fitted on train+val

    def test_metrics_and_aggregation(self, trial_dir):
        df = eval_scores.load_trial(trial_dir)
        t = ["BMag_ha"]
        m1 = eval_scores.trial_metrics(eval_scores.bias_correct(df, t),
                                       "test", t)
        assert 0.5 < m1["BMag_ha"]["r2"] <= 1.0
        agg = eval_scores.aggregate([m1, m1], t)
        assert agg["BMag_ha"]["n_trials"] == 2
        assert agg["BMag_ha"]["r2_median"] == pytest.approx(
            m1["BMag_ha"]["r2"])


class TestBaselines:
    def test_metrics_definitions(self):
        y = np.array([100.0, 200.0, 0.0, 300.0])
        p = np.array([110.0, 190.0, 5.0, 300.0])
        m = baselines.metrics(y, p)
        assert m["n"] == 4
        # MAPE over y != 0 only
        assert m["mape"] == pytest.approx(
            np.mean([10 / 100, 10 / 200, 0.0]) * 100)
        assert m["mean_bias"] == pytest.approx(np.mean(y - p))

    def test_linear_and_power_on_synthetic_stats(self, tmp_path, rng):
        cols = baselines.variable_list()
        n = 120
        rows = {}
        h = rng.uniform(5, 30, size=n)
        for c in cols:
            rows[c] = h * rng.uniform(0.8, 1.2) if c.startswith("h_") \
                else rng.uniform(0, 1, size=n)
        rows["BMag_ha"] = 3.0 * h ** 1.5 + rng.normal(0, 5, n)
        rows["V_ha"] = 6.0 * h ** 1.4 + rng.normal(0, 10, n)
        df = pd.DataFrame(rows)
        for split, sl in [("train", slice(0, 80)), ("val", slice(80, 100)),
                          ("test", slice(100, 120))]:
            df.iloc[sl].to_csv(tmp_path / f"{split}_split.csv", index=False)
        dfs = baselines.load_splits(str(tmp_path))
        pred_lin = baselines.fit_linear(dfs, cols)(dfs["test"])
        pred_pow = baselines.fit_power(dfs)(dfs["test"])
        for pred in (pred_lin, pred_pow):
            m = baselines.metrics(dfs["test"]["BMag_ha"].values, pred[:, 0])
            assert m["r2"] > 0.8, m


def test_experiment_manager_roundtrip(tmp_path):
    from dpcr_agb_tpu.visualization.experiment_manager import ExperimentFolder
    run = tmp_path / "run"
    run.mkdir()
    (run / "X.ckpt").write_bytes(b"")
    with open(run / "metrics.jsonl", "w") as f:
        for e, v in [(1, 5.0), (2, 3.0), (3, 4.0)]:
            f.write(json.dumps({"epoch": e, "stage": "val",
                                "val_total_T_rmse": v}) + "\n")
    ef = ExperimentFolder(str(run))
    assert ef.model_name == "X"
    assert ef.best_epoch("val_total_T_rmse", "min") == (2, 3.0)
    s = ef.summary()
    assert s["best_val_total_T_rmse"]["epoch"] == 2


class TestRunTrials:
    def test_derive_eval_transform(self):
        sys.path.insert(0, os.path.join(REPO, "scripts"))
        import run_trials
        assert run_trials.derive_eval_transform("sparse_xy") == \
            "sparse_xy_eval"
        assert run_trials.derive_eval_transform("xy_eval") == "xy_eval"
        assert run_trials.derive_eval_transform(None) is None

    def test_override_helpers(self):
        import run_trials
        ov = ["model_name=KPConv", "data.transform_type=xy", "training=x"]
        assert run_trials._get_override(ov, "model_name") == "KPConv"
        assert run_trials._get_override(ov, "missing", "d") == "d"
        assert run_trials._without(ov, "training") == ov[:2]

    def test_requires_overrides(self, capsys):
        import run_trials
        with pytest.raises(SystemExit):
            run_trials.main(["--trials", "1", "--out", "/tmp/x"])
