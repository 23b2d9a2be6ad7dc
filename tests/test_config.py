"""Tests for the Hydra-compatible config engine (reference CLI surface:
/root/reference/torch-points3d/conf/config.yaml + README.md:132-217 grammar)."""
import os

import pytest

from dpcr_agb_tpu.config import Cfg, MissingMandatoryValue, load_config


@pytest.fixture
def conf_dir(tmp_path):
    d = tmp_path / "conf"
    (d / "task").mkdir(parents=True)
    (d / "data" / "instance" / "NFI").mkdir(parents=True)
    (d / "data" / "instance" / "NFI" / "transforms").mkdir(parents=True)
    (d / "models" / "instance").mkdir(parents=True)
    (d / "training").mkdir(parents=True)
    (d / "config.yaml").write_text(
        "defaults:\n"
        "  - task: ???\n"
        "  - training: default\n"
        "  - data: ???\n"
        "models: ???\n"
        "model_name: ???\n"
        "update_lr_scheduler_on: on_epoch\n"
        "eval_frequency: 1\n"
    )
    (d / "task" / "instance.yaml").write_text(
        "# @package _global_\n"
        "defaults:\n"
        "  - /models: instance/minkowski\n"
        "task_name: instance\n"
    )
    (d / "training" / "default.yaml").write_text(
        "# @package training\n"
        "epochs: 310\n"
        "batch_size: 32\n"
        "optim:\n"
        "  base_lr: 0.005\n"
        "  optimizer:\n"
        "    class: AdaBelief\n"
        "    params:\n"
        "      lr: ${training.optim.base_lr}\n"
    )
    (d / "data" / "instance" / "NFI" / "reg.yaml").write_text(
        "# @package data\n"
        "defaults:\n"
        "  - default\n"
        "targets: {BMag_ha: {task: regression, weight: 0.5}}\n"
    )
    (d / "data" / "instance" / "NFI" / "default.yaml").write_text(
        "# @package data\n"
        "first_subsampling: 0.0125\n"
        "transform_type: ???\n"
        "xy_radius: 15\n"
    )
    (d / "models" / "instance" / "minkowski.yaml").write_text(
        "# @package models\n"
        "SENet14:\n"
        "  model_name: SENet14\n"
        "  activation: gelu\n"
        "SENet50:\n"
        "  model_name: SENet50\n"
        "  activation: gelu\n"
    )
    return str(d)


def test_compose_with_group_overrides(conf_dir):
    cfg = load_config(conf_dir, "config", [
        "task=instance", "data=instance/NFI/reg", "model_name=SENet14",
        "data.transform_type=sparse_xy",
    ])
    assert cfg.task_name == "instance"
    assert cfg.data.first_subsampling == 0.0125
    assert cfg.data.targets.BMag_ha.weight == 0.5
    assert cfg.data.transform_type == "sparse_xy"
    assert cfg.training.epochs == 310
    assert cfg.models.SENet14.activation == "gelu"


def test_interpolation_chain(conf_dir):
    cfg = load_config(conf_dir, "config", [
        "task=instance", "data=instance/NFI/reg", "model_name=SENet50",
        "data.transform_type=sparse_xy",
    ])
    # nested interpolation like ${models.${model_name}.activation}
    cfg.probe = "${models.${model_name}.activation}"
    assert cfg.probe == "gelu"
    assert cfg.training.optim.optimizer.params.lr == 0.005


def test_missing_mandatory_raises(conf_dir):
    with pytest.raises(MissingMandatoryValue):
        load_config(conf_dir, "config", ["data=instance/NFI/reg"])
    cfg = load_config(conf_dir, "config", [
        "task=instance", "data=instance/NFI/reg"])
    with pytest.raises(MissingMandatoryValue):
        _ = cfg.model_name
    assert cfg.get("model_name", "fallback") == "fallback"


def test_cli_value_parsing(conf_dir):
    cfg = load_config(conf_dir, "config", [
        "task=instance", "data=instance/NFI/reg",
        "training.epochs=5", "training.wd=1e-2", "training.flag=True",
        "+training.extra=[1,2,3]", "model_name=SENet14",
    ])
    assert cfg.training.epochs == 5
    assert cfg.training.wd == pytest.approx(0.01)
    assert cfg.training.flag is True
    assert list(cfg.training.extra) == [1, 2, 3]


def test_delete_and_select(conf_dir):
    cfg = load_config(conf_dir, "config", [
        "task=instance", "data=instance/NFI/reg", "model_name=SENet14",
        "~data.xy_radius",
    ])
    assert "xy_radius" not in cfg.data
    assert cfg.select("data.targets.BMag_ha.task") == "regression"
    assert cfg.select("data.nope.deep", default=7) == 7


def test_cfg_mutation_and_iteration():
    cfg = Cfg({"a": {"b": 1}, "c": [1, 2]})
    cfg.a.b = 5
    assert cfg.a.b == 5
    assert set(cfg.keys()) == {"a", "c"}
    assert cfg.to_dict() == {"a": {"b": 5}, "c": [1, 2]}


def test_now_resolver():
    cfg = Cfg({"dir": "./outputs/${now:%Y}"})
    import datetime
    assert str(datetime.datetime.now().year) in cfg.dir
