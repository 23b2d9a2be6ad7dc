"""RadiusObjectAdder (treeadd) + meta-transform tests."""
import os

import numpy as np
import pytest

from dpcr_agb_tpu.transforms import instantiate_transform
from dpcr_agb_tpu.transforms.objects import RadiusObjectAdder, topview_sample


@pytest.fixture
def tree_db(tmp_path, rng):
    d = tmp_path / "treeDB" / "processed_treeDB_ALS" / "train" / "treeDB"
    d.mkdir(parents=True)
    for i in range(5):
        n = 50 + i * 10
        pos = rng.normal(size=(n, 3)).astype(np.float32) * [1, 1, 4]
        pos[:, 2] += 8
        np.savez(d / f"{i}.npz", pos=pos,
                 x=rng.normal(size=(n, 3)).astype(np.float32),
                 local_stats=np.array([5.0], np.float32))
    return str(tmp_path)


def _sample(rng, n=200):
    return {"pos": rng.uniform(-15, 15, size=(n, 3)).astype(np.float32),
            "x": rng.normal(size=(n, 3)).astype(np.float32),
            "area_name": np.str_("NFI"), "is_double": False}


class TestRadiusObjectAdder:
    def test_adds_objects_in_annulus(self, tree_db, rng):
        adder = RadiusObjectAdder(
            areas={"treeDB": {"type": "object"}}, root_folder=tree_db,
            dataset_name="treeDB", processed_folder="processed_treeDB_ALS",
            min_radius=15.1, max_radius=20.0, n_max_objects={"scene": 4,
                                                             "object": 4},
            rot_z=180, zero_center_z=True, in_memory=True, p=1.0,
            indicator_key="object_indicator")
        s = _sample(rng)
        out = adder(rng, s)
        n_added = out["pos"].shape[0] - 200
        assert n_added >= 50  # at least one tree
        assert out["x"].shape[0] == out["pos"].shape[0]
        added = out["pos"][200:]
        radii = np.linalg.norm(added[:, :2], axis=1)
        # tree points stay roughly in the annulus (tree crowns have extent)
        assert radii.mean() > 12
        ind = out["object_indicator"]
        assert ind[:200].sum() == 0 and ind[200:].all()

    def test_p_zero_no_change(self, tree_db, rng):
        adder = RadiusObjectAdder(
            areas={"treeDB": {"type": "object"}}, root_folder=tree_db,
            dataset_name="treeDB", processed_folder="processed_treeDB_ALS",
            min_radius=15.1, max_radius=20.0, n_max_objects=2, p=0.0)
        s = _sample(rng)
        out = adder(rng, s)
        assert out["pos"].shape[0] == 200

    def test_only_doubled_batch_gating(self, tree_db, rng):
        adder = RadiusObjectAdder(
            areas={"treeDB": {"type": "object"}}, root_folder=tree_db,
            dataset_name="treeDB", processed_folder="processed_treeDB_ALS",
            min_radius=15.1, max_radius=20.0, n_max_objects=2, p=1.0,
            only_doubled_batch=True)
        s = _sample(rng)
        assert adder(rng, dict(s))["pos"].shape[0] == 200  # not doubled
        s["is_double"] = True
        assert adder(rng, s)["pos"].shape[0] > 200

    def test_missing_objects_raises(self, tmp_path, rng):
        adder = RadiusObjectAdder(
            areas={"treeDB": {"type": "object"}}, root_folder=str(tmp_path),
            dataset_name="nope", processed_folder="x", min_radius=1,
            max_radius=2, n_max_objects=1, p=1.0)
        with pytest.raises(AssertionError, match="no objects"):
            adder(rng, _sample(rng))


def test_topview_sample_biases_high_points(rng):
    pos = np.zeros((1000, 3), np.float32)
    pos[:, 2] = np.linspace(0.1, 30, 1000)
    s = {"pos": pos, "x": np.arange(1000, dtype=np.float32)[:, None]}
    out = topview_sample(rng, s, 300)
    assert out["pos"].shape[0] == 300
    assert out["pos"][:, 2].mean() > 15  # biased toward canopy


class TestMetaTransforms:
    def test_lottery(self, rng):
        t = instantiate_transform({
            "transform": "LotteryTransform",
            "params": {"transform_options": [
                {"transform": "StartZFromZero"},
                {"transform": "AddOnes"},
            ]}})
        s = {"pos": rng.normal(size=(10, 3)).astype(np.float32) + 5}
        out = t(rng, s)
        assert ("ones" in out) or (out["pos"][:, 2].min() < 1e-6)

    def test_random_param(self, rng):
        t = instantiate_transform({
            "transform": "RandomParamTransform",
            "params": {"transform_name": "RandomNoise",
                       "transform_params": {
                           "sigma": {"min": 0.001, "max": 0.002,
                                     "type": "float"},
                           "clip": {"value": 0.01}}}})
        s = {"pos": np.zeros((100, 3), np.float32)}
        out = t(rng, s)
        assert 0 < np.abs(out["pos"]).max() <= 0.01

    def test_compose(self, rng):
        t = instantiate_transform({
            "transform": "ComposeTransform",
            "params": {"transform_options": [
                {"transform": "AddOnes"},
                {"transform": "XYZFeature", "params": {"add_z": True}},
            ]}})
        out = t(rng, {"pos": rng.normal(size=(5, 3)).astype(np.float32)})
        assert "ones" in out and "pos_z" in out


class TestNewSamplers:
    def test_density_filter(self, rng):
        dense = rng.normal(size=(200, 3)).astype(np.float32) * 0.05
        sparse = rng.normal(size=(10, 3)).astype(np.float32) * 10 + 50
        s = {"pos": np.concatenate([dense, sparse])}
        t = instantiate_transform({"transform": "DensityFilter",
                                   "params": {"radius_nn": 0.5, "min_num": 5}})
        out = t(rng, s)
        assert out["pos"].shape[0] <= 200
        assert np.abs(out["pos"]).max() < 10

    def test_periodic_sampling(self, rng):
        s = {"pos": rng.uniform(0, 1, size=(500, 3)).astype(np.float32)}
        t = instantiate_transform({"transform": "PeriodicSampling",
                                   "params": {"period": 0.2, "prop": 0.3}})
        out = t(rng, s)
        assert 0 < out["pos"].shape[0] < 500

    def test_irregular_sampling(self, rng):
        s = {"pos": rng.uniform(0, 10, size=(500, 3)).astype(np.float32)}
        t = instantiate_transform({"transform": "IrregularSampling",
                                   "params": {"d_half": 2.0, "p": 2,
                                              "grid_size_center": 1.0}})
        out = t(rng, s)
        assert 0 < out["pos"].shape[0] < 500
