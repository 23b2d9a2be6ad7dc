"""Golden/oracle tests for the transform layer against the reference semantics
(file:line references are in each transform's docstring)."""
import numpy as np
import pytest

import dpcr_agb_tpu.transforms as T


def make_sample(rng, n=1000, with_x=False):
    s = {
        "pos": rng.random((n, 3)).astype(np.float32) * np.array([30, 30, 20], np.float32)
        - np.array([15, 15, 0], np.float32),
        "y_reg": np.array([100.0, 200.0], np.float32),
        "y_reg_mask": np.array([True, True]),
    }
    if with_x:
        s["x"] = rng.random((n, 3)).astype(np.float32)
    return s


SKIP = ["y_reg", "y_reg_mask"]


def test_scale_pos_div(rng):
    s = make_sample(rng)
    out = T.ScalePos(scale_x=30, scale_y=30, scale_z=40, op="div")(rng, s)
    np.testing.assert_allclose(out["pos"], s["pos"] / np.array([[30, 30, 40]]),
                               rtol=1e-6)


def test_move_center_and_start_z(rng):
    s = make_sample(rng)
    out = T.MoveCenterPosPerSample(center_x=0.5, center_y=0.5, center_z=0.0)(rng, s)
    np.testing.assert_allclose(out["pos"][:, 0], s["pos"][:, 0] + 0.5, rtol=1e-5)
    out = T.StartZFromZero()(rng, out)
    assert out["pos"][:, 2].min() == pytest.approx(0.0, abs=1e-6)


def test_random_rotation_z_only_preserves_radii(rng):
    s = make_sample(rng)
    out = T.Random3AxisRotation(rot_x=0, rot_y=0, rot_z=180)(rng, s)
    r_in = np.linalg.norm(s["pos"][:, :2], axis=1)
    r_out = np.linalg.norm(out["pos"][:, :2], axis=1)
    np.testing.assert_allclose(r_in, r_out, rtol=1e-4)
    np.testing.assert_allclose(s["pos"][:, 2], out["pos"][:, 2], rtol=1e-5)


def test_random_noise_clipped(rng):
    s = make_sample(rng)
    out = T.RandomNoise(sigma=0.0025, clip=0.005)(rng, s)
    assert np.abs(out["pos"] - s["pos"]).max() <= 0.005 + 1e-5  # f32 rounding


def test_fixed_points_exact_and_skip_list(rng):
    s = make_sample(rng, n=100, with_x=True)
    out = T.FixedPointsOwn(250, skip_list=SKIP)(rng, s)
    assert out["pos"].shape == (250, 3)
    assert out["x"].shape == (250, 3)
    assert out["y_reg"].shape == (2,)  # untouched per-sample target
    # minimal duplication: each original point appears >= 2 times
    # (250 = 2*100 + 50)
    uniq, counts = np.unique(out["pos"], axis=0, return_counts=True)
    assert counts.min() >= 2 and counts.max() <= 3


def test_max_min_points(rng):
    s = make_sample(rng, n=5000)
    out = T.MaxPoints(1000, skip_list=SKIP)(rng, s)
    assert out["pos"].shape[0] == 1000
    # no duplicates on subsample
    assert len(np.unique(out["pos"], axis=0)) == 1000
    s2 = make_sample(rng, n=100)
    out2 = T.MinPoints(500, skip_list=SKIP)(rng, s2)
    assert out2["pos"].shape[0] == 500
    # MinPoints uses a fixed seed-42 stream — deterministic across calls
    out3 = T.MinPoints(500, skip_list=SKIP)(np.random.default_rng(7), dict(s2))
    np.testing.assert_array_equal(out2["pos"], out3["pos"])
    # untouched when already enough points
    assert T.MinPoints(10)(rng, s2)["pos"].shape[0] == 100


def test_random_dropout(rng):
    s = make_sample(rng, n=1000)
    out = T.RandomDropout(dropout_ratio=0.2, dropout_application_ratio=1.0,
                          min_points=500, skip_list=SKIP)(rng, s)
    assert out["pos"].shape[0] == 800
    out2 = T.RandomDropout(dropout_ratio=0.2, dropout_application_ratio=0.0)(rng, s)
    assert out2["pos"].shape[0] == 1000


def test_random_ground_removal(rng):
    s = make_sample(rng, n=2000)
    s["pos"][:, 2] = np.linspace(0, 20, 2000)
    out = T.RandomGroundRemoval(min_v=1.0, max_v=1.0, p=1.0, min_points=10,
                                skip_list=SKIP)(rng, s)
    # all kept z were shifted down by the 1m threshold and are > 0
    assert out["pos"][:, 2].min() > 0
    assert out["pos"].shape[0] == (s["pos"][:, 2] > 1.0).sum()


def test_zfilter(rng):
    s = make_sample(rng)
    out = T.ZFilter(z_min=0.0, z_max=10.0, skip_keys=SKIP)(rng, s)
    assert (out["pos"][:, 2] > 0).all() and (out["pos"][:, 2] < 10).all()


def test_cylinder_extend(rng):
    s = make_sample(rng)
    out = T.CylinderExtend(radius=5.0, skip_list=SKIP)(rng, s)
    assert (np.linalg.norm(out["pos"][:, :2], axis=1) <= 5.0 + 1e-6).all()


HEXAGON = [[0., 0.5], [0.25, 0.9330127], [0.75, 0.9330127],
           [1., 0.5], [0.75, 0.0669873], [0.25, 0.0669873]]


def test_polygon_extend_hexagon(rng):
    n = 5000
    s = {"pos": rng.random((n, 3)).astype(np.float32)}
    out = T.Polygon2dExtend(polygon=HEXAGON)(rng, s)
    # hexagon area / unit square ~ 0.6495
    assert 0.58 < out["pos"].shape[0] / n < 0.72
    # all kept points satisfy the 6 half-plane constraints of a regular hexagon
    xy = out["pos"][:, :2] - 0.5
    # flat-top hexagon with circumradius 0.5: |y| <= 0.4330127
    assert (np.abs(xy[:, 1]) <= 0.4330128).all()


def test_random_polygon_extend_keeps_points(rng):
    n = 3000
    s = {"pos": rng.random((n, 3)).astype(np.float32)}
    out = T.RandomPolygon2dExtend(polygons=[HEXAGON], rotate=180)(rng, s)
    assert 0 < out["pos"].shape[0] < n


def test_points_in_polygon_oracle():
    from dpcr_agb_tpu.transforms.geometry import points_in_polygon
    square = np.array([[0, 0], [1, 0], [1, 1], [0, 1]])
    pts = np.array([[0.5, 0.5], [1.5, 0.5], [-0.1, 0.2], [0.99, 0.01]])
    np.testing.assert_array_equal(points_in_polygon(pts, square),
                                  [True, False, False, True])


def test_dbscan_z_outlier_removal(rng):
    # dense cluster at z in [0, 10] + far outliers
    z = np.concatenate([rng.random(1000) * 10, [50.0, 60.0, -40.0]])
    s = {"pos": np.stack([rng.random(1003), rng.random(1003), z], 1).astype(np.float32)}
    out = T.DBSCANZOutlierRemoval(eps=1.5, min_samples=10)(rng, s)
    assert out["pos"].shape[0] == 1000
    assert out["pos"][:, 2].max() < 11


def test_dbscan1d_labels_vs_sklearn(rng):
    from sklearn.cluster import DBSCAN
    from dpcr_agb_tpu.transforms.geometry import dbscan1d_labels
    z = np.concatenate([rng.normal(0, 1, 200), rng.normal(10, 1, 150), [30.0]])
    ours = dbscan1d_labels(z, eps=0.5, min_samples=8)
    ref = DBSCAN(eps=0.5, min_samples=8).fit_predict(z[:, None])
    # identical noise sets and identical cluster partitions
    np.testing.assert_array_equal(ours == -1, ref == -1)
    for lab in np.unique(ref[ref >= 0]):
        members = ours[ref == lab]
        assert len(np.unique(members)) == 1 and members[0] >= 0


def test_stat_z_outlier(rng):
    z = np.concatenate([rng.normal(0, 1, 1000), [100.0]])
    s = {"pos": np.stack([np.zeros(1001), np.zeros(1001), z], 1).astype(np.float32)}
    out = T.StatZOutlierRemoval(threshold=4)(rng, s)
    assert out["pos"].shape[0] == 1000


def test_unique_int_rows_matches_np_unique(rng):
    from dpcr_agb_tpu.transforms.core import unique_int_rows
    for rows in (
            np.round(rng.normal(0, 40, (5000, 3))),            # negatives
            rng.integers(-3, 3, (2000, 3)).astype(np.float32),  # heavy dups
            np.zeros((7, 3)),                                   # all one voxel
            np.round(rng.normal(0, 2, (1, 3))),                 # single row
            np.empty((0, 3)),                                   # empty plot
            rng.integers(0, 2**22, (500, 3)).astype(np.int64),  # overflow path
    ):
        uniq, inv = unique_int_rows(rows)
        want_uniq, want_inv = np.unique(rows, axis=0, return_inverse=True)
        # same unique set (row order may differ: numeric vs byte lexicographic)
        np.testing.assert_array_equal(
            np.sort(uniq.astype(np.int64), axis=0),
            np.sort(want_uniq.astype(np.int64), axis=0))
        # inverse reconstructs every original row exactly
        np.testing.assert_array_equal(uniq[inv], rows)
        assert inv.ndim == 1 and len(inv) == len(rows)
        # same clustering as numpy's inverse (identical partition)
        want_inv = want_inv.ravel()
        remap = {}
        for a, b in zip(inv.tolist(), want_inv.tolist()):
            assert remap.setdefault(a, b) == b


def test_grid_sampling_last_mode(rng):
    s = make_sample(rng, n=4000, with_x=True)
    out = T.GridSampling3D(size=1.0, quantize_coords=True, mode="last")(rng, s)
    coords = out["coords"]
    assert coords.dtype == np.int32
    # one representative per voxel
    assert len(np.unique(coords, axis=0)) == len(coords)
    # representative's rounded pos matches its coords
    np.testing.assert_array_equal(np.round(out["pos"]).astype(np.int32), coords)
    # per-sample keys untouched
    assert out["y_reg"].shape == (2,)


def test_grid_sampling_mean_mode(rng):
    pos = np.array([[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [5.0, 5.0, 5.0]],
                   dtype=np.float32)
    s = {"pos": pos, "x": np.array([[1.0], [3.0], [10.0]], np.float32),
         "y": np.array([1, 1, 2])}
    out = T.GridSampling3D(size=1.0, mode="mean")(rng, s)
    assert out["pos"].shape[0] == 2
    order = np.argsort(out["pos"][:, 0])
    np.testing.assert_allclose(out["x"][order][0], [2.0])  # mean of 1,3
    assert out["y"][order][0] == 1  # majority vote


def test_random_coords_flip(rng):
    coords = np.array([[0, 1, 2], [3, 4, 5]], dtype=np.int32)
    s = {"pos": np.zeros((2, 3), np.float32), "coords": coords.copy()}
    out = T.RandomCoordsFlip(ignored_axis="z", p=1.0)(rng, s)
    np.testing.assert_array_equal(out["coords"][:, 0], [3, 0])  # max 3 - [0,3]
    np.testing.assert_array_equal(out["coords"][:, 1], [3, 0])  # max 4 - [1,4]
    np.testing.assert_array_equal(out["coords"][:, 2], [2, 5])  # z ignored


def test_shift_voxels(rng):
    coords = np.zeros((4, 3), dtype=np.int32)
    s = {"pos": np.zeros((4, 3), np.float32), "coords": coords}
    out = T.ShiftVoxels(p=1.0)(rng, s)
    shift = out["coords"][0]
    assert ((0 <= shift) & (shift < 100)).all()
    assert (out["coords"] == shift).all()


def test_feature_pipeline_builds_x(rng):
    s = make_sample(rng)
    pipeline = T.Compose([
        T.XYZFeature(add_z=True),
        T.AddOnes(),
        T.AddXYDistanceToCenter(center_x=0.5, center_y=0.5),
        T.AddFeatsByKeys(list_add_to_x=[True, True, True],
                         feat_names=["ones", "pos_z", "xy_distance"],
                         delete_feats=[True, True, True],
                         input_nc_feats=[1, 1, 1]),
    ])
    out = pipeline(rng, s)
    assert out["x"].shape == (1000, 3)
    np.testing.assert_allclose(out["x"][:, 0], 1.0)
    np.testing.assert_allclose(out["x"][:, 1], out["pos"][:, 2], rtol=1e-6)
    assert "ones" not in out and "pos_z" not in out


def test_classification_filter(rng):
    s = {"pos": np.zeros((6, 3), np.float32),
         "x": np.array([[2, 1], [2, 2], [1, 3], [2, 4], [3, 5], [2, 6]],
                       np.float32)}
    out = T.ClassificationFilter(feature_index=0, class_indices=[2], keep=False)(rng, s)
    assert out["pos"].shape[0] == 2
    np.testing.assert_array_equal(out["x"][:, 0], [3, 5])  # class col removed


def test_instantiate_from_config(rng):
    cfg = [
        {"transform": "ScalePos",
         "params": {"scale_x": 30, "scale_y": 30, "scale_z": 40, "op": "div"}},
        {"transform": "MoveCenterPosPerSample",
         "params": {"center_x": 0.5, "center_y": 0.5}},
        {"transform": "StartZFromZero"},
        {"transform": "MaxPoints", "params": {"num": 16000}},
    ]
    pipeline = T.instantiate_transforms(cfg)
    assert len(pipeline.transforms) == 4
    out = pipeline(rng, make_sample(rng))
    assert out["pos"][:, 2].min() == pytest.approx(0.0, abs=1e-6)


def test_full_sparse_xy_style_pipeline_shapes(rng):
    """End-to-end: the sparse_xy train preset shape contract."""
    s = make_sample(rng, n=20000)
    pipeline = T.Compose([
        T.RandomGroundRemoval(min_v=0.05, max_v=0.5, p=0.1, min_points=500,
                              skip_list=SKIP),
        T.RandomDropout(0.2, 0.5, min_points=500, skip_list=SKIP),
        T.ScalePos(scale_x=30, scale_y=30, scale_z=40, op="div"),
        T.RandomNoise(sigma=0.0025),
        T.Random3AxisRotation(rot_x=0, rot_y=0, rot_z=180),
        T.RandomShiftPos(max_x=0.01, max_y=0.01, max_z=0.0, p=0.5),
        T.MoveCenterPosPerSample(center_x=0.5, center_y=0.5),
        T.StartZFromZero(),
        T.AddRandomPoints(12000, 0.01, 0.2, p=0.25),
        T.CopyJitterRandomPoints(12000, 0.01, 0.2, p=0.25, sigma=0.005, clip=0.015),
        T.RandomPolygon2dExtend(polygons=[HEXAGON], rotate=180, skip_list=SKIP),
        T.MaxPoints(16000, skip_list=SKIP),
        T.MinPoints(500, skip_list=SKIP),
        T.XYZFeature(add_z=True),
        T.AddOnes(),
        T.AddXYDistanceToCenter(center_x=0.5, center_y=0.5),
        T.AddFeatsByKeys([True, True, True], ["ones", "pos_z", "xy_distance"],
                         delete_feats=[True, True, True]),
        T.GridSampling3D(size=0.0125, quantize_coords=True, mode="last"),
        T.RandomCoordsFlip(ignored_axis="z", p=0.5),
        T.ShiftVoxels(),
    ])
    out = pipeline(rng, s)
    n = out["pos"].shape[0]
    assert 1 <= n <= 16000
    assert out["x"].shape == (n, 3)
    assert out["coords"].shape == (n, 3) and out["coords"].dtype == np.int32
    assert out["y_reg"].shape == (2,)
    # coords should be small ints (plot is ~unit box / 0.0125 + shift < 100)
    assert out["coords"].min() >= -10
    assert out["coords"].max() < 300


def test_determinism_same_key(rng):
    s = make_sample(rng, n=3000)
    pipe = T.Compose([T.RandomNoise(sigma=0.01),
                      T.Random3AxisRotation(rot_x=0, rot_y=0, rot_z=180),
                      T.MaxPoints(1000, skip_list=SKIP)])
    o1 = pipe(np.random.default_rng(123), dict(s))
    o2 = pipe(np.random.default_rng(123), dict(s))
    np.testing.assert_array_equal(o1["pos"], o2["pos"])


class TestFeatureAugment:
    def test_jitter_and_dropfeature(self, rng):
        from dpcr_agb_tpu.transforms import DropFeature, Jitter
        s = {"x": np.ones((20, 3), np.float32),
             "rgb": np.full((20, 3), 0.5, np.float32)}
        out = Jitter(sigma=0.1, p=1.0)(rng, s)
        assert not np.allclose(out["x"], s["x"])
        out = DropFeature(drop_proba=1.0, feature_name="rgb")(rng, s)
        assert (out["rgb"] == 0).all()
        out = DropFeature(drop_proba=0.0, feature_name="rgb")(rng, s)
        assert (out["rgb"] == 0.5).all()

    def test_chromatic_pipeline(self, rng):
        from dpcr_agb_tpu.transforms import (ChromaticAutoContrast,
                                             ChromaticJitter,
                                             ChromaticTranslation,
                                             NormalizeRGB)
        s = {"rgb": rng.integers(0, 256, (30, 3)).astype(np.float32)}
        s = NormalizeRGB()(rng, s)
        assert s["rgb"].max() <= 1.0 and s["rgb"].min() >= 0.0
        for t in (ChromaticTranslation(), ChromaticJitter(),
                  ChromaticAutoContrast()):
            for _ in range(10):  # hit the probabilistic branches
                s2 = t(rng, s)
                assert s2["rgb"].shape == s["rgb"].shape
                assert s2["rgb"].min() >= -1e-6

    def test_running_stats_and_time_func(self):
        from dpcr_agb_tpu.utils.timer import RunningStats, time_func
        rs = RunningStats()
        xs = [1.0, 2.0, 3.0, 4.0]
        for v in xs:
            rs.push(v)
        assert abs(rs.mean() - np.mean(xs)) < 1e-12
        assert abs(rs.variance() - np.var(xs, ddof=1)) < 1e-12

        @time_func
        def f(a):
            return a + 1

        assert f(1) == 2 and f.stats.n == 1


def test_optics_z_outlier_removal(rng):
    z = np.concatenate([rng.random(1000) * 10, [50.0, 60.0, -40.0]])
    s = {"pos": np.stack([rng.random(1003), rng.random(1003), z],
                         1).astype(np.float32)}
    out = T.OPTICSZOutlierRemoval(eps=1.5, min_samples=10)(rng, s)
    assert out["pos"].shape[0] == 1000
    assert out["pos"][:, 2].max() < 11


def test_normal_feature_concats_and_raises(rng):
    n = 20
    s = {"pos": rng.random((n, 3)).astype(np.float32),
         "norm": rng.random((n, 3)).astype(np.float32),
         "x": np.ones((n, 2), np.float32)}
    out = T.NormalFeature()(rng, s)
    assert out["x"].shape == (n, 5)
    np.testing.assert_array_equal(out["x"][:, 2:], s["norm"])
    with pytest.raises(NotImplementedError):
        T.NormalFeature()(rng, {"pos": s["pos"]})


def test_pca_compute_plane_normal(rng):
    # points on the z=0 plane: smallest eigenvalue ~0, its eigenvector ~ +-z
    n = 500
    pos = np.stack([rng.random(n), rng.random(n), np.zeros(n)],
                   1).astype(np.float32)
    out = T.PCACompute()(rng, {"pos": pos})
    eig, v = out["eigenvalues"], out["eigenvectors"]
    assert eig[0] <= eig[1] <= eig[2]
    assert eig[0] < 1e-6
    np.testing.assert_allclose(np.abs(v[:, 0]), [0, 0, 1], atol=1e-5)
