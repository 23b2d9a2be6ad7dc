"""Native (C++) host ops vs numpy/sklearn oracles."""
import numpy as np
import pytest

from dpcr_agb_tpu import native


def test_builds_and_loads():
    assert native.is_available(), "g++ build of native/pointops.cpp failed"


def test_grid_subsample_matches_numpy(rng):
    pts = rng.uniform(0, 10, size=(500, 3)).astype(np.float32)
    feats = rng.normal(size=(500, 4)).astype(np.float32)
    out_p, out_f = native.grid_subsample(pts, 1.0, feats)
    # oracle: barycenter per occupied cell
    cells = np.floor(pts / 1.0).astype(np.int64)
    uniq = {tuple(c) for c in cells}
    assert len(out_p) == len(uniq)
    got = {tuple(np.floor(p / 1.0).astype(int)): (p, f)
           for p, f in zip(out_p, out_f)}
    for c in uniq:
        m = (cells == np.array(c)).all(axis=1)
        np.testing.assert_allclose(got[c][0], pts[m].mean(0), rtol=1e-4)
        np.testing.assert_allclose(got[c][1], feats[m].mean(0), rtol=1e-3,
                                   atol=1e-4)


def test_radius_neighbors_matches_bruteforce(rng):
    q = rng.uniform(0, 2, size=(60, 3)).astype(np.float32)
    s = rng.uniform(0, 2, size=(80, 3)).astype(np.float32)
    r, k = 0.4, 7
    out = native.radius_neighbors(q, s, r, k)
    assert out.shape == (60, k)
    for i in range(60):
        d = np.linalg.norm(s - q[i], axis=1)
        want = [j for j in np.argsort(d, kind="stable") if d[j] < r][:k]
        got = [j for j in out[i] if j < 80]
        # same set, ascending distance (ties may reorder)
        assert sorted(got) == sorted(want)
        dd = d[got]
        assert (np.diff(dd) >= -1e-6).all()
        assert (out[i, len(got):] == 80).all()


def test_radius_neighbors_tolerates_nonfinite(rng):
    """NaN/inf coords (corrupt LAS rows, augmentation overflow) must not
    corrupt the flat-grid counting sort: non-finite supports are never
    neighbors, non-finite queries get all-shadow rows."""
    s = rng.normal(size=(500, 3)).astype(np.float32)
    s[7] = np.nan
    s[13, 1] = np.inf
    s[21] = -np.inf
    q = s.copy()
    q[3] = np.nan
    out = native.radius_neighbors(q, s, 0.5, 16)
    assert out.shape == (500, 16)
    assert (out[3] == 500).all()  # NaN query -> shadow row
    bad = {7, 13, 21}
    assert not bad & set(out[out < 500].tolist())
    d2 = ((q[:50, None, :] - s[None, :, :]) ** 2).sum(-1)
    for i in range(50):
        if not np.isfinite(q[i]).all():
            continue
        want = {j for j in np.where(d2[i] < 0.25)[0] if j not in bad}
        got = set(out[i][out[i] < 500].tolist())
        assert got == set(sorted(want, key=lambda j: d2[i][j])[:16])
    # all supports non-finite: every row is shadow
    s2 = np.full((10, 3), np.nan, np.float32)
    out2 = native.radius_neighbors(q[:5], s2, 0.5, 4)
    assert (out2 == 10).all()


def test_radius_query_2d(rng):
    pts = rng.uniform(-20, 20, size=(300, 2)).astype(np.float32)
    idx = native.radius_query_2d(pts, 1.0, -2.0, 5.0)
    d2 = (pts[:, 0] - 1.0) ** 2 + (pts[:, 1] + 2.0) ** 2
    np.testing.assert_array_equal(np.sort(idx), np.flatnonzero(d2 <= 25.0))
