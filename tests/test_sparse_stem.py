"""Parity: sparse level-0 stem/pool (ops/sparse_stem.py) vs the dense-grid
execution (ops/dense_grid.py) they replace. Semantics under test are the
MinkowskiEngine stem behaviors the dense path already oracle-matches
(reference SENet.py:14-118 stem + MinkowskiMaxPooling)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpcr_agb_tpu.ops.dense_grid import (dense_conv, dense_max_pool,
                                         gather_from_dense, occupancy_pool,
                                         scatter_to_dense)
from dpcr_agb_tpu.ops.sparse_stem import (pool_neighbor_map,
                                          stem_conv_sparse)
from dpcr_agb_tpu.ops.voxel import (build_grid, downsample, max_pool_apply)


def _random_sites(rng, dims, n_occ, v_cap):
    d, h, w = dims
    flat = rng.choice(d * h * w, size=n_occ, replace=False)
    coords = np.stack([flat // (h * w), (flat // w) % h, flat % w], 1)
    out = np.zeros((v_cap, 3), np.int32)
    out[:n_occ] = coords
    mask = np.arange(v_cap) < n_occ
    # park invalid rows at a coord that's also occupied sometimes (row 0)
    out[~mask] = coords[0]
    return jnp.asarray(out), jnp.asarray(mask)


@pytest.mark.parametrize("k,cin,cout", [(7, 3, 16), (3, 4, 8), (5, 1, 4)])
def test_sparse_stem_matches_dense_conv(k, cin, cout):
    rng = np.random.default_rng(0)
    dims = (12, 11, 9)
    coords, mask = _random_sites(rng, dims, 37, 48)
    feats = jnp.asarray(rng.normal(size=(48, cin)), jnp.float32)
    feats = jnp.where(mask[:, None], feats, 0.0)
    w = jnp.asarray(rng.normal(size=(k ** 3, cin, cout)) * 0.1, jnp.float32)

    dense, occ = scatter_to_dense(coords, mask, feats, dims)
    y_dense = dense_conv(dense[None], occ[None], w, k)[0]
    want = gather_from_dense(y_dense, coords, mask)

    got = stem_conv_sparse(coords, mask, feats, dims, w, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_scatter_flags_mode_matches_legacy(monkeypatch):
    """DPCR_SCATTER=flags (unique-rows lax.scatter, per-sample dump
    region) is bit-identical to the legacy .at[].add scatter on unique
    voxel coords — incl. masked-in out-of-bounds rows (dropped by both)
    and its gradient (the gather VJP is flag-independent)."""
    from dpcr_agb_tpu.ops import sparse_stem
    from dpcr_agb_tpu.ops.sparse_stem import _scatter_to_dense_impl
    rng = np.random.default_rng(11)
    dims = (12, 11, 9)
    cs, ms = zip(*[_random_sites(np.random.default_rng(20 + i), dims,
                                 17 + 9 * i, 40) for i in range(3)])
    coords, mask = jnp.stack(cs), jnp.stack(ms)
    coords = coords.at[0, 3].set(jnp.asarray([12, 0, -4]))  # OOB, masked-in
    feats = jnp.asarray(rng.normal(size=(3, 40, 6)), jnp.float32)
    feats = jnp.where(mask[..., None], feats, 0.0)

    def run(f):
        return _scatter_to_dense_impl(coords, mask, f, dims)

    monkeypatch.setattr(sparse_stem, "SCATTER_MODE", "legacy")
    want, occ_want = run(feats)
    ct = jnp.asarray(rng.normal(size=want.shape), jnp.float32)
    g_want = jax.grad(lambda f: jnp.sum(run(f)[0] * ct))(feats)
    monkeypatch.setattr(sparse_stem, "SCATTER_MODE", "flags")
    got, occ_got = run(feats)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(occ_got), np.asarray(occ_want))
    g_got = jax.grad(lambda f: jnp.sum(run(f)[0] * ct))(feats)
    np.testing.assert_array_equal(np.asarray(g_got), np.asarray(g_want))


def test_scatter_sorted_mode_matches_legacy(monkeypatch):
    """DPCR_SCATTER=sorted (indices_are_sorted + unique) matches legacy on
    contract-conforming input: valid rows sorted by flat key, in-volume,
    unique, padding at the tail (data/batch.normalize_sparse_rows)."""
    from dpcr_agb_tpu.ops import sparse_stem
    from dpcr_agb_tpu.ops.sparse_stem import _scatter_to_dense_impl
    rng = np.random.default_rng(13)
    dims = (12, 11, 9)
    cs, ms = [], []
    for i in range(3):
        c, m = _random_sites(np.random.default_rng(30 + i), dims,
                             17 + 9 * i, 40)
        c_np, m_np = np.asarray(c).astype(np.int64), np.asarray(m)
        key = (c_np[:, 0] * 11 + c_np[:, 1]) * 9 + c_np[:, 2]
        key[~m_np] = np.iinfo(np.int64).max
        order = np.argsort(key, kind="stable")
        cs.append(c_np[order]), ms.append(m_np[order])
    coords, mask = jnp.asarray(np.stack(cs)), jnp.asarray(np.stack(ms))
    feats = jnp.asarray(rng.normal(size=(3, 40, 6)), jnp.float32)
    feats = jnp.where(mask[..., None], feats, 0.0)

    def run(f):
        return _scatter_to_dense_impl(coords, mask, f, dims)

    monkeypatch.setattr(sparse_stem, "SCATTER_MODE", "legacy")
    want, occ_want = run(feats)
    ct = jnp.asarray(rng.normal(size=want.shape), jnp.float32)
    g_want = jax.grad(lambda f: jnp.sum(run(f)[0] * ct))(feats)
    monkeypatch.setattr(sparse_stem, "SCATTER_MODE", "sorted")
    got, occ_got = run(feats)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(occ_got), np.asarray(occ_want))
    g_got = jax.grad(lambda f: jnp.sum(run(f)[0] * ct))(feats)
    np.testing.assert_array_equal(np.asarray(g_got), np.asarray(g_want))


@pytest.mark.slow
@pytest.mark.parametrize("k,cin,cout", [(7, 3, 16), (3, 4, 8)])
def test_conv2d_stem_matches_grouped(monkeypatch, k, cin, cout):
    """DPCR_STEM=conv2d (z-fold + XLA conv2d over (x,y) + row gather)
    matches the grouped core everywhere incl. the clip contract for a
    masked-in out-of-bounds coord, and the dense conv oracle at in-bounds
    sites; BATCH_LOCAL covered; grad-wrt-weights parity at k=7."""
    from dpcr_agb_tpu.ops import layout, sparse_stem
    from dpcr_agb_tpu.ops.sparse_stem import stem_conv_sparse_batch
    rng = np.random.default_rng(5)
    dims = (12, 11, 9)
    cs, ms, fs = [], [], []
    for bi, n_occ in ((0, 37), (1, 14), (2, 48)):
        c_, m_ = _random_sites(np.random.default_rng(50 + bi), dims, n_occ,
                               48)
        f_ = jnp.asarray(rng.normal(size=(48, cin)), jnp.float32)
        cs.append(c_), ms.append(m_), fs.append(jnp.where(m_[:, None], f_, 0))
    coords, mask = jnp.stack(cs), jnp.stack(ms)
    coords = coords.at[1, 0].set(jnp.asarray([-1, dims[1] + 2, 0]))
    feats = jnp.stack(fs)
    w = jnp.asarray(rng.normal(size=(k ** 3, cin, cout)) * 0.1, jnp.float32)

    def dense_ref(c, m, f):
        dense, occ = scatter_to_dense(c, m, f, dims)
        y = dense_conv(dense[None], occ[None], w, k)[0]
        return gather_from_dense(y, c, m)
    want = np.asarray(jax.vmap(dense_ref)(coords, mask, feats))
    want_grouped = np.asarray(
        stem_conv_sparse_batch(coords, mask, feats, dims, w, k))
    in_bounds = np.asarray(jnp.all(
        (coords >= 0) & (coords < jnp.asarray(dims)), axis=-1))

    monkeypatch.setattr(sparse_stem, "STEM_MODE", "conv2d")
    for batch_local in (False, True):
        monkeypatch.setattr(layout, "BATCH_LOCAL", batch_local)
        got = np.asarray(
            stem_conv_sparse_batch(coords, mask, feats, dims, w, k))
        np.testing.assert_allclose(got[in_bounds], want[in_bounds],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got, want_grouped, rtol=1e-5, atol=1e-5)

    if k == 7:
        monkeypatch.setattr(layout, "BATCH_LOCAL", False)

        def loss(wi):
            y = stem_conv_sparse_batch(coords, mask, feats, dims, wi, k)
            return jnp.sum(y ** 2)
        g_c = jax.grad(loss)(w)
        monkeypatch.setattr(sparse_stem, "STEM_MODE", "grouped")
        g_g = jax.grad(loss)(w)
        np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_g),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,cin,cout", [(7, 3, 16), (3, 4, 8)])
def test_xminor_stem_matches_dense_conv(monkeypatch, k, cin, cout):
    """DPCR_STEM=xminor (2-wide-row gather + shift-lane matmul) matches the
    grouped core EXACTLY everywhere (same clip contract for a masked-in
    out-of-bounds coord — both return the conv at the clipped site, which
    the loader precludes by voxelizing into dims) and the dense conv
    oracle at in-bounds sites; batched samples of different occupancy and
    BATCH_LOCAL covered."""
    from dpcr_agb_tpu.ops import layout, sparse_stem
    from dpcr_agb_tpu.ops.sparse_stem import stem_conv_sparse_batch
    rng = np.random.default_rng(5)
    dims = (12, 11, 9)
    cs, ms, fs = [], [], []
    for bi, n_occ in ((0, 37), (1, 14), (2, 48)):
        c_, m_ = _random_sites(np.random.default_rng(50 + bi), dims, n_occ,
                               48)
        f_ = jnp.asarray(rng.normal(size=(48, cin)), jnp.float32)
        cs.append(c_), ms.append(m_), fs.append(jnp.where(m_[:, None], f_, 0))
    coords, mask = jnp.stack(cs), jnp.stack(ms)
    coords = coords.at[1, 0].set(jnp.asarray([-1, dims[1] + 2, 0]))
    feats = jnp.stack(fs)
    w = jnp.asarray(rng.normal(size=(k ** 3, cin, cout)) * 0.1, jnp.float32)

    def dense_ref(c, m, f):
        dense, occ = scatter_to_dense(c, m, f, dims)
        y = dense_conv(dense[None], occ[None], w, k)[0]
        return gather_from_dense(y, c, m)
    want = np.asarray(jax.vmap(dense_ref)(coords, mask, feats))
    want_grouped = np.asarray(
        stem_conv_sparse_batch(coords, mask, feats, dims, w, k))
    in_bounds = np.asarray(jnp.all(
        (coords >= 0) & (coords < jnp.asarray(dims)), axis=-1))

    monkeypatch.setattr(sparse_stem, "STEM_MODE", "xminor")
    for batch_local in (False, True):
        monkeypatch.setattr(layout, "BATCH_LOCAL", batch_local)
        got = np.asarray(
            stem_conv_sparse_batch(coords, mask, feats, dims, w, k))
        np.testing.assert_allclose(got[in_bounds], want[in_bounds],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(got, want_grouped, rtol=1e-5, atol=1e-5)

    # grad wrt weights matches the grouped path's (production k only —
    # two extra backward compiles per case)
    if k == 7:
        monkeypatch.setattr(layout, "BATCH_LOCAL", False)

        def loss(wi):
            y = stem_conv_sparse_batch(coords, mask, feats, dims, wi, k)
            return jnp.sum(y ** 2)
        g_x = jax.grad(loss)(w)
        monkeypatch.setattr(sparse_stem, "STEM_MODE", "grouped")
        g_g = jax.grad(loss)(w)
        np.testing.assert_allclose(np.asarray(g_x), np.asarray(g_g),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_xminor_falls_back_when_fold_budget_blocks_gk(monkeypatch):
    """When the g=k fold does not fit the HBM budget (huge batch), the
    xminor dispatch degrades to the grouped core instead of OOMing."""
    from dpcr_agb_tpu.ops import sparse_stem
    from dpcr_agb_tpu.ops.sparse_stem import stem_conv_sparse_batch
    rng = np.random.default_rng(6)
    dims = (12, 11, 9)
    c_, m_ = _random_sites(rng, dims, 20, 32)
    feats = jnp.asarray(rng.normal(size=(1, 32, 3)), jnp.float32)
    feats = jnp.where(m_[None, :, None], feats, 0.0)
    w = jnp.asarray(rng.normal(size=(343, 3, 4)) * 0.1, jnp.float32)
    monkeypatch.setattr(sparse_stem, "STEM_MODE", "xminor")
    want = stem_conv_sparse_batch(c_[None], m_[None], feats, dims, w, 7)
    # budget admitting only g=1: dispatch must pick the grouped core
    monkeypatch.setattr(sparse_stem, "FOLD_BYTES_BUDGET",
                        12 * 17 * 9 * 1 * 7 * 3 * 4 + 1)
    got = stem_conv_sparse_batch(c_[None], m_[None], feats, dims, w, 7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_sparse_stem_bf16_close():
    rng = np.random.default_rng(1)
    dims = (10, 10, 8)
    coords, mask = _random_sites(rng, dims, 25, 32)
    feats = jnp.asarray(rng.normal(size=(32, 3)), jnp.bfloat16)
    feats = jnp.where(mask[:, None], feats, 0)
    w = jnp.asarray(rng.normal(size=(343, 3, 8)) * 0.1, jnp.bfloat16)
    dense, occ = scatter_to_dense(coords, mask, feats, dims)
    want = gather_from_dense(
        dense_conv(dense[None], occ[None], w, 7,
                   compute_dtype=jnp.bfloat16)[0], coords, mask)
    got = stem_conv_sparse(coords, mask, feats, dims, w, 7,
                           compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.slow  # rows-mode pool is opt-in
def test_sparse_pool_matches_dense_max_pool():
    rng = np.random.default_rng(2)
    dims = (12, 10, 8)
    coords, mask = _random_sites(rng, dims, 41, 64)
    feats = jnp.asarray(rng.normal(size=(64, 6)), jnp.float32)
    feats = jnp.where(mask[:, None], feats, 0.0)

    # dense reference
    dense, occ = scatter_to_dense(coords, mask, feats, dims)
    occ1 = occupancy_pool(occ[None])[0]
    pooled_dense = dense_max_pool(dense[None], occ[None], occ1[None])[0]

    # sparse: L1 grid from downsample, then the gathered-row pool
    grid0 = build_grid(coords, mask)
    grid1, _ = downsample(grid0, None, 2, 64)
    nbr = pool_neighbor_map(coords, mask, grid1.coords, grid1.mask, dims)
    got = max_pool_apply(feats, nbr, grid1.mask)

    d1 = tuple(-(-x // 2) for x in dims)
    want = gather_from_dense(pooled_dense, grid1.coords, grid1.mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    # L1 occupancy parity: every occupied L1 site in the dense volume is a
    # row in grid1 and vice versa
    assert int(grid1.mask.sum()) == int(occ1.sum())


@pytest.mark.slow  # rows-mode pool is opt-in
def test_pool_neighbor_map_drops_oob():
    """An out-of-bounds L0 coord that is masked IN must never appear in
    any pool window (scatter_to_dense_batch drop semantics; rows mode)."""
    from dpcr_agb_tpu.ops.sparse_stem import pool_neighbor_map_batch
    rng = np.random.default_rng(41)
    dims = (10, 10, 8)
    coords, mask = _random_sites(rng, dims, 30, 40)
    oob_row = 3
    coords = coords.at[oob_row].set(jnp.asarray([dims[0] + 1, 0, 0]))
    # L1 grid covering everything
    d1 = tuple(-(-x // 2) for x in dims)
    g1 = np.stack(np.meshgrid(*[np.arange(x) for x in d1],
                              indexing="ij"), -1).reshape(-1, 3)
    c1 = jnp.asarray(g1, jnp.int32)
    m1 = jnp.ones((len(g1),), bool)
    nbr = pool_neighbor_map_batch(coords[None], mask[None], c1[None],
                                  m1[None], dims)[0]
    assert not np.any(np.asarray(nbr) == oob_row)


def test_fold_chunks_match_unchunked(monkeypatch):
    """DPCR_FOLD_CHUNKS=2 (lax.map over batch halves) is exact vs the
    unchunked batch form, values and dW."""
    from dpcr_agb_tpu.ops import sparse_stem
    rng = np.random.default_rng(17)
    dims = (10, 9, 8)
    cs, ms = zip(*[_random_sites(np.random.default_rng(60 + i), dims, 29, 40)
                   for i in range(4)])
    coords, mask = jnp.stack(cs), jnp.stack(ms)
    feats = jnp.asarray(rng.normal(size=(4, 40, 3)), jnp.float32)
    feats = jnp.where(mask[..., None], feats, 0.0)
    w = jnp.asarray(rng.normal(size=(343, 3, 6)) * 0.1, jnp.float32)
    ct = jnp.asarray(rng.normal(size=(4, 40, 6)), jnp.float32)

    def loss(wi):
        y = sparse_stem.stem_conv_sparse_batch(coords, mask, feats, dims,
                                               wi, 7)
        return jnp.sum(y * ct), y

    (l1, y1), g1 = jax.value_and_grad(loss, has_aux=True)(w)
    monkeypatch.setattr(sparse_stem, "FOLD_CHUNKS", 2)
    (l2, y2), g2 = jax.value_and_grad(loss, has_aux=True)(w)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_scatter_max_pool_matches_dense():
    """scatter_max_pool_batch == scatter-to-dense + occupancy_pool +
    dense_max_pool: full L1 volumes (values, zeros at unoccupied sites)
    and occupancy, plus gradient parity through both formulations."""
    from dpcr_agb_tpu.ops.sparse_stem import scatter_max_pool_batch
    rng = np.random.default_rng(5)
    dims = (11, 10, 9)
    cs, ms, fs = [], [], []
    for b, n_occ in ((0, 47), (1, 21), (2, 64)):
        c_, m_ = _random_sites(np.random.default_rng(50 + b), dims, n_occ, 64)
        cs.append(c_), ms.append(m_)
        f_ = jnp.asarray(rng.normal(size=(64, 6)), jnp.float32)
        fs.append(jnp.where(m_[:, None], f_, 0.0))
    coords, mask = jnp.stack(cs), jnp.stack(ms)
    # an out-of-bounds coord that is masked IN: both formulations must
    # drop it (scatter_to_dense_batch semantics)
    coords = coords.at[0, 0].set(jnp.asarray([dims[0] + 3, -2, 1]))
    feats = jnp.stack(fs)

    def dense_ref(f):
        dense, occ = jax.vmap(
            lambda c, m, x: scatter_to_dense(c, m, x, dims))(coords, mask, f)
        occ1 = occupancy_pool(occ)
        return dense_max_pool(dense, occ, occ1), occ1

    def sparse(f):
        return scatter_max_pool_batch(coords, mask, f, dims)

    want, occ_want = dense_ref(feats)
    got, occ_got = sparse(feats)
    np.testing.assert_array_equal(np.asarray(occ_got > 0),
                                  np.asarray(occ_want > 0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)

    ct = jnp.asarray(rng.normal(size=want.shape), jnp.float32)
    g_want = jax.grad(lambda f: jnp.sum(dense_ref(f)[0] * ct))(feats)
    g_got = jax.grad(lambda f: jnp.sum(sparse(f)[0] * ct))(feats)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("fwd_mode,bwd_gather", [
    # fast gate: the two production defaults (dense fwd; slots8 bwd at
    # b<=16, cube at b>16). Non-default fwd flavors run in the slow gate.
    ("dense", "slots8"),
    pytest.param("separable", "slots8", marks=pytest.mark.slow),
    pytest.param("scattermax", "slots8", marks=pytest.mark.slow),
    ("dense", "cube"),
    pytest.param("scattermax", "cube", marks=pytest.mark.slow)])
def test_pooled_rows_fused_matches_dense(monkeypatch, fwd_mode, bwd_gather):
    """pooled_rows_fused forward is value-identical to scatter-to-dense +
    occupancy_pool + dense_max_pool under all three DPCR_POOL_FWD flavors
    (occupancy compared as >0 — scattermax reports binary occupancy where
    occupancy_pool reports the window max count), and its row-space custom
    backward matches the select_and_scatter gradient exactly when window
    values are distinct (random normals — ties are measure-zero; the tie
    contract is documented on the op) under both DPCR_POOL_BWD_GATHER
    forms (8 narrow rows / one overlap-folded cube row). Checked flat and
    BATCH_LOCAL."""
    from dpcr_agb_tpu.ops import dense_grid, layout, sparse_stem
    from dpcr_agb_tpu.ops.sparse_stem import pooled_rows_fused
    monkeypatch.setattr(dense_grid, "POOL_FWD_MODE", fwd_mode)
    monkeypatch.setattr(sparse_stem, "POOL_BWD_GATHER", bwd_gather)
    rng = np.random.default_rng(7)
    dims = (11, 10, 9)
    cs, ms, fs = [], [], []
    for b, n_occ in ((0, 47), (1, 21), (2, 64)):
        c_, m_ = _random_sites(np.random.default_rng(70 + b), dims, n_occ, 64)
        cs.append(c_), ms.append(m_)
        f_ = jnp.asarray(rng.normal(size=(64, 6)), jnp.float32)
        fs.append(jnp.where(m_[:, None], f_, 0.0))
    coords, mask = jnp.stack(cs), jnp.stack(ms)
    # masked-in out-of-bounds coord: both formulations must drop it
    coords = coords.at[0, 0].set(jnp.asarray([dims[0] + 3, -2, 1]))
    feats = jnp.stack(fs)

    def dense_ref(f):
        dense, occ = jax.vmap(
            lambda c, m, x: scatter_to_dense(c, m, x, dims))(coords, mask, f)
        occ1 = occupancy_pool(occ)
        return dense_max_pool(dense, occ, occ1), occ1

    want, occ_want = dense_ref(feats)
    ct = jnp.asarray(rng.normal(size=want.shape), jnp.float32)
    g_want = jax.grad(lambda f: jnp.sum(dense_ref(f)[0] * ct))(feats)

    for batch_local in (False, True):
        monkeypatch.setattr(layout, "BATCH_LOCAL", batch_local)
        got, occ_got = pooled_rows_fused(coords, mask, feats, dims)
        np.testing.assert_array_equal(np.asarray(occ_got) > 0,
                                      np.asarray(occ_want) > 0)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        g_got = jax.grad(
            lambda f: jnp.sum(pooled_rows_fused(coords, mask, f, dims)[0]
                              * ct))(feats)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("force", [
    "chunks", pytest.param("budget", marks=pytest.mark.slow)])
def test_pool_bwd_chunked_matches_unchunked(monkeypatch, force):
    """The memory-aware chunked pool backward (lax.map over batch
    sub-chunks — the round-4 fix for the bs32/NFI-dims HBM OOM,
    docs/experiments/round3/sweep7.log) is exact vs the unchunked cube
    path, forced both ways: an explicit DPCR_POOL_BWD_CHUNKS and a
    DPCR_POOL_BWD_BYTES budget small enough that the derived chunk count
    must exceed 1."""
    from dpcr_agb_tpu.ops import sparse_stem
    from dpcr_agb_tpu.ops.sparse_stem import pooled_rows_fused
    monkeypatch.setattr(sparse_stem, "POOL_BWD_GATHER", "cube")
    rng = np.random.default_rng(11)
    dims = (11, 10, 9)
    cs, ms, fs = [], [], []
    for b in range(4):
        c_, m_ = _random_sites(np.random.default_rng(90 + b), dims,
                               31 + 7 * b, 64)
        cs.append(c_), ms.append(m_)
        f_ = jnp.asarray(rng.normal(size=(64, 6)), jnp.float32)
        fs.append(jnp.where(m_[:, None], f_, 0.0))
    coords, mask, feats = jnp.stack(cs), jnp.stack(ms), jnp.stack(fs)

    want, _ = pooled_rows_fused(coords, mask, feats, dims)
    ct = jnp.asarray(rng.normal(size=want.shape), jnp.float32)

    def g(f):
        return jax.grad(
            lambda x: jnp.sum(pooled_rows_fused(coords, mask, x, dims)[0]
                              * ct))(f)

    g_unchunked = g(feats)
    if force == "chunks":
        monkeypatch.setattr(sparse_stem, "POOL_BWD_CHUNKS", 2)
    else:
        # budget below one chunk's 2x cube-table peak -> derived chunks>1
        d1, h1, w1 = (-(-dims[0] // 2), -(-dims[1] // 2), -(-dims[2] // 2))
        peak = 2 * 4 * d1 * h1 * w1 * 16 * 6 * 4
        monkeypatch.setattr(sparse_stem, "POOL_BWD_BYTES", peak // 2 + 1)
        assert sparse_stem._pool_bwd_chunk_count(4, peak) == 2
    got, _ = pooled_rows_fused(coords, mask, feats, dims)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_allclose(np.asarray(g(feats)),
                               np.asarray(g_unchunked),
                               rtol=1e-6, atol=1e-6)


def test_pool_fwd_chunked_matches_unchunked(monkeypatch):
    """The budget-chunked pool FORWARD (round-4 fix for the b=64 BN
    recalibration compile OOM: the full-res scatter table is b*(s+v)
    lane-padded rows of transient HBM) is exact vs the unchunked path —
    values, occupancy, and gradients — in both flat and BATCH_LOCAL
    layouts, with the chunk count derived from a forced small budget."""
    from dpcr_agb_tpu.ops import layout, sparse_stem
    from dpcr_agb_tpu.ops.sparse_stem import pooled_rows_fused
    rng = np.random.default_rng(13)
    dims = (11, 10, 9)
    cs, ms, fs = [], [], []
    for b in range(4):
        c_, m_ = _random_sites(np.random.default_rng(130 + b), dims,
                               29 + 5 * b, 64)
        cs.append(c_), ms.append(m_)
        f_ = jnp.asarray(rng.normal(size=(64, 6)), jnp.float32)
        fs.append(jnp.where(m_[:, None], f_, 0.0))
    coords, mask, feats = jnp.stack(cs), jnp.stack(ms), jnp.stack(fs)

    want, occ_want = pooled_rows_fused(coords, mask, feats, dims)
    ct = jnp.asarray(rng.normal(size=want.shape), jnp.float32)

    def g(f):
        return jax.grad(
            lambda x: jnp.sum(pooled_rows_fused(coords, mask, x, dims)[0]
                              * ct))(f)

    g_unchunked = g(feats)
    per = sparse_stem._pool_fwd_table_bytes(1, 64, dims, 6, 4)
    monkeypatch.setattr(sparse_stem, "POOL_FWD_BYTES", 2 * per + 1)
    assert sparse_stem._pool_fwd_chunk_count(4, 64, dims, 6, 4) == 2
    for batch_local in (False, True):
        monkeypatch.setattr(layout, "BATCH_LOCAL", batch_local)
        got, occ_got = pooled_rows_fused(coords, mask, feats, dims)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        np.testing.assert_array_equal(np.asarray(occ_got),
                                      np.asarray(occ_want))
        np.testing.assert_allclose(np.asarray(g(feats)),
                                   np.asarray(g_unchunked),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_pooled_rows_fused_whole_model(monkeypatch):
    """SENet14 with DPCR_SPARSE_POOL=fused matches the dense-pool sparse-L0
    execution (shared params): identical forward, matching param grads."""
    from dpcr_agb_tpu.models.minkowski import build_resnet
    from dpcr_agb_tpu.ops import dense_grid

    class _DS:
        num_reg_classes = 2
    net = build_resnet("SENet14", {
        "activation": "gelu", "first_stride": 1, "global_pool": "sum",
        "drop_path": 0.0,
        "extra_options": {"dense_dims": [16, 16, 16]}}, _DS(), None)
    rng = np.random.default_rng(33)
    b = TestWholeModelParity()._batch(rng)
    monkeypatch.setattr(dense_grid, "L0_MODE", "sparse")
    monkeypatch.setattr(dense_grid, "SPARSE_POOL_MODE", "dense")
    variables = net.init(jax.random.PRNGKey(0), b, train=False)
    out_dense = net.apply(variables, b, train=False)

    def loss(p, variables=variables):
        return jnp.sum(net.apply({**variables, "params": p}, b,
                                 train=False) ** 2)
    g_dense = jax.grad(loss)(variables["params"])

    monkeypatch.setattr(dense_grid, "SPARSE_POOL_MODE", "fused")
    out_fused = net.apply(variables, b, train=False)
    np.testing.assert_array_equal(np.asarray(out_fused), np.asarray(out_dense))
    g_fused = jax.grad(loss)(variables["params"])

    def _cmp(path, gd, gf):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gd), rtol=5e-3, atol=1e-4,
            err_msg=jax.tree_util.keystr(path))
    jax.tree_util.tree_map_with_path(_cmp, g_dense, g_fused)


@pytest.mark.slow
def test_scatter_max_pool_whole_model(monkeypatch):
    """SENet14 with DPCR_SPARSE_POOL=scattermax matches the dense-L0
    execution (shared params)."""
    from dpcr_agb_tpu.models.minkowski import build_resnet
    from dpcr_agb_tpu.ops import dense_grid

    class _DS:
        num_reg_classes = 2
    net = build_resnet("SENet14", {
        "activation": "gelu", "first_stride": 1, "global_pool": "sum",
        "drop_path": 0.0,
        "extra_options": {"dense_dims": [16, 16, 16]}}, _DS(), None)
    rng = np.random.default_rng(31)
    b = TestWholeModelParity()._batch(rng)
    monkeypatch.setattr(dense_grid, "L0_MODE", "dense")
    variables = net.init(jax.random.PRNGKey(0), b, train=False)
    out_dense = net.apply(variables, b, train=False)
    monkeypatch.setattr(dense_grid, "L0_MODE", "sparse")
    monkeypatch.setattr(dense_grid, "SPARSE_POOL_MODE", "scattermax")
    out_sm = net.apply(variables, b, train=False)
    np.testing.assert_allclose(np.asarray(out_sm), np.asarray(out_dense),
                               rtol=1e-4, atol=1e-4)

    def loss(p, variables=variables):
        return jnp.sum(net.apply({**variables, "params": p}, b,
                                 train=False) ** 2)
    g_sm = jax.grad(loss)(variables["params"])
    monkeypatch.setattr(dense_grid, "SPARSE_POOL_MODE", "dense")
    g_dense = jax.grad(loss)(variables["params"])

    def _cmp(path, gd, gs):
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gd), rtol=5e-3, atol=1e-4,
            err_msg=jax.tree_util.keystr(path))
    jax.tree_util.tree_map_with_path(_cmp, g_dense, g_sm)


@pytest.mark.slow
def test_sparse_stem_empty_sample():
    dims = (8, 8, 8)
    coords = jnp.zeros((16, 3), jnp.int32)
    mask = jnp.zeros((16,), bool)
    feats = jnp.zeros((16, 3), jnp.float32)
    w = jnp.asarray(np.random.default_rng(3).normal(size=(343, 3, 4)),
                    jnp.float32)
    y = stem_conv_sparse(coords, mask, feats, dims, w, 7)
    assert not np.any(np.asarray(y))
    grid0 = build_grid(coords, mask)
    grid1, _ = downsample(grid0, None, 2, 16)
    nbr = pool_neighbor_map(coords, mask, grid1.coords, grid1.mask, dims)
    pooled = max_pool_apply(feats, nbr, grid1.mask)
    assert not np.any(np.asarray(pooled))


def test_sparse_stem_grad_dw_matches_dense():
    """dW through the sparse patches == dW through the dense conv at
    occupied sites (the only sites whose cotangents are nonzero)."""
    rng = np.random.default_rng(4)
    dims = (9, 9, 7)
    coords, mask = _random_sites(rng, dims, 21, 32)
    feats = jnp.asarray(rng.normal(size=(32, 3)), jnp.float32)
    feats = jnp.where(mask[:, None], feats, 0.0)
    w = jnp.asarray(rng.normal(size=(27, 3, 5)) * 0.1, jnp.float32)
    ct = jnp.asarray(rng.normal(size=(32, 5)), jnp.float32)
    ct = jnp.where(mask[:, None], ct, 0.0)

    def loss_sparse(wi):
        return jnp.sum(stem_conv_sparse(coords, mask, feats, dims, wi, 3)
                       * ct)

    def loss_dense(wi):
        dense, occ = scatter_to_dense(coords, mask, feats, dims)
        y = dense_conv(dense[None], occ[None], wi, 3)[0]
        return jnp.sum(gather_from_dense(y, coords, mask) * ct)

    g_s = jax.grad(loss_sparse)(w)
    g_d = jax.grad(loss_dense)(w)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_d),
                               rtol=1e-4, atol=1e-4)


class TestWholeModelParity:
    """SENet14 dense execution: sparse-L0 vs dense-L0 produce the same
    predictions and gradients from shared parameters."""

    def _batch(self, rng, bs=2, n=96):
        from dpcr_agb_tpu.data.batch import Batch
        coords = np.zeros((bs, n, 3), np.int32)
        mask = np.zeros((bs, n), bool)
        for b in range(bs):
            nv = n - 8 - 11 * b
            d, h, w = 16, 16, 16
            flat = rng.choice(d * h * w, size=nv, replace=False)
            c = np.stack([flat // (h * w), (flat // w) % h, flat % w], 1)
            coords[b, :nv] = c
            mask[b, :nv] = True
        x = rng.normal(size=(bs, n, 2)).astype(np.float32)
        x[~mask] = 0
        return Batch(pos=jnp.zeros((bs, n, 3)), x=jnp.asarray(x),
                     mask=jnp.asarray(mask),
                     y_reg=jnp.zeros((bs, 2)),
                     y_reg_mask=jnp.ones((bs, 2), bool),
                     area_idx=jnp.zeros(bs, jnp.int32),
                     label_idx=jnp.arange(bs, dtype=jnp.int64),
                     is_double=jnp.zeros(bs, bool),
                     coords=jnp.asarray(coords))

    def _net_and_variables(self):
        from dpcr_agb_tpu.models.minkowski import build_resnet
        from dpcr_agb_tpu.ops import dense_grid

        class _DS:
            num_reg_classes = 2
        net = build_resnet("SENet14", {
            "activation": "gelu", "first_stride": 1, "global_pool": "sum",
            "drop_path": 0.0,
            "extra_options": {"dense_dims": [16, 16, 16]}}, _DS(), None)
        b = self._batch(np.random.default_rng(7))
        prev = dense_grid.L0_MODE
        dense_grid.L0_MODE = "dense"
        try:
            variables = net.init(jax.random.PRNGKey(0), b, train=False)
        finally:
            dense_grid.L0_MODE = prev
        return net, variables, b

    def test_sparse_l0_matches_dense_l0_forward(self, monkeypatch):
        """Fast-gate forward parity on a 1-stage truncation (the sparse/
        dense L0 branches + one shared residual stage + head — stages 2-4
        reuse the same block code, and the slow gradient test below runs
        the full SENet14, so depth adds no parity signal here; the full
        SENet14 forward compile alone cost 45 s of the fast gate)."""
        from dpcr_agb_tpu.models.minkowski import SparseResNet
        from dpcr_agb_tpu.ops import dense_grid
        net = SparseResNet(block="se_basic", layers=(1, 0, 0, 0),
                           num_reg_targets=2, activation="gelu",
                           first_stride=1, global_pool="sum", drop_path=0.0,
                           dense_dims=(16, 16, 16))
        b = self._batch(np.random.default_rng(7))
        monkeypatch.setattr(dense_grid, "L0_MODE", "dense")
        variables = net.init(jax.random.PRNGKey(0), b, train=False)
        out_dense = net.apply(variables, b, train=False)
        monkeypatch.setattr(dense_grid, "L0_MODE", "sparse")
        out_sparse = net.apply(variables, b, train=False)
        np.testing.assert_allclose(np.asarray(out_sparse),
                                   np.asarray(out_dense),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.slow
    def test_sparse_l0_matches_dense_l0_gradients(self, monkeypatch):
        """Whole-model gradient parity — two full backward compiles, so
        `slow`; the forward half (above) plus the per-op stem/pool grad
        tests stay in the fast gate."""
        from dpcr_agb_tpu.ops import dense_grid
        net, variables, b = self._net_and_variables()

        def loss_d(p):
            return jnp.sum(net.apply(
                {**variables, "params": p}, b, train=False) ** 2)

        monkeypatch.setattr(dense_grid, "L0_MODE", "dense")
        g_dense = jax.grad(loss_d)(variables["params"])
        monkeypatch.setattr(dense_grid, "L0_MODE", "sparse")
        g_sparse = jax.grad(loss_d)(variables["params"])

        def _cmp(path, gd, gs):
            np.testing.assert_allclose(
                np.asarray(gs), np.asarray(gd), rtol=5e-3, atol=1e-4,
                err_msg=jax.tree_util.keystr(path))
        jax.tree_util.tree_map_with_path(_cmp, g_dense, g_sparse)

    @pytest.mark.slow
    def test_bn_stats_match(self, monkeypatch):
        """Train-mode batch_stats from the sparse-L0 stem norm equal the
        dense-L0 ones (same occupied-site statistics)."""
        from dpcr_agb_tpu.models.minkowski import build_resnet
        from dpcr_agb_tpu.ops import dense_grid

        class _DS:
            num_reg_classes = 1
        net = build_resnet("SENet14", {
            "activation": "gelu", "first_stride": 1, "global_pool": "sum",
            "drop_path": 0.0,
            "extra_options": {"dense_dims": [16, 16, 16]}}, _DS(), None)
        rng = np.random.default_rng(9)
        b = self._batch(rng)
        monkeypatch.setattr(dense_grid, "L0_MODE", "dense")
        variables = net.init({"params": jax.random.PRNGKey(0),
                              "dropout": jax.random.PRNGKey(1)}, b,
                             train=False)
        _, mut_d = net.apply(variables, b, train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(2)})
        monkeypatch.setattr(dense_grid, "L0_MODE", "sparse")
        _, mut_s = net.apply(variables, b, train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(2)})
        sd = mut_d["batch_stats"]["stem_norm"]
        ss = mut_s["batch_stats"]["stem_norm"]
        for k in sd:
            np.testing.assert_allclose(np.asarray(ss[k]), np.asarray(sd[k]),
                                       rtol=1e-4, atol=1e-5, err_msg=k)


@pytest.mark.parametrize("g", [1, 2, 3, 4, 5, 6, 7])
def test_grouped_fold_every_group_size_matches(monkeypatch, g):
    """The y-group fold is exact for EVERY group size, divisor of k or not
    (g=5/6 for k=7 need the non-divisor extra y pad — a round-2 bug at the
    top y border), with sites forced onto every y-border corner."""
    from dpcr_agb_tpu.ops import sparse_stem
    monkeypatch.setattr(sparse_stem, "_pick_group",
                        lambda *a, **kw: g)
    rng = np.random.default_rng(11)
    dims = (10, 9, 8)
    coords, mask = _random_sites(rng, dims, 33, 48)
    # force y-border sites (y = h-1) where the last group overflows
    d, h, w = dims
    border = np.array([[0, h - 1, 0], [d - 1, h - 1, w - 1],
                       [3, h - 1, 4], [5, h - 1, 0], [d - 1, h - 1, 0],
                       [0, h - 1, w - 1], [2, h - 2, 3], [7, h - 1, 2]],
                      np.int32)
    coords = jnp.asarray(np.concatenate(
        [np.asarray(coords)[:33], border,
         np.zeros((48 - 33 - len(border), 3), np.int32)]))
    mask = jnp.asarray(np.arange(48) < 33 + len(border))
    feats = jnp.asarray(rng.normal(size=(48, 3)), jnp.float32)
    feats = jnp.where(mask[:, None], feats, 0.0)
    w7 = jnp.asarray(rng.normal(size=(343, 3, 6)) * 0.1, jnp.float32)
    dense, occ = scatter_to_dense(coords, mask, feats, dims)
    want = gather_from_dense(dense_conv(dense[None], occ[None], w7, 7)[0],
                             coords, mask)
    got = stem_conv_sparse(coords, mask, feats, dims, w7, 7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("budget", [10**12, 40_000, 1])
def test_grouped_fold_budgets_match(monkeypatch, budget):
    """The budget-driven group pick is exact end-to-end."""
    from dpcr_agb_tpu.ops import sparse_stem
    monkeypatch.setattr(sparse_stem, "FOLD_BYTES_BUDGET", budget)
    rng = np.random.default_rng(11)
    dims = (10, 9, 8)
    coords, mask = _random_sites(rng, dims, 33, 40)
    feats = jnp.asarray(rng.normal(size=(40, 3)), jnp.float32)
    feats = jnp.where(mask[:, None], feats, 0.0)
    w = jnp.asarray(rng.normal(size=(343, 3, 6)) * 0.1, jnp.float32)
    dense, occ = scatter_to_dense(coords, mask, feats, dims)
    want = gather_from_dense(dense_conv(dense[None], occ[None], w, 7)[0],
                             coords, mask)
    got = stem_conv_sparse(coords, mask, feats, dims, w, 7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_separable_pool_bwd_mode_parity(monkeypatch):
    """DPCR_POOL_BWD=separable: cascaded 1D window maxes == the 3^3 pool,
    values and gradients."""
    from dpcr_agb_tpu.ops import dense_grid
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.normal(size=(2, 9, 8, 7, 5)), jnp.float32)
    occ_in = jnp.asarray(rng.random((2, 9, 8, 7, 1)) < 0.3, jnp.float32)
    x = x * occ_in
    occ_out = occupancy_pool(occ_in)

    def loss(xi):
        return jnp.sum(dense_grid.dense_max_pool(xi, occ_in, occ_out) ** 2)

    monkeypatch.setattr(dense_grid, "POOL_BWD_MODE", "xla")
    want, gwant = jax.value_and_grad(loss)(x)
    monkeypatch.setattr(dense_grid, "POOL_BWD_MODE", "separable")
    got, ggot = jax.value_and_grad(loss)(x)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ggot), np.asarray(gwant),
                               rtol=1e-5, atol=1e-6)
