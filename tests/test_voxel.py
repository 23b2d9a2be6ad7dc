"""Sparse voxel engine tests vs a dense numpy oracle implementing
MinkowskiConvolution semantics (SURVEY.md §7: 'Parity tests: tiny voxel grids
vs a numpy oracle')."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpcr_agb_tpu.ops.voxel import (build_grid, downsample, hypercube_offsets,
                                    kernel_map, max_pool_apply, pack_keys,
                                    sparse_conv_apply)


def _random_voxels(rng, n_valid, v_pad, lo=-6, hi=7):
    """Unique random int coords padded to v_pad."""
    seen = set()
    pts = []
    while len(pts) < n_valid:
        c = tuple(rng.integers(lo, hi, size=3))
        if c not in seen:
            seen.add(c)
            pts.append(c)
    coords = np.full((v_pad, 3), 0, np.int32)
    coords[:n_valid] = np.array(pts, np.int32)
    mask = np.zeros(v_pad, bool)
    mask[:n_valid] = True
    return coords, mask


def _oracle_conv(coords, mask, feats, weights, offsets, stride,
                 out_coords, out_mask):
    """Dense dict-based Minkowski conv: out[u] = sum_k W_k @ f[stride*u + o_k]."""
    table = {tuple(c): i for i, c in enumerate(coords[mask])}
    f_valid = feats[mask]
    out = np.zeros((len(out_coords), weights.shape[-1]), np.float64)
    for ui, u in enumerate(out_coords):
        if not out_mask[ui]:
            continue
        for k, o in enumerate(offsets):
            key = tuple(stride * u + o)
            if key in table:
                out[ui] += f_valid[table[key]] @ weights[k]
    return out


class TestPackKeys:
    def test_ordering_and_sentinel(self, rng):
        coords, mask = _random_voxels(rng, 20, 32)
        keys = np.asarray(pack_keys(jnp.asarray(coords), jnp.asarray(mask)))
        assert (keys[~mask] == int(2 ** 30)).all()
        # distinct coords -> distinct keys
        assert len(set(keys[mask].tolist())) == 20


class TestKernelMap:
    @pytest.mark.parametrize("stride,ksize", [(1, 3), (2, 3), (2, 1), (1, 7)])
    def test_matches_oracle(self, rng, stride, ksize):
        coords, mask = _random_voxels(rng, 30, 40)
        feats = rng.normal(size=(40, 5)).astype(np.float32)
        feats[~mask] = 0
        offsets = hypercube_offsets(ksize)
        k = offsets.shape[0]
        weights = rng.normal(size=(k, 5, 4)).astype(np.float32)

        grid = build_grid(jnp.asarray(coords), jnp.asarray(mask))
        if stride == 1:
            out_grid = grid
        else:
            out_grid, _ = downsample(grid, None, stride, 40)
        nbr = kernel_map(grid, out_grid, jnp.asarray(offsets), stride)
        got = np.asarray(sparse_conv_apply(
            jnp.asarray(feats), nbr, jnp.asarray(weights), offset_chunk=4))

        out_coords = np.asarray(out_grid.coords)
        out_mask = np.asarray(out_grid.mask)
        want = _oracle_conv(coords, mask, feats, weights, offsets, stride,
                            out_coords, out_mask)
        np.testing.assert_allclose(got[out_mask], want[out_mask],
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(got[~out_mask], 0.0, atol=1e-5)


class TestDownsample:
    def test_unique_coords(self, rng):
        coords, mask = _random_voxels(rng, 25, 32)
        grid = build_grid(jnp.asarray(coords), jnp.asarray(mask))
        out, _ = downsample(grid, None, 2, 32)
        expected = {tuple(c // 2) for c in
                    np.floor_divide(coords[mask], 1)}  # floor handled below
        expected = {tuple(np.floor_divide(c, 2)) for c in coords[mask]}
        got = {tuple(c) for c in np.asarray(out.coords)[np.asarray(out.mask)]}
        assert got == expected

    def test_mean_max_pooled_feats(self, rng):
        coords, mask = _random_voxels(rng, 25, 32)
        feats = rng.normal(size=(32, 3)).astype(np.float32)
        grid = build_grid(jnp.asarray(coords), jnp.asarray(mask))
        for mode in ("mean", "max", "sum"):
            out, pooled = downsample(grid, jnp.asarray(feats), 2, 32, mode)
            out_c = np.asarray(out.coords)
            out_m = np.asarray(out.mask)
            pooled = np.asarray(pooled)
            for i in np.flatnonzero(out_m):
                members = [j for j in np.flatnonzero(mask)
                           if tuple(np.floor_divide(coords[j], 2))
                           == tuple(out_c[i])]
                vals = feats[members]
                want = {"mean": vals.mean(0), "max": vals.max(0),
                        "sum": vals.sum(0)}[mode]
                np.testing.assert_allclose(pooled[i], want, rtol=1e-5,
                                           atol=1e-6)

    def test_cap_overflow_drops_deterministically(self, rng):
        coords, mask = _random_voxels(rng, 30, 32)
        grid = build_grid(jnp.asarray(coords), jnp.asarray(mask))
        out, _ = downsample(grid, None, 1, 16)  # 30 unique > 16 cap
        assert int(np.asarray(out.mask).sum()) == 16


class TestMaxPool:
    def test_matches_oracle(self, rng):
        coords, mask = _random_voxels(rng, 20, 24)
        feats = rng.normal(size=(24, 4)).astype(np.float32)
        feats[~mask] = 0
        offsets = hypercube_offsets(3)
        grid = build_grid(jnp.asarray(coords), jnp.asarray(mask))
        out_grid, _ = downsample(grid, None, 2, 24)
        nbr = kernel_map(grid, out_grid, jnp.asarray(offsets), 2)
        got = np.asarray(max_pool_apply(jnp.asarray(feats), nbr,
                                        out_grid.mask))
        table = {tuple(c): i for i, c in enumerate(coords[mask])}
        f_valid = feats[mask]
        out_c = np.asarray(out_grid.coords)
        out_m = np.asarray(out_grid.mask)
        for ui in np.flatnonzero(out_m):
            vals = [f_valid[table[tuple(2 * out_c[ui] + o)]]
                    for o in offsets if tuple(2 * out_c[ui] + o) in table]
            want = np.max(vals, axis=0)
            np.testing.assert_allclose(got[ui], want, rtol=1e-5)


class TestSparseResNet:
    def _batch(self, rng, bs=2, n=64):
        from dpcr_agb_tpu.data.batch import Batch
        coords = np.zeros((bs, n, 3), np.int32)
        mask = np.zeros((bs, n), bool)
        for b in range(bs):
            nv = n - 10 - 10 * b  # always leave padding rows to corrupt
            c, m = _random_voxels(rng, nv, n, lo=0, hi=16)
            coords[b], mask[b] = c, m
        x = rng.normal(size=(bs, n, 2)).astype(np.float32)
        x[~mask] = 0
        y = rng.normal(size=(bs, 2)).astype(np.float32)
        return Batch(pos=jnp.zeros((bs, n, 3)), x=jnp.asarray(x),
                     mask=jnp.asarray(mask), y_reg=jnp.asarray(y),
                     y_reg_mask=jnp.ones((bs, 2), bool),
                     area_idx=jnp.zeros(bs, jnp.int32),
                     label_idx=jnp.arange(bs, dtype=jnp.int64),
                     is_double=jnp.zeros(bs, bool),
                     coords=jnp.asarray(coords))

    @pytest.mark.parametrize(
        "arch",
        ["SENet14", pytest.param("ResNet50_", marks=pytest.mark.slow)])
    def test_forward_and_padding_invariance(self, rng, arch):
        import dataclasses
        from dpcr_agb_tpu.models.minkowski import build_resnet

        class _DS:
            num_reg_classes = 2
        net = build_resnet(arch, {"activation": "gelu", "first_stride": 1,
                                  "global_pool": "sum", "drop_path": 0.0,
                                  "extra_options": {"dense_dims": [16, 16, 16]}},
                           _DS(), None)
        b = self._batch(rng)
        variables = net.init(jax.random.PRNGKey(0), b, train=False)
        out = net.apply(variables, b, train=False)
        assert out.shape == (2, 2)
        assert np.isfinite(np.asarray(out)).all()
        # corrupt padded rows -> identical output
        bad_x = b.x.at[:, -5:].set(1e5)
        bad_coords = b.coords.at[:, -5:].set(3)  # valid-looking but masked
        b2 = dataclasses.replace(b, x=bad_x, coords=bad_coords)
        out2 = net.apply(variables, b2, train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.slow
    def test_train_step_updates(self, rng):
        import optax
        from dpcr_agb_tpu.models.minkowski import build_resnet
        from dpcr_agb_tpu.models.base import compute_reg_loss
        from tests.test_models import _spec

        class _DS:
            num_reg_classes = 1
        net = build_resnet("SENet14", {"activation": "gelu",
                                       "first_stride": 1,
                                       "global_pool": "sum",
                                       "drop_path": 0.01,
                                       "extra_options": {"dense_dims": [16, 16, 16]}}, _DS(), None)
        b = self._batch(rng)
        import dataclasses as dc
        b = dc.replace(b, y_reg=b.y_reg[:, :1], y_reg_mask=b.y_reg_mask[:, :1])
        spec = _spec(T=1)
        variables = net.init({"params": jax.random.PRNGKey(0),
                              "dropout": jax.random.PRNGKey(1)}, b,
                             train=False)
        params, stats = variables["params"], variables.get("batch_stats", {})
        tx = optax.adam(1e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, stats, opt):
            def loss_fn(p):
                raw, mut = net.apply(
                    {"params": p, "batch_stats": stats}, b, train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(2)})
                return compute_reg_loss(spec, raw, b.y_reg, b.y_reg_mask,
                                        True), mut
            (loss, mut), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            upd, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, upd), mut["batch_stats"], opt, loss

        p0 = jax.tree_util.tree_leaves(params)[0].copy()
        for i in range(5):
            params, stats, opt, loss = step(params, stats, opt)
            assert np.isfinite(float(loss)), f"step {i} loss not finite"
        # gradients flow end-to-end: params moved, stats updated
        assert not np.allclose(np.asarray(p0),
                               np.asarray(jax.tree_util.tree_leaves(params)[0]))


class TestDenseConvDFold:
    """The tiny-Cin D-fold 2D reformulation must be bit-class-identical to
    the plain 3D conv (same math, different XLA emitter)."""

    @pytest.mark.parametrize("ksize,stride,cin", [(7, 1, 3), (3, 1, 4),
                                                  (3, 2, 3), (7, 2, 1)])
    def test_dfold_matches_3d(self, rng, ksize, stride, cin):
        from dpcr_agb_tpu.ops.dense_grid import (_dense_conv_dfold,
                                                 dense_conv, level_dims)
        b, dims, cout = 2, (9, 8, 7), 5
        x = jnp.asarray(rng.normal(size=(b, *dims, cin)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(ksize ** 3, cin, cout)) * 0.1,
                        jnp.float32)
        odims = dims if stride == 1 else level_dims(dims, 1)
        occ = jnp.asarray(
            rng.integers(0, 2, size=(b, *odims, 1)), jnp.float32)
        w5 = w.reshape(ksize, ksize, ksize, cin, cout)
        pad = ksize // 2

        def plain(x_, w5_):
            return jax.lax.conv_general_dilated(
                x_, w5_, (stride,) * 3, [(pad, pad)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) * occ

        ref = plain(x, w5)
        got = _dense_conv_dfold(x, occ, w5, ksize, stride, jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        # dense_conv (plain path by default) agrees too
        via_api = dense_conv(x, occ, w, ksize, stride)
        np.testing.assert_allclose(np.asarray(via_api), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        # custom_vjp backward (dfold dw/dx) == autodiff of the plain conv
        from dpcr_agb_tpu.ops.dense_grid import _tiny_cin_conv
        ct = jnp.asarray(rng.normal(size=ref.shape), jnp.float32)
        gx_ref, gw_ref = jax.grad(
            lambda x_, w5_: jnp.sum(plain(x_, w5_) * ct), (0, 1))(x, w5)
        gx, gw = jax.grad(
            lambda x_, w_: jnp.sum(_tiny_cin_conv(x_, w_, ksize, stride)
                                   * occ * ct), (0, 1))(x, w5)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                                   rtol=1e-4, atol=1e-4)


class TestDenseStem:
    """ops/dense_stem.py: z-folded firewalled stem conv and the manual
    maxpool backward vs the default XLA paths."""

    def _vol(self, rng, b=2, d=10, h=10, w=12, cin=3):
        x = rng.normal(size=(b, d, h, w, cin)).astype(np.float32)
        occ = (rng.random((b, d, h, w, 1)) < 0.15).astype(np.float32)
        x = x * occ
        return jnp.asarray(x), jnp.asarray(occ)

    @pytest.mark.parametrize("two_d", [False, True])
    @pytest.mark.parametrize("k,stride", [(7, 1), (7, 2), (3, 1)])
    def test_stem_conv_folded_matches_dense_conv(self, rng, k, stride, two_d):
        from dpcr_agb_tpu.ops.dense_grid import dense_conv
        from dpcr_agb_tpu.ops.dense_stem import stem_conv_folded
        x, occ = self._vol(rng)
        cout = 8
        wts = rng.normal(size=(k ** 3, 3, cout)).astype(np.float32) * 0.1
        occ_out = occ if stride == 1 else occ[:, ::2, ::2, ::2]
        want = dense_conv(x, occ_out, jnp.asarray(wts), k, stride)
        got = stem_conv_folded(x, occ_out, jnp.asarray(wts), k, stride,
                               jnp.float32, two_d=two_d)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("two_d", [False, True])
    def test_stem_conv_folded_dw_matches(self, rng, two_d):
        from dpcr_agb_tpu.ops.dense_grid import dense_conv
        from dpcr_agb_tpu.ops.dense_stem import stem_conv_folded
        x, occ = self._vol(rng)
        wts = jnp.asarray(rng.normal(size=(343, 3, 8)).astype(np.float32))
        ct = jnp.asarray(rng.normal(size=(2, 10, 10, 12, 8))
                         .astype(np.float32))

        def loss_ref(w):
            return jnp.sum(dense_conv(x, occ, w, 7, 1) * ct)

        def loss_fold(w):
            return jnp.sum(stem_conv_folded(x, occ, w, 7, 1, jnp.float32,
                                            two_d=two_d)
                           * ct)

        np.testing.assert_allclose(
            np.asarray(jax.grad(loss_fold)(wts)),
            np.asarray(jax.grad(loss_ref)(wts)), rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("fwd_mode", [
        pytest.param("separable", marks=pytest.mark.slow), "window3d"])
    def test_manual_max_pool_matches_forward_and_backward(
            self, rng, fwd_mode, monkeypatch):
        from dpcr_agb_tpu.ops.dense_grid import (dense_max_pool,
                                                 occupancy_pool)
        from dpcr_agb_tpu.ops import dense_stem
        from dpcr_agb_tpu.ops.dense_stem import manual_max_pool
        monkeypatch.setattr(dense_stem, "POOL_FWD_MODE", fwd_mode)
        x, occ = self._vol(rng, cin=4)
        occ2 = occupancy_pool(occ)
        want = dense_max_pool(x, occ, occ2)
        got = manual_max_pool(x, occ, occ2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)
        ct = jnp.asarray(rng.normal(size=want.shape).astype(np.float32))

        def loss(fn, xi):
            return jnp.sum(fn(xi, occ, occ2) * ct)

        # continuous random values: no in-window ties among occupied cells,
        # so equality routing == select_and_scatter exactly
        g_ref = jax.grad(lambda xi: loss(dense_max_pool, xi))(x)
        g_man = jax.grad(lambda xi: loss(manual_max_pool, xi))(x)
        np.testing.assert_allclose(np.asarray(g_man), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_layout_firewall_identity_and_grad(self, rng):
        from dpcr_agb_tpu.ops.dense_stem import layout_firewall
        x = jnp.asarray(rng.normal(size=(2, 3, 4, 8, 6)).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(layout_firewall(x)),
                                      np.asarray(x))
        g = jax.grad(lambda v: jnp.sum(layout_firewall(v) ** 2))(x)
        np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(x),
                                   rtol=1e-6)
