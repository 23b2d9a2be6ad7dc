"""KPConv stack tests: neighbor/subsample ops vs numpy oracles, core KPConv
op vs the reference formula, KPCNN end-to-end shapes + padding invariance."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpcr_agb_tpu.ops.kernel_points import load_kernel_points, spherical_lloyd
from dpcr_agb_tpu.ops.neighbors import fps, grid_subsample, radius_neighbors
from dpcr_agb_tpu.models.kpconv import (KPCNN, build_kpconv, kpconv_apply,
                                        max_pool_zero_shadow)


def _cloud(rng, n_valid, n_pad):
    pos = np.full((n_pad, 3), 1e6, np.float32)
    pos[:n_valid] = rng.uniform(0, 1, size=(n_valid, 3)).astype(np.float32)
    mask = np.zeros(n_pad, bool)
    mask[:n_valid] = True
    return pos, mask


class TestRadiusNeighbors:
    def test_matches_numpy_oracle(self, rng):
        q, qm = _cloud(rng, 50, 64)
        s, sm = _cloud(rng, 40, 48)
        r, k = 0.3, 8
        nbr = np.asarray(radius_neighbors(
            jnp.asarray(q), jnp.asarray(qm), jnp.asarray(s), jnp.asarray(sm),
            r, k, tile=16))
        assert nbr.shape == (64, k)
        for i in range(64):
            if not qm[i]:
                assert (nbr[i] == 48).all()
                continue
            d = np.linalg.norm(s[:40] - q[i], axis=1)
            want = np.argsort(d)
            want = [j for j in want if d[j] < r][:k]
            got = [j for j in nbr[i] if j < 48]
            assert got == want, (i, got, want)
            assert (nbr[i, len(got):] == 48).all()

    def test_k_larger_than_supports(self, rng):
        q, qm = _cloud(rng, 4, 4)
        s, sm = _cloud(rng, 3, 3)
        nbr = np.asarray(radius_neighbors(
            jnp.asarray(q), jnp.asarray(qm), jnp.asarray(s), jnp.asarray(sm),
            10.0, 6))
        assert nbr.shape == (4, 6)
        assert (nbr <= 3).all()


class TestGridSubsample:
    def test_barycenters(self, rng):
        pos, mask = _cloud(rng, 30, 40)
        dl = 0.25
        out_pos, out_mask = grid_subsample(jnp.asarray(pos), jnp.asarray(mask),
                                           dl, 40)
        out_pos, out_mask = np.asarray(out_pos), np.asarray(out_mask)
        cells = np.floor(pos[:30] / dl).astype(int)
        uniq = {tuple(c) for c in cells}
        assert out_mask.sum() == len(uniq)
        got = {tuple(np.floor(p / dl).astype(int)): p
               for p in out_pos[out_mask]}
        for c in uniq:
            members = pos[:30][(cells == np.array(c)).all(axis=1)]
            np.testing.assert_allclose(got[c], members.mean(0), rtol=1e-4)

    def test_rotation_roundtrip(self, rng):
        from dpcr_agb_tpu.ops.neighbors import random_rotation
        pos, mask = _cloud(rng, 20, 24)
        rot = random_rotation(jax.random.PRNGKey(3))
        assert np.allclose(np.asarray(rot @ rot.T), np.eye(3), atol=1e-5)
        out_pos, out_mask = grid_subsample(jnp.asarray(pos), jnp.asarray(mask),
                                           0.25, 24, rotation=rot)
        # barycenters stay within the cloud's bounding box (after inverse rot)
        valid = np.asarray(out_pos)[np.asarray(out_mask)]
        assert valid.min() > -0.5 and valid.max() < 1.5


class TestKPConvOp:
    def _oracle(self, q, s, nbr, x, kp, w, extent):
        """Reference formula (blocks.py:302-400), numpy."""
        ns = len(s)
        s_pad = np.concatenate([s, np.full((1, 3), 1e6, np.float32)])
        x_pad = np.concatenate([x, np.zeros((1, x.shape[1]), np.float32)])
        out = np.zeros((len(q), w.shape[2]))
        for i in range(len(q)):
            neigh = s_pad[nbr[i]] - q[i]
            sqd = ((neigh[:, None, :] - kp[None]) ** 2).sum(-1)  # [K,Kp]
            infl = np.clip(1 - np.sqrt(sqd) / extent, 0, None)
            wf = infl.T @ x_pad[nbr[i]]                          # [Kp,Cin]
            out[i] = np.einsum("pc,pcd->d", wf, w)
        return out

    def test_matches_reference_formula(self, rng):
        q, qm = _cloud(rng, 20, 24)
        s, sm = _cloud(rng, 30, 32)
        x = rng.normal(size=(32, 5)).astype(np.float32)
        kp = load_kernel_points(0.1, 15, "center", seed=1)
        w = rng.normal(size=(15, 5, 6)).astype(np.float32)
        nbr = np.asarray(radius_neighbors(
            jnp.asarray(q), jnp.asarray(qm), jnp.asarray(s), jnp.asarray(sm),
            0.25, 10))
        got = np.asarray(kpconv_apply(
            jnp.asarray(q), jnp.asarray(s), jnp.asarray(nbr), jnp.asarray(x),
            jnp.asarray(kp), jnp.asarray(w), 0.1))
        want = self._oracle(q, s, nbr, x, kp, w, 0.1)
        np.testing.assert_allclose(got[qm], want[qm], rtol=1e-3, atol=1e-4)

    def test_max_pool_zero_shadow(self, rng):
        x = -np.abs(rng.normal(size=(5, 3))).astype(np.float32)  # all negative
        nbr = np.array([[0, 1, 5], [5, 5, 5]], np.int32)
        out = np.asarray(max_pool_zero_shadow(jnp.asarray(x), jnp.asarray(nbr)))
        # shadow zero participates in the max (reference blocks.py:103-120)
        np.testing.assert_allclose(out[0], np.maximum(x[:2].max(0), 0))
        np.testing.assert_allclose(out[1], 0.0)


class TestKernelPoints:
    def test_lloyd_properties(self):
        pts = spherical_lloyd(1.0, 15, fixed="center")
        assert pts.shape == (15, 3)
        np.testing.assert_allclose(pts[0], 0.0, atol=1e-6)  # fixed center
        radii = np.linalg.norm(pts, axis=1)
        assert radii.max() <= 1.01
        # quasi-uniform: min pairwise distance reasonably large
        d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
        d[np.eye(15, dtype=bool)] = np.inf
        assert d.min() > 0.2

    def test_load_scaled_and_cached(self):
        a = load_kernel_points(2.0, 15, seed=7)
        b = load_kernel_points(2.0, 15, seed=7)
        np.testing.assert_array_equal(a, b)  # deterministic
        assert np.linalg.norm(a, axis=1).max() > 1.0  # scaled by radius

    def test_potential_descent_properties(self):
        """Reference GD optimizer semantics (kernel_points.py:204-337):
        fixed center, mean non-center radius == 0.66 after rescale,
        well-separated points."""
        from dpcr_agb_tpu.ops.kernel_points import potential_descent
        pts = potential_descent(15, fixed="center", n_candidates=8,
                                max_steps=3000)
        assert pts.shape == (15, 3)
        np.testing.assert_allclose(pts[0], 0.0, atol=1e-7)
        radii = np.linalg.norm(pts, axis=1)
        np.testing.assert_allclose(radii[1:].mean(), 0.66, atol=1e-3)
        d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
        d[np.eye(15, dtype=bool)] = np.inf
        # repulsion must spread the points into a near-uniform shell: the
        # round-1-4 sign bug (attraction) produced a 6-point clump at
        # r~0.05 (min pairwise 0.024) + a hemisphere shell at r~1.1 and
        # still passed a weaker d.min() > 0.2 at these reduced step
        # counts — these bounds fail on any collapsing dynamics
        assert d.min() > 0.45, f"clumped disposition (min pair {d.min():.3f})"
        assert radii[1:].std() < 0.05, f"radius spread {radii[1:].std():.3f}"
        assert abs(pts[1:, 2].mean()) < 0.25  # no hemisphere collapse

    def test_potential_descent_verticals(self):
        from dpcr_agb_tpu.ops.kernel_points import potential_descent
        pts = potential_descent(15, fixed="verticals", n_candidates=4,
                                max_steps=2000)
        np.testing.assert_allclose(pts[0], 0.0, atol=1e-7)
        # vertical pair stays on the z axis (xy gradients zeroed)
        np.testing.assert_allclose(pts[1:3, :2], 0.0, atol=1e-7)
        assert pts[1, 2] > 0 and pts[2, 2] < 0

    def test_auto_method_matches_reference_rule(self, monkeypatch):
        """K<=30 -> descent disposition (mean radius 0.66), K>30 -> Lloyd
        (space-filling, larger mean radius). Reads the packaged disposition
        cache (committed, like the reference's kernels/dispositions .ply
        files) — regeneration is covered by test_potential_descent_*."""
        monkeypatch.delenv("DPCR_KP_DISPOSITION", raising=False)
        a = load_kernel_points(1.0, 15, seed=0, jitter=0.0)
        np.testing.assert_allclose(
            np.linalg.norm(a, axis=1)[1:].mean(), 0.66, atol=1e-3)
        # pinning lloyd gives the space-filling disposition instead
        b = load_kernel_points(1.0, 15, seed=0, jitter=0.0, method="lloyd")
        assert abs(np.linalg.norm(b, axis=1)[1:].mean() - 0.66) > 0.02


class TestKPCNN:
    def _batch(self, rng, bs=2, n=256, c=3, T=2):
        from dpcr_agb_tpu.data.batch import Batch
        pos = np.full((bs, n, 3), 1e6, np.float32)
        mask = np.zeros((bs, n), bool)
        x = np.zeros((bs, n, c), np.float32)
        for b in range(bs):
            nv = n - 30 - 30 * b
            pos[b, :nv] = rng.uniform(0, 1, size=(nv, 3))
            mask[b, :nv] = True
            x[b, :nv] = rng.normal(size=(nv, c))
        y = rng.normal(size=(bs, T)).astype(np.float32)
        return Batch(pos=jnp.asarray(pos), x=jnp.asarray(x),
                     mask=jnp.asarray(mask), y_reg=jnp.asarray(y),
                     y_reg_mask=jnp.ones((bs, T), bool),
                     area_idx=jnp.zeros(bs, jnp.int32),
                     label_idx=jnp.arange(bs, dtype=jnp.int64),
                     is_double=jnp.zeros(bs, bool))

    def _net(self, arch=None):
        return KPCNN(
            architecture=arch or ["simple", "resnetb", "resnetb_strided",
                                  "resnetb", "resnetb_strided", "resnetb",
                                  "global_sum"],
            num_reg_targets=2, in_features_dim=3,
            first_subsampling_dl=0.05, neighborhood_limits=[12, 12, 12])

    @pytest.mark.slow
    def test_forward_and_padding_invariance(self, rng):
        net = self._net()
        b = self._batch(rng)
        variables = net.init(jax.random.PRNGKey(0), b, train=False)
        out = net.apply(variables, b, train=False)
        assert out.shape == (2, 2)
        assert np.isfinite(np.asarray(out)).all()
        b2 = dataclasses.replace(
            b, x=b.x.at[:, -10:].set(123.0),
            pos=b.pos.at[:, -10:].set(0.5))  # in-cloud-looking but masked
        out2 = net.apply(variables, b2, train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                                   rtol=1e-4, atol=1e-4)

    @pytest.mark.slow
    def test_gradients_flow(self, rng):
        net = self._net()
        b = self._batch(rng)
        variables = net.init(jax.random.PRNGKey(0), b, train=False)

        def loss(params):
            out, _ = net.apply({"params": params,
                                "batch_stats": variables["batch_stats"]},
                               b, train=True, mutable=["batch_stats"])
            return jnp.sum(jnp.square(out))

        g = jax.grad(loss)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # at least the first kpconv weights receive signal
        total = sum(float(jnp.abs(l).sum()) for l in leaves)
        assert total > 0


def test_fps_covers_cloud(rng):
    pos, mask = _cloud(rng, 60, 64)
    idx = np.asarray(fps(jnp.asarray(pos), jnp.asarray(mask), 8))
    assert len(set(idx.tolist())) == 8
    assert (idx < 60).all()


class TestDeformableKPConv:
    @pytest.mark.slow
    def test_deformable_forward_and_reg_loss(self, rng):
        import jax
        from dpcr_agb_tpu.models.kpconv import KPCNN
        from tests.test_kpconv import TestKPCNN
        b = TestKPCNN()._batch(rng, n=128)
        net = KPCNN(
            architecture=["simple", "resnetb_deformable",
                          "resnetb_deformable_strided", "resnetb",
                          "global_sum"],
            num_reg_targets=2, in_features_dim=3, first_subsampling_dl=0.05,
            neighborhood_limits=[12, 12])
        variables = net.init(jax.random.PRNGKey(0), b, train=False)
        out = net.apply(variables, b, train=False)
        assert out.shape == (2, 2) and np.isfinite(np.asarray(out)).all()
        # train mode sows the p2p regularizer into the losses collection
        out2, mut = net.apply(variables, b, train=True,
                              mutable=["batch_stats", "losses"])
        leaves = jax.tree_util.tree_leaves(mut.get("losses", {}))
        assert leaves, "deformable blocks should sow deform_reg"
        total = sum(float(jnp.sum(l)) for l in leaves)
        assert np.isfinite(total) and total >= 0

    def test_offsets_zero_init_matches_rigid_influences(self, rng):
        """With zero offset weights/bias at init, the deformable conv output
        should be finite and well-behaved (offsets start at ~0)."""
        import jax
        from dpcr_agb_tpu.models.kpconv import KPConvOp
        from dpcr_agb_tpu.ops.kernel_points import load_kernel_points
        q = jnp.asarray(rng.uniform(0, 1, size=(1, 16, 3)).astype(np.float32))
        nbr = jnp.asarray(rng.integers(0, 16, size=(1, 16, 6)).astype(np.int32))
        x = jnp.asarray(rng.normal(size=(1, 16, 4)).astype(np.float32))
        kp = load_kernel_points(0.2, 15, seed=0)
        op = KPConvOp(8, kp, 0.08, deformable=True)
        variables = op.init(jax.random.PRNGKey(0), q, q, nbr, x)
        out, mut = op.apply(variables, q, q, nbr, x,
                            mutable=["losses"])
        assert out.shape == (1, 16, 8)
        assert np.isfinite(np.asarray(out)).all()


class TestBatchedFastPath:
    """The flat-gather batched rigid path must match the per-sample
    reference-oracle functions exactly."""

    @pytest.mark.slow
    def test_batched_matches_per_sample(self, rng):
        import jax
        from dpcr_agb_tpu.models.kpconv import (
            kp_influence_weights, kp_influence_weights_batched,
            kpconv_apply, kpconv_apply_batched, max_pool_zero_shadow,
            max_pool_zero_shadow_batched)
        bs, nq, ns, K, Kp, cin, cout = 3, 64, 80, 9, 7, 5, 6
        q = jnp.asarray(rng.uniform(0, 1, (bs, nq, 3)), jnp.float32)
        s = jnp.asarray(rng.uniform(0, 1, (bs, ns, 3)), jnp.float32)
        # include shadow indices (ns = shadow row)
        nbr = jnp.asarray(rng.integers(0, ns + 1, (bs, nq, K)), jnp.int32)
        x = jnp.asarray(rng.normal(size=(bs, ns, cin)), jnp.float32)
        kp = jnp.asarray(rng.uniform(-1, 1, (Kp, 3)) * 0.1, jnp.float32)
        w = jnp.asarray(rng.normal(size=(Kp, cin, cout)) * 0.2, jnp.float32)
        ext = 0.15
        for agg in ("sum", "closest"):
            all_w_b = kp_influence_weights_batched(q, s, nbr, kp, ext,
                                                   "linear", agg)
            all_w_ref = jax.vmap(lambda qq, ss, nn: kp_influence_weights(
                qq, ss, nn, kp, ext, "linear", agg)[0])(q, s, nbr)
            np.testing.assert_allclose(np.asarray(all_w_b),
                                       np.asarray(all_w_ref),
                                       rtol=1e-6, atol=1e-6)
            out_b = kpconv_apply_batched(nbr, x, w, all_w_b)
            out_ref = jax.vmap(lambda qq, ss, nn, xx: kpconv_apply(
                qq, ss, nn, xx, kp, w, ext, "linear", agg))(q, s, nbr, x)
            np.testing.assert_allclose(np.asarray(out_b),
                                       np.asarray(out_ref),
                                       rtol=1e-5, atol=1e-5)
        pool_b = max_pool_zero_shadow_batched(x, nbr)
        pool_ref = jax.vmap(max_pool_zero_shadow)(x, nbr)
        np.testing.assert_allclose(np.asarray(pool_b), np.asarray(pool_ref),
                                   rtol=1e-6, atol=1e-6)

    @pytest.mark.slow
    def test_neighbor_gather_grad_matches_autodiff(self, rng):
        """Scatter-free backward (host edge transpose) == autodiff scatter."""
        import jax
        from dpcr_agb_tpu.models.kpconv import _batched_rows, neighbor_gather
        from dpcr_agb_tpu.ops.host_pyramid import _edge_transpose
        bs, n, nq, K, C = 3, 33, 21, 7, 5
        x_pad = jnp.asarray(rng.normal(size=(bs, n, C)), jnp.float32)
        nbr_np = rng.integers(0, n, (bs, nq, K)).astype(np.int32)
        perm = np.stack([_edge_transpose(nbr_np[b], n - 1)[0]
                         for b in range(bs)])
        off = np.stack([_edge_transpose(nbr_np[b], n - 1)[1]
                        for b in range(bs)])
        nbr = jnp.asarray(nbr_np)
        ct = jnp.asarray(rng.normal(size=(bs, nq, K, C)), jnp.float32)
        g_ref = jax.grad(lambda x: jnp.sum(_batched_rows(x, nbr) * ct))(x_pad)
        g = jax.grad(lambda x: jnp.sum(neighbor_gather(
            x, nbr, jnp.asarray(perm), jnp.asarray(off)) * ct))(x_pad)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-4)
        # forwards agree too
        np.testing.assert_allclose(
            np.asarray(neighbor_gather(x_pad, nbr, jnp.asarray(perm),
                                       jnp.asarray(off))),
            np.asarray(_batched_rows(x_pad, nbr)))


class TestReverseGatherBackward:
    def test_grad_matches_autodiff_scatter(self, rng):
        from dpcr_agb_tpu.models.kpconv import (_batched_rows,
                                                neighbor_gather_rev)
        from dpcr_agb_tpu.ops.host_pyramid import reverse_lists
        b, ns, nq, k, c, kr = 2, 30, 24, 5, 6, 16
        nbr = rng.integers(0, ns + 1, (b, nq, k)).astype(np.int32)
        rnbr = np.stack([reverse_lists(nbr[i], ns, kr) for i in range(b)])
        x_pad = rng.standard_normal((b, ns + 1, c)).astype(np.float32)
        gs = rng.standard_normal((b, nq, k, c)).astype(np.float32)

        def loss_ref(xp):
            return jnp.sum(_batched_rows(xp, jnp.asarray(nbr))
                           * jnp.asarray(gs))

        def loss_rev(xp):
            return jnp.sum(neighbor_gather_rev(
                xp, jnp.asarray(nbr), jnp.asarray(rnbr)) * jnp.asarray(gs))

        want = jax.grad(loss_ref)(jnp.asarray(x_pad))
        got = jax.grad(loss_rev)(jnp.asarray(x_pad))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.slow
    def test_kpcnn_with_reverse_aux_matches(self, rng):
        """Full KPCNN grads with reverse_dx aux == without (scatter path)."""
        import dataclasses
        from dpcr_agb_tpu.models.kpconv import KPCNN
        from dpcr_agb_tpu.ops.host_pyramid import (kpconv_pyramid_host,
                                                   kpconv_pyramid_plan)
        from dpcr_agb_tpu import native
        if not native.is_available():
            pytest.skip("native lib unavailable")
        arch = ["simple", "resnetb", "resnetb_strided", "resnetb",
                "global_sum"]
        b, n = 2, 64
        pos = rng.uniform(0, 1, (b, n, 3)).astype(np.float32)
        mask = np.ones((b, n), bool)
        mask[1, 50:] = False
        pos[~mask] = 1e6
        x = rng.standard_normal((b, n, 3)).astype(np.float32)
        plan = kpconv_pyramid_plan(0.1, 2.5, 2, n, (1.0, 0.7), [8, 8])
        per0 = [kpconv_pyramid_host(pos[i], mask[i], plan) for i in range(b)]
        plan_r = dict(plan, reverse_dx=True)
        per1 = [kpconv_pyramid_host(pos[i], mask[i], plan_r)
                for i in range(b)]
        aux0 = {k2: jnp.asarray(np.stack([p[k2] for p in per0]))
                for k2 in per0[0]}
        aux1 = {k2: jnp.asarray(np.stack([p[k2] for p in per1]))
                for k2 in per1[0]}

        @dataclasses.dataclass
        class B:
            pos: jnp.ndarray
            mask: jnp.ndarray
            x: jnp.ndarray
            aux: dict

        net = KPCNN(architecture=arch, num_reg_targets=2, in_features_dim=3,
                    first_features_dim=16, num_kernel_points=5,
                    first_subsampling_dl=0.1, point_fracs=(1.0, 0.7),
                    neighborhood_limits=(8, 8))
        batch0 = B(jnp.asarray(pos), jnp.asarray(mask), jnp.asarray(x), aux0)
        batch1 = B(jnp.asarray(pos), jnp.asarray(mask), jnp.asarray(x), aux1)
        v = net.init(jax.random.PRNGKey(0), batch0, train=False)

        def loss(p, bt):
            return jnp.sum(net.apply(
                {"params": p, **{k3: v[k3] for k3 in v if k3 != "params"}},
                bt, train=False) ** 2)

        g0 = jax.grad(loss)(v["params"], batch0)
        g1 = jax.grad(loss)(v["params"], batch1)
        flat0 = jax.tree.leaves(g0)
        flat1 = jax.tree.leaves(g1)
        for a, c2 in zip(flat0, flat1):
            np.testing.assert_allclose(np.asarray(c2), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)
