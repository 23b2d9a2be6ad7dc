"""Host pyramid (numpy) vs device pyramid (ops/voxel.py) parity, and
SparseResNet forward equivalence with/without batch.aux."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpcr_agb_tpu.ops.host_pyramid import (HostGrid, collate_sparse_aux,
                                           downsample_np, kernel_map_np,
                                           resnet_pyramid_plan,
                                           sparse_pyramid_host)
from dpcr_agb_tpu.ops.voxel import (build_grid, downsample, hypercube_offsets,
                                    kernel_map)
from tests.test_voxel import _random_voxels


def test_grid_and_downsample_match_device(rng):
    coords, mask = _random_voxels(rng, 40, 48, lo=0, hi=16)
    hg = HostGrid(coords, mask)
    dg = build_grid(jnp.asarray(coords), jnp.asarray(mask))
    np.testing.assert_array_equal(hg.keys_sorted, np.asarray(dg.keys_sorted))
    np.testing.assert_array_equal(hg.order, np.asarray(dg.order))
    hd = downsample_np(hg, 2, 48)
    dd, _ = downsample(dg, None, 2, 48)
    np.testing.assert_array_equal(hd.mask, np.asarray(dd.mask))
    np.testing.assert_array_equal(hd.coords[hd.mask],
                                  np.asarray(dd.coords)[np.asarray(dd.mask)])


@pytest.mark.parametrize("stride,k", [(1, 3), (2, 3), (2, 1), (1, 7)])
def test_kernel_map_matches_device(rng, stride, k):
    coords, mask = _random_voxels(rng, 40, 48, lo=0, hi=16)
    offs = hypercube_offsets(k)
    hg = HostGrid(coords, mask)
    dg = build_grid(jnp.asarray(coords), jnp.asarray(mask))
    if stride == 1:
        h_out, d_out = hg, dg
    else:
        h_out = downsample_np(hg, 2, 48)
        d_out, _ = downsample(dg, None, 2, 48)
    hm = kernel_map_np(hg, h_out, offs, stride)
    dm = kernel_map(dg, d_out, jnp.asarray(offs), stride)
    np.testing.assert_array_equal(hm, np.asarray(dm))


@pytest.mark.slow
def test_sparse_resnet_forward_equal_with_aux(rng):
    from dpcr_agb_tpu.models.minkowski import (DEFAULT_LEVEL_FRACS,
                                               build_resnet)

    class _DS:
        num_reg_classes = 2
    net = build_resnet("SENet14", {"activation": "gelu", "first_stride": 1,
                                   "global_pool": "sum", "drop_path": 0.0,
                                   "extra_options": {"dense_dims": None}},
                       _DS(), None)
    from tests.test_voxel import TestSparseResNet
    b = TestSparseResNet()._batch(rng)
    variables = net.init(jax.random.PRNGKey(0), b, train=False)
    out_device = net.apply(variables, b, train=False)

    plan = resnet_pyramid_plan(net.first_stride, net.strides,
                               b.coords.shape[1], DEFAULT_LEVEL_FRACS,
                               caps=net.level_caps)
    aux = collate_sparse_aux(np.asarray(b.coords), np.asarray(b.mask), plan)
    b_aux = dataclasses.replace(b, aux=aux)
    out_host = net.apply(variables, b_aux, train=False)
    np.testing.assert_allclose(np.asarray(out_device), np.asarray(out_host),
                               rtol=1e-5, atol=1e-5)


def test_plan_caps_match_model_formula():
    from dpcr_agb_tpu.models.minkowski import (DEFAULT_LEVEL_FRACS, _round8)
    plan = resnet_pyramid_plan(1, (1, 2, 2, 2), 4096, DEFAULT_LEVEL_FRACS)
    want = [_round8(int(4096 * DEFAULT_LEVEL_FRACS[min(
        l, len(DEFAULT_LEVEL_FRACS) - 1)])) for l in range(plan["n_levels"])]
    assert list(plan["caps"]) == want


@pytest.mark.slow
def test_dense_forward_matches_map_forward(rng):
    """Dense-grid execution == map execution on the same params (within caps
    generous enough that the map path drops nothing)."""
    from dpcr_agb_tpu.models.minkowski import build_resnet

    class _DS:
        num_reg_classes = 2
    common = {"activation": "gelu", "first_stride": 1, "global_pool": "sum",
              "drop_path": 0.0}
    net_map = build_resnet("SENet14", {**common, "extra_options": {
        "dense_dims": None, "level_caps": [64] * 5}}, _DS(), None)
    net_dense = build_resnet("SENet14", {**common, "extra_options": {
        "dense_dims": [16, 16, 16]}}, _DS(), None)
    from tests.test_voxel import TestSparseResNet
    b = TestSparseResNet()._batch(rng)  # coords in [0,16)
    variables = net_map.init(jax.random.PRNGKey(0), b, train=False)
    out_map = net_map.apply(variables, b, train=False)
    out_dense = net_dense.apply(variables, b, train=False)
    np.testing.assert_allclose(np.asarray(out_map), np.asarray(out_dense),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_kpconv_host_pyramid_matches_device(rng):
    """KPCNN forward with the native-C++ host pyramid (batch.aux) vs the
    on-device pyramid: same point sets/neighborhoods -> same pooled output
    (fp tolerance; tie-breaks at the radius boundary may differ)."""
    from dpcr_agb_tpu import native
    if not native.is_available():
        pytest.skip("native lib not built")
    from dpcr_agb_tpu.models.kpconv import KPCNN
    from dpcr_agb_tpu.models.factory import make_post_collate
    from tests.test_kpconv import TestKPCNN

    net = KPCNN(architecture=["simple", "resnetb", "resnetb_strided",
                              "resnetb", "global_sum"],
                num_reg_targets=2, in_features_dim=3,
                first_subsampling_dl=0.05, neighborhood_limits=[16, 16])
    b = TestKPCNN()._batch(rng, n=128)
    variables = net.init(jax.random.PRNGKey(0), b, train=False)
    out_device = net.apply(variables, b, train=False)
    post = make_post_collate(net)
    assert post is not None
    b_aux = post(b)
    assert "kp_conv0" in b_aux.aux
    out_host = net.apply(variables, b_aux, train=False)
    np.testing.assert_allclose(np.asarray(out_device), np.asarray(out_host),
                               rtol=2e-2, atol=2e-2)


class TestReverseLists:
    def test_reverse_lists_roundtrip(self, rng):
        from dpcr_agb_tpu.ops.host_pyramid import max_in_degree, reverse_lists
        nq, k, ns = 50, 6, 40
        nbr = rng.integers(0, ns + 1, (nq, k)).astype(np.int32)
        kr = max(8, max_in_degree(nbr, ns))
        rnbr = reverse_lists(nbr, ns, kr)
        e = nq * k
        # every real edge appears exactly once in its support's row
        seen = {}
        for j in range(ns):
            for eid in rnbr[j]:
                if eid == e:
                    continue
                q, kk = divmod(int(eid), k)
                assert nbr[q, kk] == j
                assert eid not in seen
                seen[eid] = j
        n_real = int((nbr < ns).sum())
        assert len(seen) == n_real

    def test_in_degree_overflow_raises(self, rng):
        from dpcr_agb_tpu.ops.host_pyramid import reverse_lists
        nbr = np.zeros((10, 4), np.int32)  # all edges hit support 0
        with pytest.raises(ValueError):
            reverse_lists(nbr, 5, 8)

    def test_rev_cap_ladder_covers_density_spikes(self):
        """_rev_cap picks the smallest ladder bucket >= max in-degree, so a
        support point referenced by many queries no longer crashes collate
        (the old fixed 2K cap raised ValueError mid-training)."""
        from dpcr_agb_tpu.ops.host_pyramid import (_rev_cap, max_in_degree,
                                                   reverse_lists)
        k = 4
        nbr = np.zeros((40, k), np.int32)  # in-degree 160 at support 0
        ns = 5
        assert max_in_degree(nbr, ns) == 160
        kr = _rev_cap({}, k, nbr, ns)
        assert kr >= 160
        rnbr = reverse_lists(nbr, ns, kr)  # must not raise
        assert (rnbr[0] < 40 * k).sum() == 160
        # explicit plan value still wins (and still asserts)
        assert _rev_cap({"rev_kr": 9}, k, nbr, ns) == 9


def test_kpconv_pyramid_cache_hits_on_identical_points(rng):
    """Eval-preset pyramid memoization: identical point sets reuse the
    cached pyramid; different points miss (ops/host_pyramid
    make_kpconv_post_collate)."""
    import dataclasses
    from dpcr_agb_tpu import native
    if not native.is_available():
        pytest.skip("native lib not built")
    from dpcr_agb_tpu.ops.host_pyramid import (kpconv_pyramid_plan,
                                               make_kpconv_post_collate)
    calls = []
    import dpcr_agb_tpu.ops.host_pyramid as hp
    real = hp.kpconv_pyramid_host

    def counting(pos, mask, plan):
        calls.append(1)
        return real(pos, mask, plan)

    plan_fn = lambda v0: kpconv_pyramid_plan(  # noqa: E731
        0.05, 2.5, 2, v0, (1.0, 0.5), (8, 8))

    @dataclasses.dataclass
    class B:
        pos: np.ndarray
        mask: np.ndarray
        aux: dict = None

    pos = rng.uniform(0, 1, (2, 64, 3)).astype(np.float32)
    mask = np.ones((2, 64), bool)
    hp.kpconv_pyramid_host = counting
    try:
        post = make_kpconv_post_collate(plan_fn)
        b1 = post(B(pos=pos, mask=mask))
        assert len(calls) == 2
        b2 = post(B(pos=pos, mask=mask))       # identical -> cache hit
        assert len(calls) == 2
        post(B(pos=pos + 0.01, mask=mask))     # different -> miss
        assert len(calls) == 4
    finally:
        hp.kpconv_pyramid_host = real
    for k in b1.aux:
        np.testing.assert_array_equal(b1.aux[k], b2.aux[k])
