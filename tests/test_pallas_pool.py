"""Parity of the Pallas fused max pool (ops/pallas_pool.py) against the
XLA reduce_window/select_and_scatter path (ops/dense_grid.dense_max_pool)
in interpreter mode — forward values AND routed gradients, on shapes that
exercise the edge clamps (odd/even extents, empty planes, holes)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpcr_agb_tpu.ops.dense_grid import dense_max_pool, occupancy_pool
from dpcr_agb_tpu.ops.pallas_pool import pallas_max_pool


def _case(shape, occ_p, seed, dtype=jnp.float32):
    b, d, h, w, c = shape
    rng = np.random.default_rng(seed)
    # distinct values (tie semantics differ across pool backends)
    x = rng.permutation(b * d * h * w * c).astype(np.float64)
    x = ((x / x.size) * 8 - 4).reshape(shape).astype(np.float32)
    occ = (rng.random((b, d, h, w, 1)) < occ_p).astype(np.float32)
    x = x * occ
    xs = jnp.asarray(x, dtype)
    occ = jnp.asarray(occ, dtype)
    occ_l = occupancy_pool(occ)
    return xs, occ, occ_l


@pytest.mark.parametrize("shape,occ_p", [
    ((2, 8, 8, 8, 8), 0.15),       # even dims, sparse
    ((1, 7, 9, 6, 16), 0.4),       # odd D/H (edge clamps)
    ((2, 6, 6, 8, 8), 0.9),        # near-dense
])
def test_pallas_pool_forward_parity(shape, occ_p):
    x, occ, occ_l = _case(shape, occ_p, seed=0)
    ref = dense_max_pool(x, occ, occ_l)
    got = pallas_max_pool(x, occ, occ_l, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=0)


@pytest.mark.parametrize("shape,occ_p", [
    ((2, 8, 8, 8, 8), 0.15),
    ((1, 7, 9, 6, 16), 0.4),
    ((2, 6, 6, 8, 8), 0.9),
])
def test_pallas_pool_gradient_parity(shape, occ_p):
    x, occ, occ_l = _case(shape, occ_p, seed=1)
    ct_w = jnp.asarray(
        np.random.default_rng(2).normal(size=occ_l.shape[:-1] + (x.shape[-1],)
                                        ).astype(np.float32))

    def loss_ref(xi):
        return jnp.sum(dense_max_pool(xi, occ, occ_l) * ct_w)

    def loss_pl(xi):
        return jnp.sum(pallas_max_pool(xi, occ, occ_l, True) * ct_w)

    g_ref = jax.grad(loss_ref)(x)
    g_pl = jax.grad(loss_pl)(x)
    # distinct inputs -> no ties -> routing must match exactly
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               rtol=0, atol=1e-6)


def test_pallas_pool_bf16_and_empty_sample():
    """bf16 path + a sample with zero occupancy (all-empty volume)."""
    x, occ, occ_l = _case((2, 8, 6, 8, 8), 0.2, seed=3, dtype=jnp.bfloat16)
    occ = occ.at[1].set(0.0)
    x = x * occ
    occ_l = occupancy_pool(occ)
    ref = dense_max_pool(x, occ, occ_l)
    got = pallas_max_pool(x, occ, occ_l, True)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref, np.float32))
    assert not np.isnan(np.asarray(got, np.float32)).any()


def test_pallas_pool_matches_model_shape_slice():
    """A thin slice of the bench shape (D=88 planes would be slow in
    interpret mode): checks the index maps at real H/W extents."""
    x, occ, occ_l = _case((1, 6, 22, 20, 8), 0.05, seed=4)
    ref = dense_max_pool(x, occ, occ_l)
    got = pallas_max_pool(x, occ, occ_l, True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
