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
    pytest.param((1, 7, 9, 6, 16), 0.4, marks=pytest.mark.slow),
    pytest.param((2, 6, 6, 8, 8), 0.9, marks=pytest.mark.slow),
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


def _tie_free_bf16_case(shape, occ_p, seed):
    """bf16 values distinct within every 3^3 window and bf16-exact:
    v = (d%3)*9 + (h%3)*3 + (w%3) + 1 in [1, 27] — two cells in one
    window differ by 1..2 (non-multiple of 3) in some axis, so their
    mod-3 tuples differ. Integers <= 27 are exact in bf16, so bf16
    rounding cannot create ties (unlike random floats)."""
    b, d, h, w, c = shape
    rng = np.random.default_rng(seed)
    dd, hh, ww = np.meshgrid(np.arange(d), np.arange(h), np.arange(w),
                             indexing="ij")
    v = ((dd % 3) * 9 + (hh % 3) * 3 + (ww % 3) + 1).astype(np.float32)
    x = np.broadcast_to(v[None, ..., None], shape).copy()
    occ = (rng.random((b, d, h, w, 1)) < occ_p).astype(np.float32)
    x = x * occ
    xs = jnp.asarray(x, jnp.bfloat16)
    occ = jnp.asarray(occ, jnp.bfloat16)
    return xs, occ, occupancy_pool(occ)


@pytest.mark.slow
@pytest.mark.parametrize("shape,occ_p", [
    ((2, 8, 8, 8, 8), 0.15),
    ((1, 7, 10, 6, 8), 0.4),
])
def test_pallas_pool_bf16_gradient_parity_tie_free(shape, occ_p):
    """bf16 gradient routing parity, tie-free by construction. Exact
    bit parity with select_and_scatter is impossible in bf16: cells
    covered by several output windows accumulate cotangents, which the
    Pallas backward sums in f32 and rounds ONCE while XLA accumulates in
    bf16 — a 1-2 ulp (<=1%) difference in the Pallas kernel's favor;
    partially-cancelling multi-window contributions make the RELATIVE
    error unbounded while the absolute error stays at the bf16 ulp of
    the N(0,1) cotangent scale, hence the absolute tolerance. Verified
    on real TPU 2026-08-19 (device parity run: fwd bit-exact, bwd
    within these tolerances at these exact shapes)."""
    x, occ, occ_l = _tie_free_bf16_case(shape, occ_p, seed=0)
    ct_w = jnp.asarray(
        np.random.default_rng(2).normal(
            size=occ_l.shape[:-1] + (x.shape[-1],)).astype(np.float32))

    def loss(pool, xi):
        return jnp.sum(pool(xi).astype(jnp.float32) * ct_w)

    g_ref = jax.grad(
        lambda xi: loss(lambda z: dense_max_pool(z, occ, occ_l), xi))(x)
    g_pl = jax.grad(
        lambda xi: loss(lambda z: pallas_max_pool(z, occ, occ_l, True),
                        xi))(x)
    np.testing.assert_allclose(np.asarray(g_pl, np.float32),
                               np.asarray(g_ref, np.float32),
                               rtol=2e-2, atol=1e-2)


def test_pallas_pool_matches_model_shape_slice():
    """A thin slice of the bench shape (D=88 planes would be slow in
    interpret mode): checks the index maps at real H/W extents."""
    x, occ, occ_l = _case((1, 6, 22, 20, 8), 0.05, seed=4)
    ref = dense_max_pool(x, occ, occ_l)
    got = pallas_max_pool(x, occ, occ_l, True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
