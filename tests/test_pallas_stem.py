"""Parity: fused Pallas L0 stem forward (ops/pallas_stem.py) vs the dense
XLA conv3d and the production row path (ops/sparse_stem.py). Interpreter
mode on CPU; both grid layouts (x1 and xtile). Semantics under test:
MinkowskiConvolution stem math (reference SENet.py stem) — empty cells
read zeros, occupied rows match stem_conv_sparse_batch bit-for-bit at
f32."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpcr_agb_tpu.ops.pallas_stem import fused_stem_conv_volume
from dpcr_agb_tpu.ops.sparse_stem import (batched_rows,
                                          stem_conv_sparse_batch)


def _random_batch(rng, b, dims, n_occ, v_cap, cin):
    d, h, w = dims
    cs, ms, fs = [], [], []
    for _ in range(b):
        flat = rng.choice(d * h * w, size=n_occ, replace=False)
        coords = np.stack([flat // (h * w), (flat // w) % h, flat % w], 1)
        out = np.zeros((v_cap, 3), np.int32)
        out[:n_occ] = coords
        mask = np.arange(v_cap) < n_occ
        out[~mask] = coords[0]
        f = rng.normal(size=(v_cap, cin)).astype(np.float32)
        f[~mask] = 0.0
        cs.append(out), ms.append(mask), fs.append(f)
    return (jnp.asarray(np.stack(cs)), jnp.asarray(np.stack(ms)),
            jnp.asarray(np.stack(fs)))


def _dense_conv3d_oracle(coords, mask, feats, dims, w5):
    """XLA 3D cross-correlation over the scattered volume, SAME padding —
    the unmasked dense conv the fused kernel must reproduce everywhere."""
    from dpcr_agb_tpu.ops.sparse_stem import _scatter_to_dense_impl
    dense, _ = _scatter_to_dense_impl(coords, mask, feats, dims)
    return jax.lax.conv_general_dilated(
        dense, w5, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@pytest.mark.parametrize("td", [0, 6, -1])
@pytest.mark.parametrize("dims", [(12, 10, 9), (7, 13, 8)])
def test_fused_stem_matches_dense_conv3d(td, dims):
    k, cin, cout = 7, 3, 8
    if td > 0 and dims[0] % td:
        dims = (td * 2, dims[1], dims[2])
    rng = np.random.default_rng(3)
    coords, mask, feats = _random_batch(rng, 2, dims, 23, 32, cin)
    w = jnp.asarray(rng.normal(size=(k ** 3, cin, cout)) * 0.1, jnp.float32)
    vol, occ = fused_stem_conv_volume(
        coords, mask, feats, dims, w, k, compute_dtype=jnp.float32,
        ty=5, td=td, interpret=True)
    w5 = w.reshape(k, k, k, cin, cout)
    want = _dense_conv3d_oracle(coords, mask, feats, dims, w5)
    np.testing.assert_allclose(np.asarray(vol), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    assert vol.shape == want.shape


def test_fused_stem_rows_match_production_path():
    """Gathered at the occupied sites, the fused volume equals the
    production row stem (stem_conv_sparse_batch) exactly at f32."""
    k, cin, cout, dims = 7, 3, 16, (11, 9, 10)
    d, h, w_ = dims
    rng = np.random.default_rng(7)
    coords, mask, feats = _random_batch(rng, 3, dims, 29, 40, cin)
    w = jnp.asarray(rng.normal(size=(k ** 3, cin, cout)) * 0.1, jnp.float32)
    vol, _ = fused_stem_conv_volume(
        coords, mask, feats, dims, w, k, compute_dtype=jnp.float32,
        ty=3, td=0, interpret=True)
    rows_want = stem_conv_sparse_batch(coords, mask, feats, dims, w, k,
                                       compute_dtype=jnp.float32)
    b = coords.shape[0]
    flat = vol.reshape(b * d * h * w_, cout)
    idx = ((coords[..., 0] * h + coords[..., 1]) * w_ + coords[..., 2]
           + (jnp.arange(b, dtype=jnp.int32) * (d * h * w_))[:, None])
    rows_got = jnp.where(mask[..., None], batched_rows(flat, idx), 0.0)
    np.testing.assert_allclose(np.asarray(rows_got), np.asarray(rows_want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("dims", [(12, 10, 9), (7, 13, 8)])
def test_fused_stem_dma_layout_matches_dense_conv3d(dims):
    """The manual-DMA halo-slab layout (the only formulation that wins on
    chip) against the same conv3d oracle, incl. KC lane padding and x/y
    tile padding."""
    k, cin, cout = 7, 3, 8
    rng = np.random.default_rng(5)
    coords, mask, feats = _random_batch(rng, 2, dims, 23, 32, cin)
    w = jnp.asarray(rng.normal(size=(k ** 3, cin, cout)) * 0.1, jnp.float32)
    vol, _ = fused_stem_conv_volume(
        coords, mask, feats, dims, w, k, compute_dtype=jnp.float32,
        ty=4, td=5, dma=True, interpret=True)
    w5 = w.reshape(k, k, k, cin, cout)
    want = _dense_conv3d_oracle(coords, mask, feats, dims, w5)
    np.testing.assert_allclose(np.asarray(vol), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_fused_stem_bf16_close_to_f32_reference():
    """The production dtype (bf16 table, f32 MXU accumulate) stays within
    bf16 tolerance of the f32 oracle."""
    k, cin, cout, dims = 7, 3, 8, (10, 8, 9)
    rng = np.random.default_rng(11)
    coords, mask, feats = _random_batch(rng, 2, dims, 19, 24, cin)
    w = jnp.asarray(rng.normal(size=(k ** 3, cin, cout)) * 0.1, jnp.float32)
    vol, _ = fused_stem_conv_volume(
        coords, mask, feats, dims, w, k, compute_dtype=jnp.bfloat16,
        ty=4, td=0, interpret=True)
    w5 = w.reshape(k, k, k, cin, cout)
    want = _dense_conv3d_oracle(coords, mask, feats, dims, w5)
    np.testing.assert_allclose(np.asarray(vol, np.float32),
                               np.asarray(want), rtol=0.1, atol=0.05)
