"""Wire-compaction codec (data/batch.encode_wire + training/step.decode_wire):
the H2D payload shrink must be bit-invisible to the jitted step.

Reference context: the torch pipeline ships full-precision tensors per batch
(base_dataset.py dataloaders); on our remote-TPU transport the measured H2D
rate is 20-35 MB/s (docs/experiments/round3/sweep4.log), so wire bytes gate
e2e throughput — but correctness must not depend on the encoding.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from __graft_entry__ import _example_batch, _flagship
from dpcr_agb_tpu.data.batch import PAD_COORD, Batch, encode_wire
from dpcr_agb_tpu.models.base import InstanceSpec
from dpcr_agb_tpu.training.step import StepRunner, decode_wire


def _host_batch(bs=2, n_voxels=1024, grid=32, seed=3):
    b = _example_batch(bs=bs, n_voxels=n_voxels, grid=grid, seed=seed)
    return jax.tree.map(lambda l: np.asarray(l), b)


def test_encode_wire_fields():
    b = _host_batch()
    e = encode_wire(b, drop_pos=True, x_dtype=jnp.bfloat16)
    assert e.pos is None
    assert np.asarray(e.coords).dtype == np.int16
    assert np.asarray(e.x).dtype == jnp.bfloat16
    # PAD_COORD (-2^20) clips into int16 range but stays out-of-volume
    b2 = dataclasses.replace(
        b, coords=np.where(np.asarray(b.mask)[..., None],
                           np.asarray(b.coords), PAD_COORD))
    e2 = encode_wire(b2)
    pad_rows = ~np.asarray(b.mask)
    assert (np.asarray(e2.coords)[pad_rows] < 0).all()
    # valid coords survive exactly
    ok = np.asarray(b.mask)
    np.testing.assert_array_equal(np.asarray(e2.coords)[ok],
                                  np.asarray(b.coords)[ok])


def test_decode_wire_roundtrip():
    b = _host_batch()
    e = encode_wire(b, drop_pos=False, x_dtype=jnp.bfloat16)
    d = decode_wire(jax.tree.map(jnp.asarray, e))
    assert d.coords.dtype == jnp.int32
    assert d.x.dtype == jnp.float32
    # bf16 -> f32 -> bf16 is exact: decoded x re-cast to bf16 matches the
    # direct f32 -> bf16 cast the model performs on the raw batch
    np.testing.assert_array_equal(
        np.asarray(d.x.astype(jnp.bfloat16)),
        np.asarray(jnp.asarray(b.x).astype(jnp.bfloat16)))


@pytest.mark.slow
def test_step_bit_identical_encoded_vs_raw():
    """One full train step (SENet14 sparse path, the production wire user)
    must produce the same loss/outputs from the encoded batch as from the
    raw one."""
    net = _flagship(dense_dims=(32, 32, 32))
    spec = InstanceSpec(
        num_reg_targets=2, scale=np.array([50.0, 80.0], np.float32),
        center=np.array([100.0, 150.0], np.float32),
        weights=np.array([0.5, 0.5], np.float32))
    tx = optax.adam(1e-3)
    runner = StepRunner(net=net, spec=spec, tx=tx, mesh=None, seed=0)
    assert runner._wire_drop_pos and runner._wire_x_dtype == jnp.bfloat16

    host = _host_batch(bs=2, n_voxels=1024, grid=32)
    state = runner.init_state(host)
    _, out_raw = runner.train(state, host)

    placed = runner.device_put(host)              # encodes (DPCR_WIRE on)
    assert placed.pos is None
    assert placed.coords.dtype == jnp.int16
    state2 = runner.init_state(host)
    _, out_enc = runner.train(state2, placed)

    np.testing.assert_array_equal(np.asarray(out_raw["loss"]),
                                  np.asarray(out_enc["loss"]))
    np.testing.assert_array_equal(np.asarray(out_raw["reg_out"]),
                                  np.asarray(out_enc["reg_out"]))


def test_device_put_keep_pos():
    net = _flagship(dense_dims=(32, 32, 32))
    spec = InstanceSpec(
        num_reg_targets=2, scale=np.array([50.0, 80.0], np.float32),
        center=np.array([100.0, 150.0], np.float32),
        weights=np.array([0.5, 0.5], np.float32))
    runner = StepRunner(net=net, spec=spec, tx=optax.adam(1e-3), mesh=None)
    host = _host_batch()
    placed = runner.device_put(host, keep_pos=True)
    assert placed.pos is not None                 # visualizer contract
    assert placed.coords.dtype == jnp.int16       # still compacted


def test_out_of_volume_semantics_preserved():
    """Coords beyond the int16 clip range must still be dropped by the
    scatter exactly like their unclipped originals."""
    from dpcr_agb_tpu.ops.sparse_stem import scatter_to_dense_batch
    rng = np.random.default_rng(0)
    coords = rng.integers(0, 8, size=(1, 32, 3)).astype(np.int32)
    coords[0, 0] = [PAD_COORD] * 3
    coords[0, 1] = [100000, 2, 2]                 # absurd OOB positive
    mask = np.ones((1, 32), bool)
    feats = rng.normal(size=(1, 32, 2)).astype(np.float32)
    dims = (8, 8, 8)
    dense_raw, occ_raw = scatter_to_dense_batch(
        jnp.asarray(coords), jnp.asarray(mask), jnp.asarray(feats), dims)
    clipped = np.clip(coords, -2 ** 15, 2 ** 15 - 1).astype(np.int16)
    dense_enc, occ_enc = scatter_to_dense_batch(
        jnp.asarray(clipped).astype(jnp.int32), jnp.asarray(mask),
        jnp.asarray(feats), dims)
    np.testing.assert_array_equal(np.asarray(dense_raw),
                                  np.asarray(dense_enc))
    np.testing.assert_array_equal(np.asarray(occ_raw), np.asarray(occ_enc))
