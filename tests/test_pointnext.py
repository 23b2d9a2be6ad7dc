"""PointNeXt/PointNet model tests: forward shapes, padding invariance,
gradient flow, factory wiring."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpcr_agb_tpu.data.batch import Batch
from dpcr_agb_tpu.models.pointnext import (PointNetEncoderModel, PointNext,
                                           build_pointnext)


def _batch(rng, bs=2, n=128, c=3, T=2):
    pos = np.full((bs, n, 3), 1e6, np.float32)
    mask = np.zeros((bs, n), bool)
    x = np.zeros((bs, n, c), np.float32)
    for b in range(bs):
        nv = n - 20 - 20 * b
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


class _DS:
    num_reg_classes = 2
    feature_dimension = 3


@pytest.mark.parametrize(
    "arch",
    [pytest.param("pointnext_s", marks=pytest.mark.slow), "pointnet"])
def test_forward_shapes(rng, arch):
    net = build_pointnext({"arch": arch, "radius": 0.1, "stride": 2,
                           "nsample": 8, "num_points": 0}, _DS())
    b = _batch(rng)
    variables = net.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(1)}, b, train=False)
    out = net.apply(variables, b, train=False)
    assert out.shape == (2, 2)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_padding_invariance(rng):
    net = PointNext(num_reg_targets=2, strides=(1, 2, 2, 2, 2, 1),
                    radius=0.15, nsample=8, num_points=0, dropout=0.0)
    b = _batch(rng)
    variables = net.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(1)}, b, train=False)
    out = net.apply(variables, b, train=False)
    b2 = dataclasses.replace(b, x=b.x.at[:, -10:].set(77.0))
    out2 = net.apply(variables, b2, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-4,
                               atol=1e-4)


@pytest.mark.slow
def test_gradients_flow(rng):
    net = PointNext(num_reg_targets=1, strides=(1, 2, 2, 2, 2, 1),
                    radius=0.15, nsample=8, num_points=0, dropout=0.0)
    b = _batch(rng)
    variables = net.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(1)}, b, train=False)

    def loss(params):
        out, _ = net.apply(
            {"params": params, "batch_stats": variables["batch_stats"]}, b,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.sum(jnp.square(out))

    g = jax.grad(loss)(variables["params"])
    total = sum(float(jnp.abs(l).sum())
                for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_fps_subsampling_path(rng):
    net = PointNetEncoderModel(num_reg_targets=2, num_points=64, dropout=0.0)
    b = _batch(rng, n=128)
    variables = net.init({"params": jax.random.PRNGKey(0),
                          "dropout": jax.random.PRNGKey(1)}, b, train=False)
    out = net.apply(variables, b, train=False)
    assert out.shape == (2, 2)
