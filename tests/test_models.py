"""Model-layer tests: loss functions vs torch oracles, double-batch loss math,
target normalization from dataset stats, MPointNet forward + overfit."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dpcr_agb_tpu.data.batch import Batch
from dpcr_agb_tpu.models.base import (InstanceSpec, build_instance_spec,
                                      compute_reg_loss, convert_outputs,
                                      l1, l2, mape, reg_output, smape, smoothl1)
from dpcr_agb_tpu.models.pointnet import MPointNet


def _spec(T=2, **kw):
    d = dict(num_reg_targets=T, scale=np.ones(T, np.float32),
             center=np.zeros(T, np.float32), weights=np.ones(T, np.float32))
    d.update(kw)
    return InstanceSpec(**d)


class TestLosses:
    def test_elementwise_vs_torch(self, rng):
        x = rng.normal(size=(16, 2)).astype(np.float32) * 2
        y = rng.normal(size=(16, 2)).astype(np.float32) * 2
        tx, ty = torch.from_numpy(x), torch.from_numpy(y)
        np.testing.assert_allclose(
            np.asarray(smoothl1(x, y)),
            F.smooth_l1_loss(tx, ty, reduction="none").numpy(), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(l2(x, y)), F.mse_loss(tx, ty, reduction="none").numpy(),
            atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(l1(x, y)), F.l1_loss(tx, ty, reduction="none").numpy(),
            atol=1e-6)

    def test_mape_zero_targets(self):
        y = np.array([[0.0, 2.0]], np.float32)
        x = np.array([[5.0, 1.0]], np.float32)
        out = np.asarray(mape(x, y))
        np.testing.assert_allclose(out, [[0.0, 0.5]], atol=1e-6)

    def test_smape_eps(self):
        out = np.asarray(smape(np.zeros((1, 1), np.float32),
                               np.zeros((1, 1), np.float32)))
        assert np.isfinite(out).all() and out[0, 0] == 0.0


class TestRegLoss:
    def test_standardization_and_masking(self):
        spec = _spec(scale=np.array([2.0, 4.0], np.float32),
                     center=np.array([1.0, -1.0], np.float32))
        y = np.array([[3.0, np.nan], [5.0, 7.0]], np.float32)
        mask = ~np.isnan(y)
        out = np.array([[1.0, 99.0], [0.0, 2.0]], np.float32)  # standardized
        loss = float(compute_reg_loss(spec, jnp.asarray(out), jnp.asarray(y),
                                      jnp.asarray(mask), training=False))
        # labels: (3-1)/2=1, (5-1)/2=2, (7+1)/4=2; diffs 0, 2, 0
        expected = np.mean([0.0, 2.0 - 0.5, 0.0])  # smoothl1 over 3 valid
        np.testing.assert_allclose(loss, expected, rtol=1e-6)

    def test_double_batch_pairs(self):
        spec = _spec(T=1, double_batch=True)
        y = np.array([[1.0], [1.0], [2.0], [2.0]], np.float32)
        mask = np.ones_like(y, bool)
        out = np.array([[1.0], [3.0], [2.0], [2.0]], np.float32)
        loss = float(compute_reg_loss(spec, jnp.asarray(out), jnp.asarray(y),
                                      jnp.asarray(mask), training=True))
        # pair1: 0.5*sl1(0) + 0.5*sl1(2) = 0.5*1.5 ; pair2: 0
        np.testing.assert_allclose(loss, 0.75 / 2, rtol=1e-6)

    def test_weights_mean_multiplier(self):
        spec = _spec(T=2, weights=np.array([1.0, 3.0], np.float32))
        y = np.zeros((2, 2), np.float32)
        out = np.ones((2, 2), np.float32) * 2.0
        loss = float(compute_reg_loss(spec, jnp.asarray(out), jnp.asarray(y),
                                      jnp.asarray(np.ones_like(y, bool)),
                                      training=False))
        np.testing.assert_allclose(loss, 2.0 * 1.5, rtol=1e-6)  # mean(w)=2


class TestOutputs:
    def test_reg_output_destandardizes(self):
        spec = _spec(T=1, scale=np.array([10.0], np.float32),
                     center=np.array([5.0], np.float32),
                     report_activation="relu")
        out = reg_output(spec, jnp.asarray([[-1.0], [0.5]], jnp.float32))
        np.testing.assert_allclose(np.asarray(out), [[0.0], [10.0]])

    def test_convert_outputs_activation(self):
        spec = _spec(T=1, out_activation="relu")
        raw = jnp.asarray([[-3.0], [2.0]], jnp.float32)
        np.testing.assert_allclose(np.asarray(convert_outputs(spec, raw)),
                                   [[0.0], [2.0]])


class _FakeDataset:
    """Minimal stats surface for build_instance_spec."""
    targets = {
        "BMag_ha": {"task": "regression"},
        "V_ha": {"task": "regression", "scale_mult": 2.0},
    }
    reg_targets_idx = [True, True]
    double_batch = False

    def get_mean_targets(self):
        return {"total": {"train": np.array([100.0, 200.0])},
                "a1": {"train": np.array([110.0, 220.0])}}

    def get_std_targets(self):
        return {"total": {"train": np.array([10.0, 20.0])},
                "a1": {"train": np.array([12.0, 24.0])}}

    def get_min_targets(self):
        return {"total": {"train": np.array([0.0, 0.0])}}

    def get_max_targets(self):
        return {"total": {"train": np.array([500.0, 900.0])}}


def test_build_instance_spec_standard():
    spec = build_instance_spec(_FakeDataset(), {"reg_loss_fn": "smoothl1,l2"})
    np.testing.assert_allclose(spec.center, [105.0, 210.0])
    np.testing.assert_allclose(spec.scale, [11.0, 2 * 22.0])
    assert spec.loss_names == ("smoothl1", "l2")


def _tiny_batch(rng, bs=8, n=64, c=2, T=1):
    pos = rng.normal(size=(bs, n, 3)).astype(np.float32)
    x = rng.normal(size=(bs, n, c)).astype(np.float32)
    mask = np.ones((bs, n), bool)
    mask[:, n // 2:] = False
    # target correlated with mean z of valid points -> learnable
    y = (pos[:, : n // 2, 2].mean(1, keepdims=True) * 3 + 1).astype(np.float32)
    return Batch(pos=jnp.asarray(pos), x=jnp.asarray(x), mask=jnp.asarray(mask),
                 y_reg=jnp.asarray(y), y_reg_mask=jnp.ones((bs, T), bool),
                 area_idx=jnp.zeros(bs, jnp.int32),
                 label_idx=jnp.arange(bs, dtype=jnp.int64),
                 is_double=jnp.zeros(bs, bool))


class TestMPointNet:
    def test_forward_shapes_and_padding_invariance(self, rng):
        net = MPointNet(num_reg_targets=2, embedding_channel=64)
        b = _tiny_batch(rng)
        variables = net.init(jax.random.PRNGKey(0), b, train=False)
        out = net.apply(variables, b, train=False)
        assert out.shape == (8, 2)
        # corrupting padded rows must not change the output
        b2 = dataclasses.replace(b, x=b.x.at[:, 40:].set(1e6),
                                 pos=b.pos.at[:, 40:].set(-1e6))
        out2 = net.apply(variables, b2, train=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-4)

    @pytest.mark.slow
    def test_overfits_tiny_problem(self, rng):
        import optax
        from dpcr_agb_tpu.models.base import compute_reg_loss as crl
        net = MPointNet(num_reg_targets=1, embedding_channel=32,
                        global_pool="mean")
        spec = _spec(T=1)
        b = _tiny_batch(rng)
        variables = net.init(jax.random.PRNGKey(0), b, train=False)
        params, stats = variables["params"], variables["batch_stats"]
        tx = optax.adam(1e-2)
        opt = tx.init(params)

        @jax.jit
        def step(params, stats, opt):
            def loss_fn(p):
                raw, mut = net.apply({"params": p, "batch_stats": stats}, b,
                                     train=True, mutable=["batch_stats"],
                                     rngs={"dropout": jax.random.PRNGKey(1)})
                return crl(spec, raw, b.y_reg, b.y_reg_mask, True), mut
            (loss, mut), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            upd, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, upd), mut["batch_stats"], opt, loss

        losses = []
        for _ in range(60):
            params, stats, opt, loss = step(params, stats, opt)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.3, losses[::10]


@pytest.mark.slow
def test_dense_path_stays_bf16_end_to_end(rng):
    """Regression guard for the silent f32 promotions that halved the
    usable batch size (python-float reduce_window init; f32 bias adds):
    with bf16 enabled, the dense forward's big intermediates must be bf16.
    Checked via the traced jaxpr of the full apply."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dpcr_agb_tpu.models.minkowski import build_resnet
    from dpcr_agb_tpu.data.batch import Batch

    class _DS:
        num_reg_classes = 2

    net = build_resnet("SENet14", {
        "activation": "gelu", "first_stride": 1, "global_pool": "sum",
        "extra_options": {"bf16": True, "dense_dims": [16, 16, 16]},
    }, _DS())
    v = 64
    coords = rng.integers(0, 16, (1, v, 3)).astype(np.int32)
    batch = Batch(pos=jnp.zeros((1, v, 3)), x=jnp.ones((1, v, 3)),
                  mask=jnp.ones((1, v), bool),
                  coords=jnp.asarray(coords),
                  y_reg=jnp.zeros((1, 2)), y_reg_mask=jnp.ones((1, 2), bool),
                  area_idx=jnp.zeros(1, jnp.int32),
                  label_idx=jnp.zeros(1, jnp.int64),
                  is_double=jnp.zeros(1, bool))
    variables = net.init(jax.random.PRNGKey(0), batch, train=False)
    jaxpr = jax.make_jaxpr(
        lambda vs, b: net.apply(vs, b, train=False))(variables, batch)
    # every 5D volume tensor flowing through the dense path must be bf16 —
    # an f32 one means a promotion crept back in
    f32_volumes = [
        v_.aval for eqn in jaxpr.eqns for v_ in eqn.outvars
        if hasattr(v_, "aval") and getattr(v_.aval, "ndim", 0) == 5
        and v_.aval.dtype == jnp.float32
        and v_.aval.shape[-1] >= 8       # ignore occupancy/indicator volumes
        and np.prod(v_.aval.shape[1:4]) > 8  # ignore the tiny f32 head cast
    ]
    assert not f32_volumes, f32_volumes[:5]


class TestExportAux:
    """export_aux (models/factory.py): the static aux baked into StableHLO
    artifacts. The dense path must get the FULL z extent (a post_collate
    probe would pick the smallest z bucket and crop tall plots at serving
    time); input-dependent-aux models must be rejected."""

    def _resnet(self, dense_dims):
        from dpcr_agb_tpu.models.minkowski import build_resnet

        class _DS:
            num_reg_classes = 2

        return build_resnet("SENet14", {
            "activation": "gelu", "first_stride": 1, "global_pool": "sum",
            "extra_options": {"dense_dims": dense_dims}}, _DS())

    def test_dense_path_bakes_full_z_extent(self):
        from dpcr_agb_tpu.models.factory import export_aux
        aux = export_aux(self._resnet((24, 24, 104)))
        assert aux["zcells"].shape == (104,)

    def test_map_mode_rejected(self):
        from dpcr_agb_tpu.models.factory import export_aux
        with pytest.raises(ValueError, match="predict.py"):
            export_aux(self._resnet(None))

    def test_kpconv_rejected(self):
        from dpcr_agb_tpu.models.factory import export_aux
        from dpcr_agb_tpu.models.kpconv import KPCNN
        net = KPCNN(architecture=["simple", "global_sum"],
                    num_reg_targets=2, in_features_dim=1)
        with pytest.raises(ValueError, match="predict.py"):
            export_aux(net)

    def test_point_model_none(self):
        from dpcr_agb_tpu.models.factory import export_aux
        from dpcr_agb_tpu.models.pointnet import MPointNet
        assert export_aux(MPointNet(num_reg_targets=2)) is None
