"""Data-parallel mesh behavior: batch-local op layout and the compiled
program's collective inventory (SURVEY.md §2.10/§5.8 — the DataParallel
equivalent must ride gradient psums, not table-sized transfers)."""
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpcr_agb_tpu.ops import layout


@pytest.fixture
def batch_local(monkeypatch):
    monkeypatch.setattr(layout, "BATCH_LOCAL", True)
    monkeypatch.setattr(layout, "DATA_PARALLEL_DEGREE", 8)
    yield


def _sites(seed, dims, n_occ, cap):
    rng = np.random.default_rng(seed)
    d, h, w = dims
    flat = rng.choice(d * h * w, size=n_occ, replace=False)
    c = np.stack([flat // (h * w), (flat // w) % h, flat % w], 1)
    out = np.zeros((cap, 3), np.int32)
    out[:n_occ] = c
    return jnp.asarray(out), jnp.asarray(np.arange(cap) < n_occ)


@pytest.mark.slow
def test_batch_local_ops_match_flat(batch_local):
    """Every dispatched op is EXACT under the vmapped per-sample layout."""
    from dpcr_agb_tpu.ops import sparse_stem as ss
    dims = (10, 9, 8)
    cs, ms = zip(*[_sites(70 + i, dims, 25, 40) for i in range(4)])
    coords, mask = jnp.stack(cs), jnp.stack(ms)
    rng = np.random.default_rng(3)
    feats = jnp.where(mask[..., None],
                      jnp.asarray(rng.normal(size=(4, 40, 3)), jnp.float32),
                      0.0)
    w = jnp.asarray(rng.normal(size=(343, 3, 6)) * 0.1, jnp.float32)

    from dpcr_agb_tpu.ops.voxel import build_grid, downsample
    g1 = jax.vmap(lambda c, m: downsample(build_grid(c, m), None, 2,
                                          40)[0])(coords, mask)
    h64 = jnp.where(mask[..., None],
                    jnp.asarray(rng.normal(size=(4, 40, 6)), jnp.float32), 0.0)

    def run_all():
        y = ss.stem_conv_sparse_batch(coords, mask, feats, dims, w, 7)
        d, o = ss.scatter_to_dense_batch(coords, mask, feats, dims)
        p, po = ss.scatter_max_pool_batch(coords, mask, h64, dims)
        nbr = ss.pool_neighbor_map_batch(coords, mask, g1.coords, g1.mask,
                                         dims)
        mp = ss.max_pool_sparse(h64, nbr, g1.mask)
        return y, d, o, p, po, nbr, mp

    assert layout.BATCH_LOCAL
    got = run_all()
    layout.BATCH_LOCAL = False
    want = run_all()
    layout.BATCH_LOCAL = True

    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                               rtol=1e-6, atol=1e-6)
    for g_, w_ in zip(got[1:], want[1:]):
        np.testing.assert_array_equal(np.asarray(g_), np.asarray(w_))


def _kpconv_mesh_case(bs=16, n=256):
    """Tiny KPCNN + host-pyramid batch for mesh tests (same recipe as the
    trainer's make_kpconv_post_collate, shapes shrunk)."""
    from dpcr_agb_tpu.data.batch import Batch
    from dpcr_agb_tpu.models.kpconv import KPCNN
    from dpcr_agb_tpu.ops.host_pyramid import (kpconv_pyramid_host,
                                               kpconv_pyramid_plan)

    rng = np.random.default_rng(11)
    pos = rng.uniform(-0.5, 0.5, (bs, n, 3)).astype(np.float32)
    mask = np.ones((bs, n), bool)
    x = rng.standard_normal((bs, n, 3)).astype(np.float32)
    plan = kpconv_pyramid_plan(0.05, 2.5, 2, n, (1.0, 0.5), [8, 8])
    per = [kpconv_pyramid_host(pos[i], mask[i], plan) for i in range(bs)]
    aux = {k: np.stack([p[k] for p in per]) for k in per[0]}
    y = rng.normal(size=(bs, 2)).astype(np.float32) * 50 + 100
    batch = Batch(pos=jnp.asarray(pos), x=jnp.asarray(x),
                  mask=jnp.asarray(mask), y_reg=jnp.asarray(y),
                  y_reg_mask=jnp.ones((bs, 2), bool),
                  area_idx=jnp.zeros(bs, jnp.int32),
                  label_idx=jnp.arange(bs, dtype=jnp.int64),
                  is_double=jnp.zeros(bs, bool),
                  aux={k: jnp.asarray(v) for k, v in aux.items()})
    net = KPCNN(architecture=['simple', 'resnetb', 'resnetb_strided',
                              'resnetb', 'global_sum'],
                num_reg_targets=2, in_features_dim=3, first_features_dim=16,
                num_kernel_points=15, first_subsampling_dl=0.05)
    return net, batch


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["senet14_sparse_l0", "senet14_dense_l0",
                                  "kpconv"])
def test_mesh_step_collectives_are_gradient_sized(kind, monkeypatch):
    """The compiled 8-device train step's collectives must all be
    parameter-gradient sized — a table-sized all-reduce/all-gather means
    GSPMD replicated a batch-flattened scatter/gather table (the round-2
    bug this guards against: a [B*D*H*W, C] all-reduce per step).
    Parametrized over all three flagship execution paths (VERDICT r2 #7):
    the sparse-L0 SENet14 default, the dense-L0 fallback, and the KPConv
    host-pyramid model."""
    import optax

    from __graft_entry__ import _example_batch, _flagship
    from dpcr_agb_tpu.models.base import InstanceSpec
    from dpcr_agb_tpu.ops import dense_grid
    from dpcr_agb_tpu.parallel.mesh import make_mesh, shard_batch
    from dpcr_agb_tpu.training.optim import (
        adabelief, cosine_annealing_warm_restarts)
    from dpcr_agb_tpu.training.step import StepRunner

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual platform")
    mesh = make_mesh(8)
    if kind == "kpconv":
        net, batch = _kpconv_mesh_case()
        batch = shard_batch(mesh, batch)
    else:
        monkeypatch.setattr(
            dense_grid, "L0_MODE",
            "sparse" if kind == "senet14_sparse_l0" else "dense")
        net = _flagship(dense_dims=(16, 16, 16))
        batch = shard_batch(mesh,
                            _example_batch(bs=16, n_voxels=512, grid=16))
    spec = InstanceSpec(
        num_reg_targets=2, scale=np.array([50.0, 80.0], np.float32),
        center=np.array([100.0, 150.0], np.float32),
        weights=np.array([0.5, 0.5], np.float32))
    tx = optax.chain(optax.clip(100.0),
                     adabelief(cosine_annealing_warm_restarts(5e-3, 10, 2),
                               weight_decay=1e-2))
    runner = StepRunner(net=net, spec=spec, tx=tx, mesh=mesh, seed=0)
    state = runner.init_state(batch)
    hlo = runner._train_step.lower(
        state.params, state.batch_stats, state.opt_state, batch,
        np.int32(0)).compile().as_text()

    max_param = max(x.size for x in jax.tree.leaves(state.params))
    offenders = []
    for line in hlo.splitlines():
        for op in ("all-gather", "all-reduce", "collective-permute",
                   "all-to-all"):
            if op in line and "=" in line:
                m = re.search(r"\[([0-9,]+)\]", line)
                if not m:
                    continue
                n = 1
                for x in m.group(1).split(","):
                    n *= int(x)
                if n > max_param:
                    offenders.append((n, line.strip()[:120]))
    assert not offenders, offenders[:5]

    # and the step still runs
    state, out = runner.train(state, batch)
    assert np.isfinite(float(out["loss"]))


def test_layout_flags_do_not_leak_across_runners():
    """ops/layout.py flags are process-global and read at trace time; a
    second StepRunner (e.g. an in-process predict/calibrate runner without
    a mesh) must not flip the layout for an existing mesh runner's future
    retraces — each dispatch re-asserts its own layout."""
    import optax

    from dpcr_agb_tpu.models.base import InstanceSpec
    from dpcr_agb_tpu.models.pointnet import MPointNet
    from dpcr_agb_tpu.ops import layout
    from dpcr_agb_tpu.parallel.mesh import make_mesh, shard_batch
    from dpcr_agb_tpu.training.step import StepRunner
    from __graft_entry__ import _example_batch

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual platform")
    spec = InstanceSpec(
        num_reg_targets=2, scale=np.ones(2, np.float32),
        center=np.zeros(2, np.float32), weights=np.full(2, 0.5, np.float32))
    tx = optax.sgd(1e-3)
    net = MPointNet(num_reg_targets=2)
    mesh_runner = StepRunner(net=net, spec=spec, tx=tx, mesh=make_mesh(8))
    assert layout.BATCH_LOCAL is True
    # constructing a non-mesh runner flips the globals ...
    solo_runner = StepRunner(net=net, spec=spec, tx=tx, mesh=None)
    assert layout.BATCH_LOCAL is False
    # ... but any mesh-runner dispatch (incl. a retrace on a NEW bucket
    # shape) re-asserts the batch-local layout first
    batch = shard_batch(mesh_runner.mesh,
                        _example_batch(bs=8, n_voxels=256, grid=16))
    state = mesh_runner.init_state(batch)
    state, out = mesh_runner.train(state, batch)
    assert layout.BATCH_LOCAL is True and layout.DATA_PARALLEL_DEGREE == 8
    assert np.isfinite(float(out["loss"]))
    # and the solo runner restores its own flat layout on its next dispatch
    solo_state = solo_runner.init_state(_example_batch(bs=2, n_voxels=256,
                                                       grid=16))
    assert layout.BATCH_LOCAL is False
    del solo_state


def test_zcells_tag_replicated_even_when_length_equals_batch_size():
    """The dense path's [Z] zcells shape tag must stay replicated even when
    Z coincidentally equals the batch size — batch-sharding it under
    multi-host would stitch a [Z*nproc] global tag and silently change the
    model's z extent."""
    import dataclasses

    from dpcr_agb_tpu.parallel.mesh import batch_sharding, make_mesh
    from jax.sharding import PartitionSpec as P
    from __graft_entry__ import _example_batch

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual platform")
    b = _example_batch(bs=16, n_voxels=64, grid=16)
    b = dataclasses.replace(b, aux={"zcells": np.zeros(16, np.int8)})
    sh = batch_sharding(make_mesh(8), b)
    assert sh.aux["zcells"].spec == P()
    assert sh.pos.spec == P("data")
