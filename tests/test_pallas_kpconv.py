"""Fused Pallas KPConv kernel vs the XLA reference formulation
(models/kpconv.kpconv_apply_batched) — forward values and nx/W gradients.
Runs in Pallas interpret mode on the CPU test platform."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dpcr_agb_tpu.models.kpconv import (SHADOW_POS,
                                        kp_influence_weights_batched,
                                        kpconv_apply_batched)
from dpcr_agb_tpu.ops.pallas_kpconv import kpconv_fused


def _setup(rng, b=2, nq=24, ns=20, k=7, n_kp=5, c=6, cout=8):
    q = rng.uniform(0, 1, (b, nq, 3)).astype(np.float32)
    s = rng.uniform(0, 1, (b, ns, 3)).astype(np.float32)
    # neighbor lists with shadow entries (= ns)
    nbr = rng.integers(0, ns + 1, (b, nq, k)).astype(np.int32)
    nbr[:, :, -1] = ns  # guarantee shadows appear
    x = rng.standard_normal((b, ns, c)).astype(np.float32)
    kp = (rng.uniform(-1, 1, (n_kp, 3)) * 0.3).astype(np.float32)
    w = rng.standard_normal((n_kp, c, cout)).astype(np.float32) * 0.2
    extent = 0.4
    return q, s, nbr, x, kp, w, extent


def _rel_nx(q, s, nbr, x):
    b, ns, c = x.shape
    s_pad = np.concatenate([s, np.full((b, 1, 3), SHADOW_POS, np.float32)], 1)
    x_pad = np.concatenate([x, np.zeros((b, 1, c), np.float32)], 1)
    rel = np.take_along_axis(s_pad[:, :, None, :],
                             nbr[:, :, :, None].astype(np.int64), axis=1)
    rel = rel - q[:, :, None, :]
    nx = np.take_along_axis(x_pad[:, :, None, :],
                            nbr[:, :, :, None].astype(np.int64), axis=1)
    return jnp.asarray(rel), jnp.asarray(nx)


def _reference(q, s, nbr, x, kp, w, extent, influence="linear",
               aggregation="sum"):
    all_w = kp_influence_weights_batched(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(nbr), jnp.asarray(kp),
        extent, influence, aggregation)
    return kpconv_apply_batched(jnp.asarray(nbr), jnp.asarray(x),
                                jnp.asarray(w), all_w)


@pytest.mark.parametrize("influence", ["linear", "gaussian", "constant"])
def test_forward_matches_reference(rng, influence):
    q, s, nbr, x, kp, w, extent = _setup(rng)
    want = np.asarray(_reference(q, s, nbr, x, kp, w, extent, influence))
    rel, nx = _rel_nx(q, s, nbr, x)
    got = np.asarray(kpconv_fused(rel, nx, jnp.asarray(w), kp, extent,
                                  influence))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_forward_closest_aggregation(rng):
    q, s, nbr, x, kp, w, extent = _setup(rng)
    want = np.asarray(_reference(q, s, nbr, x, kp, w, extent,
                                 "linear", "closest"))
    rel, nx = _rel_nx(q, s, nbr, x)
    got = np.asarray(kpconv_fused(rel, nx, jnp.asarray(w), kp, extent,
                                  "linear", "closest"))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_closest_tie_breaks_to_first_kernel_point(rng):
    """Exact d2 ties must select only the FIRST minimizing kernel point
    (XLA path = one-hot argmin); the fused kernel used to keep every tied
    point, double-counting the neighbor's contribution."""
    b, nq, ns, k, c, cout = 1, 8, 8, 4, 6, 8
    q = np.zeros((b, nq, 3), np.float32)
    s = np.zeros((b, ns, 3), np.float32)
    s[:, :, 1] = 0.1  # all rel vectors = (0, 0.1, 0): equidistant to kp0/kp1
    nbr = rng.integers(0, ns, (b, nq, k)).astype(np.int32)
    x = rng.standard_normal((b, ns, c)).astype(np.float32)
    kp = np.zeros((4, 3), np.float32)
    kp[0] = (0.05, 0, 0)
    kp[1] = (-0.05, 0, 0)   # exact tie with kp[0]
    kp[2] = (0, 0, 0.3)
    kp[3] = (0, 0, -0.3)
    w = rng.standard_normal((4, c, cout)).astype(np.float32) * 0.2
    extent = 0.4
    want = np.asarray(_reference(q, s, nbr, x, kp, w, extent,
                                 "linear", "closest"))
    rel, nx = _rel_nx(q, s, nbr, x)
    got = np.asarray(kpconv_fused(rel, nx, jnp.asarray(w), jnp.asarray(kp),
                                  extent, "linear", "closest"))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_gradients_match_reference(rng):
    q, s, nbr, x, kp, w, extent = _setup(rng)
    rel, nx = _rel_nx(q, s, nbr, x)
    gscale = jnp.asarray(
        rng.standard_normal((2, 24, 8)).astype(np.float32))

    def loss_ref(x_, w_):
        return jnp.sum(_reference(q, s, nbr, x_, kp, w_, extent) * gscale)

    def loss_fused(nx_, w_):
        return jnp.sum(kpconv_fused(rel, nx_, w_, kp, extent) * gscale)

    dx_ref, dw_ref = jax.grad(loss_ref, argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(w))
    dnx, dw_fused = jax.grad(loss_fused, argnums=(0, 1))(
        nx, jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(dw_fused), np.asarray(dw_ref),
                               rtol=2e-4, atol=2e-4)
    # dnx scattered back by nbr must equal the reference dx
    b, ns, c = np.asarray(x).shape
    dx = np.zeros((b, ns + 1, c), np.float32)
    nbr_np = np.asarray(nbr)
    dnx_np = np.asarray(dnx)
    for bi in range(b):
        np.add.at(dx[bi], nbr_np[bi].reshape(-1),
                  dnx_np[bi].reshape(-1, c))
    np.testing.assert_allclose(dx[:, :ns], np.asarray(dx_ref),
                               rtol=2e-4, atol=2e-4)


def test_row_padding_and_odd_sizes(rng):
    # m not a multiple of any tile size exercises the pad/slice path
    q, s, nbr, x, kp, w, extent = _setup(rng, b=1, nq=13, ns=9, k=3,
                                         n_kp=4, c=5, cout=3)
    want = np.asarray(_reference(q, s, nbr, x, kp, w, extent))
    rel, nx = _rel_nx(q, s, nbr, x)
    got = np.asarray(kpconv_fused(rel, nx, jnp.asarray(w), kp, extent))
    assert got.shape == (1, 13, 3)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_bf16_features_close(rng):
    q, s, nbr, x, kp, w, extent = _setup(rng)
    want = np.asarray(_reference(q, s, nbr, x, kp, w, extent))
    rel, nx = _rel_nx(q, s, nbr, x)
    got = np.asarray(kpconv_fused(rel, nx.astype(jnp.bfloat16),
                                  jnp.asarray(w), kp, extent,
                                  compute_dtype=jnp.bfloat16))
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)


@pytest.mark.slow
def test_kpcnn_fused_matches_xla_path(rng):
    """Full KPCNN forward: fused Pallas path == XLA all_w path."""
    from dpcr_agb_tpu.models.kpconv import KPCNN
    import dataclasses

    arch = ["simple", "resnetb", "resnetb_strided", "resnetb",
            "global_sum"]
    common = dict(architecture=arch, num_reg_targets=2, in_features_dim=3,
                  first_features_dim=16, num_kernel_points=5,
                  first_subsampling_dl=0.1, use_batch_norm=True)
    b, n = 2, 64
    pos = rng.uniform(0, 1, (b, n, 3)).astype(np.float32)
    mask = np.ones((b, n), bool)
    mask[1, 50:] = False
    pos[~mask] = 1e6
    x = rng.standard_normal((b, n, 3)).astype(np.float32)

    @dataclasses.dataclass
    class B:
        pos: jnp.ndarray
        mask: jnp.ndarray
        x: jnp.ndarray
        aux: dict = None

    batch = B(pos=jnp.asarray(pos), mask=jnp.asarray(mask), x=jnp.asarray(x))
    net_xla = KPCNN(fused_kernel=False, **common)
    net_fused = KPCNN(fused_kernel=True, **common)
    v = net_xla.init(jax.random.PRNGKey(0), batch, train=False)
    out_xla = net_xla.apply(v, batch, train=False)
    out_fused = net_fused.apply(v, batch, train=False)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_xla),
                               rtol=2e-4, atol=2e-4)
