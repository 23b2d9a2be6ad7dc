"""ops/nn layer tests — masked reductions vs numpy, MaskedBatchNorm vs torch
BatchNorm1d on the valid rows (same math, same running-stat convention)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from dpcr_agb_tpu.nn.norm import MaskedBatchNorm
from dpcr_agb_tpu.ops.masked import masked_max, masked_mean, masked_moments, masked_sum


@pytest.fixture
def masked_batch(rng):
    x = rng.normal(size=(4, 50, 8)).astype(np.float32)
    mask = np.zeros((4, 50), dtype=bool)
    counts = [50, 37, 12, 3]
    for i, c in enumerate(counts):
        mask[i, :c] = True
    x[~mask] = 999.0  # padding junk must never leak
    return x, mask, counts


def test_masked_reductions(masked_batch):
    x, mask, counts = masked_batch
    s = np.asarray(masked_sum(jnp.asarray(x), jnp.asarray(mask)))
    m = np.asarray(masked_mean(jnp.asarray(x), jnp.asarray(mask)))
    mx = np.asarray(masked_max(jnp.asarray(x), jnp.asarray(mask)))
    for i, c in enumerate(counts):
        np.testing.assert_allclose(s[i], x[i, :c].sum(0), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(m[i], x[i, :c].mean(0), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(mx[i], x[i, :c].max(0), rtol=1e-6)


def test_masked_max_empty_rows():
    x = jnp.ones((2, 4, 3))
    mask = jnp.zeros((2, 4), bool)
    out = masked_max(x, mask)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_masked_moments_match_numpy(masked_batch):
    x, mask, counts = masked_batch
    mean, var, count = masked_moments(jnp.asarray(x), jnp.asarray(mask), (0, 1))
    valid = x[mask]
    np.testing.assert_allclose(np.asarray(mean), valid.mean(0), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(var), valid.var(0), rtol=1e-4)
    assert int(np.asarray(count)[0]) == sum(counts)


class TestMaskedBatchNorm:
    def _setup(self, rng, momentum=0.1):
        x = rng.normal(size=(4, 30, 6)).astype(np.float32) * 3 + 1
        mask = np.zeros((4, 30), dtype=bool)
        for i, c in enumerate([30, 20, 10, 5]):
            mask[i, :c] = True
        x[~mask] = -777.0
        bn = MaskedBatchNorm(6, momentum=momentum)
        variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                            jnp.asarray(mask))
        tbn = torch.nn.BatchNorm1d(6, momentum=momentum)
        return x, mask, bn, variables, tbn

    def test_train_matches_torch(self, rng):
        x, mask, bn, variables, tbn = self._setup(rng)
        out, mutated = bn.apply(variables, jnp.asarray(x), jnp.asarray(mask),
                                use_running_average=False,
                                mutable=["batch_stats"])
        valid = torch.from_numpy(x[mask])
        tbn.train()
        tout = tbn(valid).detach().numpy()
        np.testing.assert_allclose(np.asarray(out)[mask], tout, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["mean"]),
            tbn.running_mean.numpy(), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(mutated["batch_stats"]["var"]),
            tbn.running_var.numpy(), rtol=1e-4)

    def test_eval_uses_running_stats(self, rng):
        x, mask, bn, variables, tbn = self._setup(rng)
        # seed both with the same running stats
        rm = rng.normal(size=6).astype(np.float32)
        rv = rng.uniform(0.5, 2.0, size=6).astype(np.float32)
        variables = {"params": variables["params"],
                     "batch_stats": {"mean": jnp.asarray(rm),
                                     "var": jnp.asarray(rv)}}
        tbn.running_mean.copy_(torch.from_numpy(rm))
        tbn.running_var.copy_(torch.from_numpy(rv))
        tbn.eval()
        out = bn.apply(variables, jnp.asarray(x), jnp.asarray(mask),
                       use_running_average=True)
        tout = tbn(torch.from_numpy(x[mask])).detach().numpy()
        np.testing.assert_allclose(np.asarray(out)[mask], tout, atol=1e-5)

    def test_momentum_convention(self, rng):
        """torch: running = (1-m)*running + m*batch — two steps diverge from
        flax's inverted convention, so pin it."""
        x, mask, bn, variables, _ = self._setup(rng, momentum=0.5)
        _, mut = bn.apply(variables, jnp.asarray(x), jnp.asarray(mask),
                          use_running_average=False, mutable=["batch_stats"])
        batch_mean = x[mask].mean(0)
        np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]),
                                   0.5 * 0.0 + 0.5 * batch_mean, rtol=1e-5)
