"""Optimizer/schedule tests: AdaBelief vs an independent numpy oracle of the
documented update rule; CosineAnnealingWarmRestarts vs torch's scheduler."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from dpcr_agb_tpu.training.optim import (adabelief,
                                         cosine_annealing_warm_restarts,
                                         make_lr_fn)


def _adabelief_oracle(params, grads_seq, lr, b1=0.9, b2=0.999, eps=1e-16,
                      wd=0.0):
    """Numpy oracle of the reference semantics (adabelief.py:100-201):
    decoupled decay p*=(1-lr*wd); m,s EMAs with eps folded into s each step;
    rectified RAdam step with degenerate-to-SGD."""
    p = params.astype(np.float64).copy()
    m = np.zeros_like(p)
    s = np.zeros_like(p)
    for t, g in enumerate(grads_seq, start=1):
        g = g.astype(np.float64)
        p *= (1.0 - lr * wd)
        m = b1 * m + (1 - b1) * g
        s = b2 * s + (1 - b2) * (g - m) ** 2 + eps
        beta2_t = b2 ** t
        n_max = 2 / (1 - b2) - 1
        n_sma = n_max - 2 * t * beta2_t / (1 - beta2_t)
        if n_sma >= 5:
            step_size = np.sqrt((1 - beta2_t) * (n_sma - 4) / (n_max - 4)
                                * (n_sma - 2) / n_sma * n_max / (n_max - 2)) \
                / (1 - b1 ** t)
            p -= step_size * lr * m / (np.sqrt(s) + eps)
        else:
            p -= (1.0 / (1 - b1 ** t)) * lr * m
    return p


def test_adabelief_matches_oracle(rng):
    p0 = rng.normal(size=(7,)).astype(np.float32)
    grads = [rng.normal(size=(7,)).astype(np.float32) for _ in range(12)]
    lr, wd = 5e-3, 1e-2
    tx = adabelief(lr, weight_decay=wd)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    for g in grads:
        upd, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)
    expected = _adabelief_oracle(p0, grads, lr, wd=wd)
    np.testing.assert_allclose(np.asarray(params["w"]), expected, rtol=1e-4,
                               atol=1e-6)


def test_adabelief_early_steps_degenerate_to_sgd(rng):
    """For b2=0.999, n_sma < 5 for the first few steps -> SGD branch."""
    p0 = np.ones(3, np.float32)
    g = np.ones(3, np.float32)
    tx = adabelief(0.1)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    upd, state = tx.update({"w": jnp.asarray(g)}, state, params)
    # step1: SGD branch: -lr * m / bc1 = -lr * g
    np.testing.assert_allclose(np.asarray(upd["w"]), -0.1 * g, rtol=1e-5)


def test_cosine_awr_matches_torch():
    base_lr = 0.005
    sched = cosine_annealing_warm_restarts(base_lr, T_0=10, T_mult=2)
    lin = torch.nn.Linear(1, 1)
    opt = torch.optim.SGD(lin.parameters(), lr=base_lr)
    tsched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=10, T_mult=2)
    ours, theirs = [], []
    for step in range(200):
        ours.append(float(sched(step)))
        theirs.append(opt.param_groups[0]["lr"])
        opt.step()
        tsched.step()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-9)


def test_cosine_awr_tmult1_matches_torch():
    base_lr = 0.01
    sched = cosine_annealing_warm_restarts(base_lr, T_0=7, T_mult=1)
    lin = torch.nn.Linear(1, 1)
    opt = torch.optim.SGD(lin.parameters(), lr=base_lr)
    tsched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(opt, T_0=7)
    for step in range(50):
        np.testing.assert_allclose(float(sched(step)),
                                   opt.param_groups[0]["lr"], rtol=1e-5)
        opt.step()
        tsched.step()


def test_make_lr_fn_policies():
    cfg = {"class": "CosineAnnealingWarmRestarts",
           "params": {"T_0": 10, "T_mult": 2}}
    on_batch = make_lr_fn(cfg, 0.005, "on_num_batch")
    on_epoch = make_lr_fn(cfg, 0.005, "on_epoch", batches_per_epoch=100)
    np.testing.assert_allclose(float(on_batch(0)), 0.005, rtol=1e-6)
    # within epoch 0, epoch policy holds lr constant
    np.testing.assert_allclose(float(on_epoch(5)), float(on_epoch(95)),
                               rtol=1e-6)
    assert abs(float(on_batch(5)) - float(on_batch(0))) > 1e-5


def test_gradient_accumulation_multisteps():
    """optax.MultiSteps wrapper: params move only every k batches, averaged."""
    import optax
    from dpcr_agb_tpu.training.optim import adabelief
    tx = optax.MultiSteps(adabelief(0.01), every_k_schedule=2)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    g = {"w": jnp.ones(3)}
    upd1, state = tx.update(g, state, params)
    assert float(jnp.abs(upd1["w"]).sum()) == 0.0  # accumulating
    upd2, state = tx.update(g, state, params)
    assert float(jnp.abs(upd2["w"]).sum()) > 0.0   # applied
