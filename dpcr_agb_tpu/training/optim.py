"""Optimizer + LR schedules with reference semantics.

AdaBelief reproduces core/optimizer/adabelief.py:6-201 exactly, including the
implementation quirks that affect trajectories:
  * eps is ADDED INTO the second-moment state each step (in-place `add_`)
  * rectified (RAdam-style) step size with degenerate-to-SGD fallback
  * decoupled weight decay applied as p *= (1 - lr*wd) before the update

LR schedules are pure functions of the scheduler step count; the count policy
(on_epoch / on_num_batch / on_num_sample, utils/enums.py:4-9) is baked in by
`make_lr_fn`. CosineAnnealingWarmRestarts matches torch's closed form.
"""
from __future__ import annotations

import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class AdaBeliefState(NamedTuple):
    count: jnp.ndarray
    exp_avg: optax.Updates
    exp_avg_var: optax.Updates


def adabelief(learning_rate: Callable, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-16, weight_decay: float = 0.0,
              decoupled_decay: bool = True, fixed_decay: bool = False,
              rectify: bool = True, degenerated_to_sgd: bool = True,
              ) -> optax.GradientTransformation:
    lr_fn = learning_rate if callable(learning_rate) else (lambda _: learning_rate)

    def init(params):
        z = jax.tree_util.tree_map(lambda p: jnp.zeros_like(p, jnp.float32), params)
        return AdaBeliefState(jnp.zeros([], jnp.int32), z,
                              jax.tree_util.tree_map(jnp.copy, z))

    def update(grads, state, params=None):
        step = state.count + 1
        stepf = step.astype(jnp.float32)
        lr = lr_fn(state.count)  # lr for this update (scheduler steps after)
        bc1 = 1.0 - b1 ** stepf
        bc2 = 1.0 - b2 ** stepf

        exp_avg = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g.astype(jnp.float32),
            state.exp_avg, grads)
        # s <- b2*s + (1-b2)*(g-m)^2 + eps   (the in-place add_ quirk)
        exp_avg_var = jax.tree_util.tree_map(
            lambda s, g, m: b2 * s + (1 - b2) * jnp.square(g.astype(jnp.float32) - m) + eps,
            state.exp_avg_var, grads, exp_avg)

        if rectify:
            # 1-b2^t via expm1: f32 cancellation here can flip the SGD/adaptive
            # branch at the crossover step (torch computes these in f64)
            log_b2 = math.log(b2)
            beta2_t = jnp.exp(stepf * log_b2)
            one_minus_beta2_t = -jnp.expm1(stepf * log_b2)
            num_sma_max = 2.0 / (1.0 - b2) - 1.0
            num_sma = num_sma_max - 2.0 * stepf * beta2_t / one_minus_beta2_t
            rect = jnp.sqrt(jnp.clip(
                one_minus_beta2_t * (num_sma - 4.0) / (num_sma_max - 4.0)
                * (num_sma - 2.0) / num_sma * num_sma_max / (num_sma_max - 2.0),
                0.0)) / bc1
            sgd_step = (1.0 / bc1) if degenerated_to_sgd else 0.0

            def upd(m, s):
                adaptive = -rect * lr * m / (jnp.sqrt(s) + eps)
                sgd = -sgd_step * lr * m
                return jnp.where(num_sma >= 5.0, adaptive, sgd)
        else:
            def upd(m, s):
                denom = jnp.sqrt(s) / jnp.sqrt(bc2) + eps
                return -(lr / bc1) * m / denom

        updates = jax.tree_util.tree_map(upd, exp_avg, exp_avg_var)

        if weight_decay != 0.0 and params is not None:
            if decoupled_decay:
                decay = weight_decay if fixed_decay else lr * weight_decay
                updates = jax.tree_util.tree_map(
                    lambda u, p: u - decay * p.astype(jnp.float32), updates, params)
            # non-decoupled L2 is folded into grads by the caller if requested
        updates = jax.tree_util.tree_map(
            lambda u, p: u.astype(p.dtype), updates, params) \
            if params is not None else updates
        return updates, AdaBeliefState(step, exp_avg, exp_avg_var)

    return optax.GradientTransformation(init, update)


# --- LR schedules (pure fns of scheduler step) -------------------------------

def cosine_annealing_warm_restarts(base_lr: float, T_0: int, T_mult: int = 1,
                                   eta_min: float = 0.0) -> Callable:
    """torch.optim.lr_scheduler.CosineAnnealingWarmRestarts closed form
    (paper recipe: T_0=10, T_mult=2 stepped per batch, conf/lr_scheduler/
    cosineawr.yaml)."""
    def sched(count):
        t = jnp.asarray(count, jnp.float32)
        if T_mult == 1:
            t_cur = jnp.mod(t, T_0)
            t_i = jnp.asarray(T_0, jnp.float32)
        else:
            n = jnp.floor(jnp.log(t / T_0 * (T_mult - 1) + 1)
                          / math.log(T_mult))
            start = T_0 * (T_mult ** n - 1) / (T_mult - 1)
            t_i = T_0 * T_mult ** n
            t_cur = t - start
        return eta_min + (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * t_cur / t_i)) / 2

    return sched


def cosine_annealing(base_lr: float, T_max: int, eta_min: float = 0.0) -> Callable:
    def sched(count):
        t = jnp.asarray(count, jnp.float32)
        return eta_min + (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * t / T_max)) / 2
    return sched


def exponential(base_lr: float, gamma: float) -> Callable:
    return lambda count: base_lr * gamma ** jnp.asarray(count, jnp.float32)


def step_lr(base_lr: float, step_size: int, gamma: float = 0.1) -> Callable:
    return lambda count: base_lr * gamma ** jnp.floor(
        jnp.asarray(count, jnp.float32) / step_size)


def multi_step(base_lr: float, milestones, gamma: float = 0.1) -> Callable:
    ms = jnp.asarray(sorted(milestones), jnp.float32)

    def sched(count):
        passed = jnp.sum(jnp.asarray(count, jnp.float32) >= ms)
        return base_lr * gamma ** passed
    return sched


def poly_lr(base_lr: float, max_iter: int, power: float = 0.9) -> Callable:
    """PolyLR (core/schedulers/lr_schedulers.py:169-204 family)."""
    def sched(count):
        t = jnp.minimum(jnp.asarray(count, jnp.float32), max_iter)
        return base_lr * (1 - t / max_iter) ** power
    return sched


def squared_lr(base_lr: float, max_iter: int) -> Callable:
    return poly_lr(base_lr, max_iter, power=2.0)


def linear_warmup_cosine_annealing(base_lr: float, warmup_epochs: int,
                                   max_epochs: int,
                                   warmup_start_lr: float = 0.0,
                                   eta_min: float = 0.0) -> Callable:
    """core/schedulers/lr_schedulers.py:49-166."""
    def sched(count):
        t = jnp.asarray(count, jnp.float32)
        warm = warmup_start_lr + t * (base_lr - warmup_start_lr) / max(
            warmup_epochs, 1)
        cos = eta_min + (base_lr - eta_min) * (1 + jnp.cos(
            jnp.pi * (t - warmup_epochs) / max(max_epochs - warmup_epochs, 1))) / 2
        return jnp.where(t < warmup_epochs, warm, cos)
    return sched


def cyclic_lr(base_lr: float, max_lr: float, step_size_up: int = 2000,
              step_size_down: Optional[int] = None) -> Callable:
    """torch CyclicLR 'triangular' mode."""
    down = step_size_down or step_size_up
    period = step_size_up + down

    def sched(count):
        t = jnp.mod(jnp.asarray(count, jnp.float32), period)
        frac = jnp.where(t < step_size_up, t / step_size_up,
                         1.0 - (t - step_size_up) / down)
        return base_lr + (max_lr - base_lr) * frac
    return sched


def constant(base_lr: float) -> Callable:
    return lambda count: jnp.asarray(base_lr, jnp.float32)


SCHEDULERS = {
    "CosineAnnealingWarmRestarts": cosine_annealing_warm_restarts,
    "CosineAnnealingLR": lambda base_lr, **p: cosine_annealing(base_lr, **p),
    "ExponentialLR": lambda base_lr, gamma: exponential(base_lr, gamma),
    "StepLR": lambda base_lr, **p: step_lr(base_lr, **p),
    "MultiStepLR": lambda base_lr, **p: multi_step(base_lr, **p),
    "PolyLR": lambda base_lr, **p: poly_lr(base_lr, **p),
    "SquaredLR": lambda base_lr, **p: squared_lr(base_lr, **p),
    "LinearWarmupCosineAnnealingLR":
        lambda base_lr, **p: linear_warmup_cosine_annealing(base_lr, **p),
    "CyclicLR": lambda base_lr, **p: cyclic_lr(
        p.pop("base_lr", base_lr) if isinstance(p, dict) else base_lr, **p),
    "constant": lambda base_lr, **p: constant(base_lr),
}
# ReduceLROnPlateau needs a metric signal, which breaks the pure
# lr(step) model — unsupported; the config raises a clear error.


def make_lr_fn(scheduler_cfg, base_lr: float, update_on: str = "on_epoch",
               batches_per_epoch: int = 1, batch_size: int = 1,
               steps_per_update: int = 1) -> Callable:
    """Build lr(update_count) honoring the update policy
    (base_model.py:209-228): the torch scheduler is stepped once per epoch /
    batch / sample; here the policy rescales the update counter.
    steps_per_update > 1 under gradient accumulation keeps per-batch
    scheduler stepping semantics."""
    if scheduler_cfg is None:
        return constant(base_lr)
    get = scheduler_cfg.get if hasattr(scheduler_cfg, "get") else scheduler_cfg.__getitem__
    name = get("class", "constant")
    if name == "ReduceLROnPlateau":
        # metric-driven: the Trainer scales the lr externally
        # (trainer._apply_plateau); the base schedule is constant
        return constant(base_lr)
    params = get("params", {}) or {}
    params = {k: v for k, v in
              (params.to_dict() if hasattr(params, "to_dict") else params).items()
              if k != "lr"}
    sched = SCHEDULERS[name](base_lr, **params)
    if update_on == "on_num_batch":
        scale = steps_per_update
    elif update_on == "on_num_sample":
        scale = batch_size
    else:  # on_epoch
        scale = None

    def lr_fn(count):
        if scale is None:
            return sched(jnp.asarray(count) // max(batches_per_epoch, 1))
        return sched(jnp.asarray(count) * scale)

    return lr_fn


def bn_momentum_fn(bn_scheduler_cfg) -> Optional[Callable]:
    """BNMomentumScheduler (core/schedulers/bn_schedulers.py:6-112):
    momentum(epoch) = clip(bn_momentum * bn_decay^(epoch // decay_step))."""
    if not bn_scheduler_cfg:
        return None
    params = bn_scheduler_cfg["params"]
    get = params.get if hasattr(params, "get") else params.__getitem__
    m0 = get("bn_momentum", 0.1)
    decay = get("bn_decay", 0.9)
    step = get("decay_step", 10)
    clip = get("bn_clip", 1e-2)

    def fn(epoch):
        return max(m0 * decay ** (int(epoch) // int(step)), clip)
    return fn
