"""Parameter regularizers (reference core/regularizer/regularizers.py:4-202):
L1 / L2 / ElasticNet penalties over model parameters, added to the training
loss via the model option `regularizers: {type: ..., lambda: ...}`
(BaseModel.get_regularization_loss hook, base_model.py:343-347).
Normalization-layer scales/biases are exempt like torch convention.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def _penalized_leaves(params):
    leaves = []

    def walk(node, path):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, path + (k,))
            elif not any("bn" in p or "norm" in p.lower() for p in path):
                leaves.append(v)
    walk(params, ())
    return leaves


def l1(params):
    return sum(jnp.sum(jnp.abs(p)) for p in _penalized_leaves(params))


def l2(params):
    return sum(jnp.sum(jnp.square(p)) for p in _penalized_leaves(params))


def elastic(params, alpha: float = 0.5):
    return alpha * l1(params) + (1 - alpha) * l2(params)


REGULARIZERS = {"L1": l1, "L2": l2, "elastic": elastic, "ELASTIC": elastic}


def build_regularizer(option) -> Optional[Callable]:
    """From the model option: `regularizers: {type, lambda[, alpha]}`."""
    cfg = option.get("regularizers") if hasattr(option, "get") else None
    if not cfg:
        return None
    rtype = str(cfg.get("type", "L2"))
    lam = float(cfg.get("lambda", cfg.get("lambda_", 0.0)))
    if lam == 0.0:
        return None
    if rtype not in REGULARIZERS:
        raise ValueError(f"Unknown regularizer: {rtype} "
                         f"(choose from {sorted(REGULARIZERS)})")
    if rtype.lower() == "elastic":
        alpha = float(cfg.get("alpha", 0.5))
        return lambda p: lam * elastic(p, alpha)
    fn = REGULARIZERS[rtype]
    return lambda p: lam * fn(p)
