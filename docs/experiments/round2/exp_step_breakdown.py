"""Macro breakdown of the MSENet14 sparse-L0 train step (bs16 bench shape).

After the sparse level-0 stem landed (69.1 plots/s = ~232 ms/step at bs16)
the next lever needs a component map: where do the remaining ms go?
Decomposition by STAGE TRUNCATION — value+grad of SparseResNet variants
with layers (0,0,0,0) .. (1,1,1,1); successive diffs give each stage's
fwd+bwd cost (including its occupancy pools), and the (0,0,0,0) variant
isolates L0 (scatter + sparse stem + BN/act + dense pool) + head. The
dense-L0 counterpart and the full StepRunner step (AdaBelief + clip) are
timed for reference.

Run ON THE REAL TPU:  python docs/experiments/round2/exp_step_breakdown.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.bench_protocol import timed_diff

BS = int(os.environ.get("DPCR_BENCH_BS", 16))


def _net(layers):
    from dpcr_agb_tpu.models.minkowski import SparseResNet
    return SparseResNet(
        block="se_basic", layers=layers, num_reg_targets=2,
        activation="gelu", first_stride=1, global_pool="sum",
        drop_path=0.0, dtype=jnp.bfloat16, dense_dims=(88, 88, 104))


def _batch():
    from __graft_entry__ import _example_batch
    from dpcr_agb_tpu.models.factory import make_post_collate
    b = _example_batch(bs=BS, n_voxels=16000)
    post = make_post_collate(_net((1, 1, 1, 1)))
    return post(b) if post is not None else b


def chain_value_grad(net, batch):
    def make(n):
        def run(params, stats):
            def loss(p):
                out, mut = net.apply(
                    {"params": p, "batch_stats": stats}, batch, train=True,
                    mutable=["batch_stats"],
                    rngs={"dropout": jax.random.PRNGKey(0)})
                return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

            def body(p, _):
                g = jax.grad(loss)(p)
                return jax.tree.map(
                    lambda a, b: a - 1e-9 * b.astype(a.dtype), p, g), None
            out, _ = jax.lax.scan(body, params, None, length=n)
            return out
        return run
    return make


def time_net(net, batch):
    variables = jax.jit(lambda: net.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        batch, train=False))()
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    return timed_diff(chain_value_grad(net, batch), (params, stats))


def main():
    from dpcr_agb_tpu.ops import dense_grid

    batch = _batch()
    r = {}
    # DPCR_BREAKDOWN_FAST: each full-model compile costs ~25-35 min through
    # the axon tunnel, so the fast mode keeps only the L0-isolating
    # truncation, the full arch, and the dense-L0 reference.
    fast = bool(int(os.environ.get("DPCR_BREAKDOWN_FAST", "0")))
    truncs = ([(0, 0, 0, 0), (1, 1, 1, 1)] if fast else
              [(0, 0, 0, 0), (1, 0, 0, 0), (1, 1, 0, 0), (1, 1, 1, 0),
               (1, 1, 1, 1)])
    prev = None
    prev_n = None
    for t in truncs:
        ms = time_net(_net(t), batch)
        r[f"vg_layers{sum(t)}"] = ms
        if prev is None:
            delta = ""
        elif sum(t) - prev_n == 1:
            delta = f"  (stage{sum(t)} += {ms - prev:.1f})"
        else:
            delta = (f"  (stages{prev_n + 1}-{sum(t)} += {ms - prev:.1f} "
                     "combined)")
        print(f"value+grad layers={t}: {ms:8.2f} ms{delta}")
        prev, prev_n = ms, sum(t)

    # dense L0 reference at the full arch (skipped in fast mode: the
    # full-step dense number 56.3 plots/s is already on record)
    if not fast:
        dense_grid.L0_MODE = "dense"
        try:
            ms = time_net(_net((1, 1, 1, 1)), batch)
            r["vg_dense_l0"] = ms
            print(f"value+grad dense-L0 full : {ms:8.2f} ms")
        finally:
            dense_grid.L0_MODE = "sparse"

    # full train step (fwd+bwd+clip+AdaBelief) via StepRunner for reference
    if fast:
        print(json.dumps(r))
        return
    import optax
    from dpcr_agb_tpu.models.base import InstanceSpec
    from dpcr_agb_tpu.training.optim import (adabelief,
                                             cosine_annealing_warm_restarts)
    from dpcr_agb_tpu.training.step import StepRunner
    import time as _time
    spec = InstanceSpec(
        num_reg_targets=2, scale=np.array([50.0, 80.0], np.float32),
        center=np.array([100.0, 150.0], np.float32),
        weights=np.array([0.5, 0.5], np.float32))
    tx = optax.chain(optax.clip(100.0),
                     adabelief(cosine_annealing_warm_restarts(5e-3, 10, 2),
                               weight_decay=1e-2))
    runner = StepRunner(net=_net((1, 1, 1, 1)), spec=spec, tx=tx, mesh=None,
                        seed=0)
    state = runner.init_state(batch)
    for _ in range(3):
        state, out = runner.train(state, batch)
    float(out["loss"])
    t0 = _time.perf_counter()
    for _ in range(10):
        state, out = runner.train(state, batch)
    float(out["loss"])
    ms = (_time.perf_counter() - t0) / 10 * 1e3
    r["full_step"] = ms
    print(f"full train step          : {ms:8.2f} ms "
          f"({BS / ms * 1e3:.1f} plots/s)")
    print(json.dumps(r))


if __name__ == "__main__":
    main()
