"""KPConv device throughput at CALIBRATED neighbor limits.

Round-1's paper-shape number (~21 plots/s, RESULTS.md) used a uniform
K=40 at every level. The auto-calibration (utils/neighbor_calibration.py,
reference neighborhood_limits idea) measures p90 in-degrees per level on
real batches — on the synthetic NFI set it returns K=[16,40,52,53,46],
i.e. level 0 (the row-count-dominant level: all N points) drops 40 -> 16.
Gathers cost a flat ~7-22 ns/ROW (exp_gather_scaling.py), so the device
chain should speed up roughly with the L0 row count.

Measures the honest whole-model value+grad chain (same protocol as the
round-1 number) at:
  A. paper shape bs32/6144, uniform K=40       (round-1 comparison point)
  B. paper shape bs32/6144, calibrated klims
  C. training shape bs16/12000-cap, calibrated (matches the host-side
     0.52 s/batch measurement -> is the device or the host the ceiling?)

Run ON THE REAL TPU:  python docs/experiments/round2/exp_kpcnn_calibrated.py
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

ARCH = ['simple', 'resnetb', 'resnetb_strided', 'resnetb', 'resnetb',
        'resnetb_strided', 'resnetb', 'resnetb', 'resnetb_strided',
        'resnetb', 'resnetb', 'resnetb_strided', 'resnetb', 'resnetb',
        'global_sum']
CALIB = [16, 40, 52, 53, 46]


@dataclasses.dataclass
class Batch:
    pos: jnp.ndarray
    mask: jnp.ndarray
    x: jnp.ndarray
    aux: dict


def make_inputs(b, n, klims, seed=0):
    from dpcr_agb_tpu.ops.host_pyramid import (kpconv_pyramid_host,
                                               kpconv_pyramid_plan)
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-0.5, 0.5, (b, n, 3)).astype(np.float32)
    pos[:, :, 2] = rng.uniform(0, 0.6, (b, n))
    mask = np.ones((b, n), bool)
    x = rng.standard_normal((b, n, 3)).astype(np.float32)
    plan = kpconv_pyramid_plan(0.0125, 2.5, 5, n,
                               (1.0, 0.7, 0.35, 0.18, 0.1), list(klims))
    t0 = time.perf_counter()
    per = [kpconv_pyramid_host(pos[i], mask[i], plan) for i in range(b)]
    host_s = time.perf_counter() - t0
    aux = {k: jnp.asarray(np.stack([p[k] for p in per])) for k in per[0]}
    return (Batch(jnp.asarray(pos), jnp.asarray(mask), jnp.asarray(x), aux),
            host_s)


def time_value_grad(batch, b, label):
    from dpcr_agb_tpu.models.kpconv import KPCNN
    net = KPCNN(architecture=ARCH, num_reg_targets=2, in_features_dim=3,
                first_features_dim=64, num_kernel_points=15,
                first_subsampling_dl=0.0125)
    v = jax.jit(lambda: net.init(jax.random.PRNGKey(0), batch,
                                 train=False))()
    params, bstats = v["params"], v.get("batch_stats", {})
    gref = jnp.ones((b, 2), jnp.float32)

    def loss(p):
        out, _ = net.apply({"params": p, "batch_stats": bstats}, batch,
                           train=True, mutable=["batch_stats"])
        return jnp.sum(out * gref)

    def chain(n):
        def run(p):
            def body(c, _):
                val, grads = jax.value_and_grad(loss)(c)
                return jax.tree.map(
                    lambda a_, g: a_ + 1e-20 * val * g, c, grads), None
            c, _ = jax.lax.scan(body, p, None, length=n)
            return c
        return run

    n1, n2 = 2, 7
    f1, f2 = jax.jit(chain(n1)), jax.jit(chain(n2))
    float(jnp.sum(jax.tree.leaves(f1(params))[0]))
    float(jnp.sum(jax.tree.leaves(f2(params))[0]))
    p2 = jax.tree.map(lambda a_: a_ * (1.0 + 1e-6), params)
    float(jnp.sum(jax.tree.leaves(p2)[0]))
    t0 = time.perf_counter()
    float(jnp.sum(jax.tree.leaves(f1(p2))[0]))
    t1 = time.perf_counter()
    p3 = jax.tree.map(lambda a_: a_ * (1.0 + 2e-6), params)
    float(jnp.sum(jax.tree.leaves(p3)[0]))
    t2 = time.perf_counter()
    float(jnp.sum(jax.tree.leaves(f2(p3))[0]))
    t3 = time.perf_counter()
    ms = ((t3 - t2) - (t1 - t0)) / (n2 - n1) * 1e3
    print(f"{label}: {ms:8.1f} ms value+grad -> {b / ms * 1e3:6.1f} plots/s",
          flush=True)
    return ms


def main():
    r = {}
    cases = [("A_paper_K40", 32, 6144, [40] * 5),
             ("B_paper_calib", 32, 6144, CALIB),
             ("C_train_bs16_calib", 16, 12000, CALIB)]
    for label, b, n, klims in cases:
        print(f"building host pyramid for {label}...", flush=True)
        batch, host_s = make_inputs(b, n, klims)
        print(f"  host pyramid: {host_s:.2f} s for bs{b} "
              f"({host_s / b * 1e3:.0f} ms/plot)", flush=True)
        r[label] = {"ms": time_value_grad(batch, b, label),
                    "host_s_per_batch": host_s}
    print(json.dumps(r))


if __name__ == "__main__":
    main()
