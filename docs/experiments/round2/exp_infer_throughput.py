"""Inference (serving-path) throughput of the flagship MSENet14: forward
only, train=False, de-standardized outputs — the predict.py / StableHLO
artifact compute path, which has no recorded device number yet (all
RESULTS.md throughput rows are full train steps).

Protocol: scan-chained forward with full-tensor feedback (the chain's
outputs perturb the next iteration's features so XLA cannot slice the
chain), timed by (n2-n1) differencing — scripts/bench_protocol.py.

Run ON THE REAL TPU:  python docs/experiments/round2/exp_infer_throughput.py
Env: DPCR_BENCH_BS (default 16).
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


def main():
    from __graft_entry__ import _example_batch, _flagship
    from dpcr_agb_tpu.models.base import InstanceSpec, convert_outputs, reg_output
    from dpcr_agb_tpu.models.factory import make_post_collate

    net = _flagship()
    batch = _example_batch(bs=BS, n_voxels=16000)
    post = make_post_collate(net)
    if post is not None:
        batch = post(batch)
    variables = jax.jit(lambda b: net.init(jax.random.PRNGKey(0), b,
                                           train=False))(batch)
    spec = InstanceSpec(
        num_reg_targets=2, scale=np.array([50.0, 80.0], np.float32),
        center=np.array([100.0, 150.0], np.float32),
        weights=np.array([0.5, 0.5], np.float32))

    def make_chain(n):
        def chain(vs, b):
            def body(x, _):
                import dataclasses
                bb = dataclasses.replace(b, x=x)
                raw = net.apply(vs, bb, train=False)
                pred = reg_output(spec, convert_outputs(spec, raw))
                # full-tensor feedback: fold the [B,2] prediction back into
                # the [B,N,C] features so iterations can't be sliced/merged
                x2 = x + (pred.mean(axis=1)[:, None, None] * 1e-6).astype(x.dtype)
                return x2, pred.mean()
            x_fin, outs = jax.lax.scan(body, b.x, None, length=n)
            return x_fin
        return chain

    ms = timed_diff(make_chain, (variables, batch))
    plots_s = BS / (ms / 1e3)
    print(json.dumps({
        "metric": "infer_throughput_msenet14_nfi",
        "value": round(plots_s, 2), "unit": "plots/sec/chip",
        "ms_per_forward": round(ms, 2), "bs": BS,
    }))


if __name__ == "__main__":
    main()
