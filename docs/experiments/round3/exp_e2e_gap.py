"""Decompose the e2e-trainer vs device-step throughput gap (VERDICT r3
follow-up to sweep3b: trainer steady-state 37-39 plots/s vs bench.py 66 at
the same bs16 sparse_xy config — the 'e2e within 15% of headline or
explained' gate).

Measures, at the bench shape (SENet14 sparse L0, bs16, 16000 voxels):
  device_same    bench.py protocol — same device-resident batch re-stepped
  device_fresh   new HOST batch transferred per step (serial put + step)
  device_preput  batches pre-placed on device, then stepped (isolates H2D)
  h2d_only       jax.device_put of one batch, timed alone
  loader_only    host pipeline rate (transforms + collate), no device
  e2e_loop       the actual Trainer loop over the synthetic dataset

Run ON THE REAL TPU:  python docs/experiments/round3/exp_e2e_gap.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import numpy as np

import scripts.bench_protocol  # noqa: F401  (shared compile cache)
import jax

from __graft_entry__ import _example_batch, _flagship
from dpcr_agb_tpu.models.base import InstanceSpec
from dpcr_agb_tpu.models.factory import make_post_collate
from dpcr_agb_tpu.training.optim import (adabelief,
                                         cosine_annealing_warm_restarts)
from dpcr_agb_tpu.training.step import StepRunner

import optax

BS = int(os.environ.get("DPCR_BENCH_BS", 16))
N_STEPS = 10


def main():
    net = _flagship()
    spec = InstanceSpec(
        num_reg_targets=2, scale=np.array([50.0, 80.0], np.float32),
        center=np.array([100.0, 150.0], np.float32),
        weights=np.array([0.5, 0.5], np.float32))
    tx = optax.chain(
        optax.clip(100.0),
        adabelief(cosine_annealing_warm_restarts(5e-3, 10, 2),
                  weight_decay=1e-2))
    runner = StepRunner(net=net, spec=spec, tx=tx, mesh=None, seed=0)
    post = make_post_collate(net)

    def fresh_batch(seed):
        b = _example_batch(bs=BS, n_voxels=16000, seed=seed)
        b = post(b) if post is not None else b
        # _example_batch returns DEVICE arrays (bench.py therefore never
        # pays H2D); the real loader hands the runner HOST numpy — convert
        return jax.tree.map(np.asarray, b)

    batches = [fresh_batch(s) for s in range(N_STEPS + 3)]
    state = runner.init_state(batches[0])

    # warmup/compile
    for i in range(3):
        state, out = runner.train(state, batches[i])
    float(out["loss"])

    # 1) device_same: bench.py protocol
    dev_b = runner.device_put(batches[0])
    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        state, out = runner.train(state, dev_b)
    float(out["loss"])
    t_same = time.perf_counter() - t0
    print(f"device_same:   {BS * N_STEPS / t_same:7.2f} plots/s "
          f"({1e3 * t_same / N_STEPS:.1f} ms/step)", flush=True)

    # 2) device_fresh: host batch per step (serial H2D + step)
    t0 = time.perf_counter()
    for i in range(N_STEPS):
        state, out = runner.train(state, batches[i])
    float(out["loss"])
    t_fresh = time.perf_counter() - t0
    print(f"device_fresh:  {BS * N_STEPS / t_fresh:7.2f} plots/s "
          f"({1e3 * t_fresh / N_STEPS:.1f} ms/step)", flush=True)

    # 3) device_preput: all batches pre-placed, stepped back-to-back
    dev_batches = [runner.device_put(b) for b in batches[:N_STEPS]]
    t0 = time.perf_counter()
    for b in dev_batches:
        state, out = runner.train(state, b)
    float(out["loss"])
    t_pre = time.perf_counter() - t0
    print(f"device_preput: {BS * N_STEPS / t_pre:7.2f} plots/s "
          f"({1e3 * t_pre / N_STEPS:.1f} ms/step)", flush=True)

    # 4) h2d_only: device_put + block, timed alone. device_put
    # wire-compacts (data/batch.encode_wire) — report raw vs wire bytes.
    t0 = time.perf_counter()
    for i in range(N_STEPS):
        placed = runner.device_put(batches[i])
        jax.block_until_ready(placed)
    t_h2d = time.perf_counter() - t0
    nbytes = sum(np.asarray(l).nbytes
                 for l in jax.tree_util.tree_leaves(batches[0]))
    wbytes = sum(l.nbytes for l in jax.tree_util.tree_leaves(placed))
    print(f"h2d_only:      {1e3 * t_h2d / N_STEPS:7.1f} ms/batch "
          f"(raw {nbytes / 1e6:.1f} -> wire {wbytes / 1e6:.1f} MB/batch "
          f"-> {wbytes * N_STEPS / t_h2d / 1e6:.0f} MB/s)", flush=True)

    # 5) loader_only: host pipeline rate over the synthetic dataset
    import tempfile

    from dpcr_agb_tpu.config import load_config
    from dpcr_agb_tpu.training.trainer import Trainer
    tmp = tempfile.mkdtemp(prefix="e2e_gap_")
    cfg = load_config(
        os.path.join(os.path.dirname(__file__), "..", "..", "..", "conf"),
        "config",
        ["task=instance", "models=instance/minkowski_baseline",
         "model_name=SENet14", "data=instance/synthetic/reg",
         "data.transform_type=sparse_xy", "data.synthetic_plots=256",
         f"data.dataroot={tmp}/data", "training=nfi/minkowski",
         "training.epochs=3", f"training.batch_size={BS}",
         "training.num_workers=4", "eval_frequency=10",
         f"run_dir={tmp}/run"])
    t = Trainer(cfg)
    loader = t.loaders["train"]
    for _ in loader.epoch(0):   # warm caches
        pass
    t0 = time.perf_counter()
    nb = 0
    for _ in loader.epoch(1):
        nb += 1
    t_load = time.perf_counter() - t0
    print(f"loader_only:   {nb * BS / t_load:7.2f} plots/s "
          f"({1e3 * t_load / nb:.1f} ms/batch)", flush=True)

    # 6) e2e_loop: the real trainer epoch (loader + prefetch + device)
    for epoch in (1, 2):
        t0 = time.perf_counter()
        t._train_epoch(epoch)
        dur = time.perf_counter() - t0
        print(f"e2e_epoch{epoch}:    "
              f"{len(loader) * BS / dur:7.2f} plots/s", flush=True)


if __name__ == "__main__":
    main()
