#!/usr/bin/env python
"""Host-side data-pipeline throughput: plots/s through dataset.get ->
transform pipeline -> fixed-shape collate (-> model post-collate), measured
on this image's single CPU core.

Why: bench.py measures the DEVICE step only. In real training the loader's
prefetch threads must produce batches at least as fast as the device
consumes them, or the device rate is unreachable end-to-end. The KPConv
host ceiling is recorded in RESULTS.md; this script measures the flagship
sparse (MSENet) preset the same way.

Usage: python scripts/bench_host_loader.py [--preset sparse_xy] [--bs 16]
       [--plots 64] [--batches 12]
"""
import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
# force CPU: the host pipeline never needs the device, and when the axon
# tunnel is down its backend init hangs indefinitely. The image's
# sitecustomize force-sets jax_platforms to "axon,cpu" — env vars alone are
# ignored, so override via jax.config before any backend initializes
# (same pattern as tests/conftest.py).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="sparse_xy")
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--plots", type=int, default=64)
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--model", default="SENet14")
    ap.add_argument("--models-group", default="instance/minkowski_baseline")
    args = ap.parse_args()

    import tempfile

    from dpcr_agb_tpu.config import load_config
    from dpcr_agb_tpu.training.trainer import Trainer

    tmp = tempfile.mkdtemp(prefix="hostbench_")
    cfg = load_config(os.path.join(REPO, "conf"), "config", [
        "task=instance", f"models={args.models_group}",
        f"model_name={args.model}", "data=instance/synthetic/reg",
        f"data.transform_type={args.preset}",
        f"data.synthetic_plots={args.plots}",
        f"data.dataroot={tmp}/data", "training=nfi/minkowski",
        "training.epochs=1", f"training.batch_size={args.bs}",
        "training.num_workers=0", f"run_dir={tmp}/run"])
    t = Trainer(cfg)
    loader = t.loaders["train"]

    # warm one epoch pass to exclude one-time costs (npz cache, allocator)
    n_warm = 0
    for b in loader.epoch(0):
        n_warm += 1
        if n_warm >= 2:
            break

    produced = 0
    t0 = time.perf_counter()
    epoch = 1
    while produced < args.batches:
        for b in loader.epoch(epoch):
            produced += 1
            if produced >= args.batches:
                break
        epoch += 1
    dt = time.perf_counter() - t0
    plots = produced * args.bs
    print(f"host loader [{args.preset} bs{args.bs} model={args.model}]: "
          f"{plots / dt:.1f} plots/s "
          f"({dt / produced * 1e3:.1f} ms/batch, {produced} batches)")


if __name__ == "__main__":
    main()
