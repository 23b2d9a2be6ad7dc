#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Measures steady-state training throughput (forward + loss + backward +
AdaBelief update, the full optimize_parameters equivalent) of the flagship
MSENet14 sparse-voxel model on NFI-shaped synthetic batches: batch 16 plots
by default (DPCR_BENCH_BS sweeps it; see the in-body note on the single-chip
HBM bound — the paper's bs32, conf/training/nfi/minkowski.yaml, runs within
2% of the bs16 per-chip rate since the auto cube pool-bwd gather),
16000-voxel cap, 3 input channels, 2 regression targets.

vs_baseline: the reference publishes NO throughput numbers (BASELINE.md).
We normalize against a documented estimate of the reference pipeline on an
A100: ~100 plots/s (batch 32 in ~0.32 s including its per-batch host
preprocessing; MinkowskiEngine sparse convs + DataLoader transforms).
vs_baseline = plots_per_sec / 100.0. Revisit when a measured GPU baseline
exists.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np


def _probe_device_backend(timeout_s: float = 300.0) -> bool:
    """True iff the configured (axon/TPU) backend initializes in a bounded
    time in a fresh subprocess.

    When the axon tunnel is down, `jax.devices()` hangs far past any useful
    bound (observed: >240 s, indefinitely), which would leave the driver's
    bench invocation with no JSON line at all. Probing in a subprocess keeps
    the hang out of this process so we can fall back to an honestly-labeled
    CPU measurement instead.
    """
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        return None  # explicitly CPU-pinned by the user: nothing to probe
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); "
             "import sys; sys.exit(0 if d and d[0].platform != 'cpu' else 2)"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    # None = user explicitly pinned JAX_PLATFORMS=cpu (deliberate host
    # baseline); False = probe failed (tunnel down) -> labeled fallback
    probed = _probe_device_backend(
        float(os.environ.get("DPCR_PROBE_TIMEOUT", 300)))
    device_up = probed is True

    import jax
    import optax

    if not device_up:
        # Measure on CPU rather than hanging forever. The image's
        # sitecustomize force-sets jax_platforms to "axon,cpu" (env vars are
        # ignored), so pin via jax.config before the backend initializes.
        # The metric name marks the fallback so the number is never mistaken
        # for a chip measurement.
        jax.config.update("jax_platforms", "cpu")
        if probed is False:
            print("[bench] device backend unavailable (tunnel down?) — "
                  "falling back to CPU; metric renamed accordingly",
                  file=sys.stderr)

    # persistent compilation cache: TPU compiles through the axon tunnel are
    # slow (minutes); warm runs make the driver's bench invocation fast
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _example_batch, _flagship
    from dpcr_agb_tpu.models.base import InstanceSpec
    from dpcr_agb_tpu.training.optim import adabelief, cosine_annealing_warm_restarts
    from dpcr_agb_tpu.training.step import StepRunner

    # bs16 on one v5e (16 GB HBM): the dense stem's pooling backward needs a
    # full-resolution gradient volume, which bounds the single-chip batch;
    # the paper's bs32 runs as 2x bs16 gradient accumulation or 2-chip DP.
    # (sparse level 0 — DPCR_L0=sparse — frees those volumes; DPCR_BENCH_BS
    # sweeps the batch.)
    bs, n_voxels = int(os.environ.get("DPCR_BENCH_BS", 16)), 16000
    if not device_up:
        # keep the CPU fallback bounded: small batch, quarter-cap voxels
        bs, n_voxels = int(os.environ.get("DPCR_BENCH_BS", 4)), 4000
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
    batch = _example_batch(bs=bs, n_voxels=n_voxels)
    # production data path: host-precomputed pyramid (overlapped with device
    # compute by the loader's prefetch threads in real training)
    from dpcr_agb_tpu.models.factory import make_post_collate
    post = make_post_collate(net)
    if post is not None:
        batch = post(batch)
    state = runner.init_state(batch)

    # warmup (compile + 2 steps); fetch the loss VALUE — on the axon
    # transport block_until_ready alone does not reliably wait for device
    # completion, only a host fetch does
    for _ in range(3 if device_up else 1):
        state, out = runner.train(state, batch)
    float(out["loss"])

    n_steps = 10 if device_up else 2
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, out = runner.train(state, batch)
    float(out["loss"])
    dt = time.perf_counter() - t0

    plots_per_sec = bs * n_steps / dt
    metric = ("train_throughput_msenet14_nfi" if device_up
              else "train_throughput_msenet14_nfi_cpu" if probed is None
              else "train_throughput_msenet14_nfi_CPU_FALLBACK_tunnel_down")
    print(json.dumps({
        "metric": metric,
        "value": round(plots_per_sec, 2),
        "unit": "plots/sec/chip" if device_up else "plots/sec (host CPU)",
        "vs_baseline": round(plots_per_sec / 100.0, 3),
    }))


if __name__ == "__main__":
    main()
