#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "mfu": ...,
     "flops_per_plot": ..., "models": {...}}

Primary metric: steady-state training throughput (forward + loss + backward +
AdaBelief update, the full optimize_parameters equivalent) of the flagship
MSENet14 sparse-voxel model on NFI-shaped synthetic batches: batch 16 plots
by default (DPCR_BENCH_BS sweeps it), 16000-voxel cap, 3 input channels,
2 regression targets.

Round-4 additions (VERDICT r3 items 2 & 5):
  * MFU / FLOP / HBM-byte accounting from XLA's compiled cost analysis,
    normalized against the chip's datasheet peaks (v5e: 197 bf16 TFLOP/s,
    819 GB/s HBM) — perf is no longer judged blind.
  * `models`: additional guarded rows — MSENet14 at the paper's bs32,
    SENet50 (the paper's best biomass model, README.md:33), and KPConv at
    bs32/6144 with the recorded p90 production calibration — so a
    regression in any flagship path shows up in BENCH_r*.json.
    DPCR_BENCH_EXTRA=0 skips them (primary row only).

vs_baseline: the reference publishes NO throughput numbers (BASELINE.md).
We normalize against a documented estimate of the reference pipeline on an
A100: ~100 plots/s (batch 32 in ~0.32 s including its per-batch host
preprocessing; MinkowskiEngine sparse convs + DataLoader transforms).
vs_baseline = plots_per_sec / 100.0. The `mfu`/`membw_util` fields give the
roofline-grounded view (RESULTS.md "Roofline" section).
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

# datasheet peaks per device kind (substring match on device_kind)
_PEAKS = {
    "v5 lite": {"bf16_flops": 197e12, "hbm_Bps": 819e9, "hbm_bytes": 16e9},
    "v5e": {"bf16_flops": 197e12, "hbm_Bps": 819e9, "hbm_bytes": 16e9},
    "v5p": {"bf16_flops": 459e12, "hbm_Bps": 2765e9, "hbm_bytes": 95e9},
    "v4": {"bf16_flops": 275e12, "hbm_Bps": 1228e9, "hbm_bytes": 32e9},
}


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


def _device_peaks():
    import jax
    kind = jax.devices()[0].device_kind.lower()
    for key, peaks in _PEAKS.items():
        if key in kind:
            return dict(peaks, device_kind=kind)
    return None


def _make_runner(net, mesh=None, seed=0):
    import optax

    from dpcr_agb_tpu.models.base import InstanceSpec
    from dpcr_agb_tpu.training.optim import (adabelief,
                                             cosine_annealing_warm_restarts)
    from dpcr_agb_tpu.training.step import StepRunner
    spec = InstanceSpec(
        num_reg_targets=2, scale=np.array([50.0, 80.0], np.float32),
        center=np.array([100.0, 150.0], np.float32),
        weights=np.array([0.5, 0.5], np.float32))
    tx = optax.chain(
        optax.clip(100.0),
        adabelief(cosine_annealing_warm_restarts(5e-3, 10, 2),
                  weight_decay=1e-2))
    return StepRunner(net=net, spec=spec, tx=tx, mesh=mesh, seed=seed)


def _cost_analysis(runner, state, batch):
    """flops / HBM bytes of ONE compiled train step, from XLA cost analysis.

    Uses the exact executable the timing loop runs (same donation, same
    shapes); jax caches the compilation, so this costs no extra compile.
    """
    try:
        lowered = runner._train_step.lower(
            state.params, state.batch_stats, state.opt_state, batch,
            np.int32(0))
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        out = {}
        if ca and "flops" in ca:
            out["flops_per_step"] = float(ca["flops"])
        if ca and "bytes accessed" in ca:
            out["bytes_per_step"] = float(ca["bytes accessed"])
        return out
    except Exception as e:  # cost analysis is best-effort; never kill bench
        return {"cost_analysis_error": str(e)[:160]}


def _time_steps(runner, state, batch, n_steps):
    """Steady-state seconds/step. Fetches the loss VALUE each block — on the
    axon transport block_until_ready alone does not reliably wait for device
    completion, only a host fetch does."""
    for _ in range(3):
        state, out = runner.train(state, batch)
    float(out["loss"])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, out = runner.train(state, batch)
    float(out["loss"])
    return (time.perf_counter() - t0) / n_steps, state


def _dense_example_batch(bs, n, seed=0):
    """Dense-collate batch (KPConv path): pos/mask/x, no voxel coords."""
    import jax.numpy as jnp

    from dpcr_agb_tpu.data.batch import Batch
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-0.5, 0.5, (bs, n, 3)).astype(np.float32)
    pos[:, :, 2] = rng.uniform(0, 0.6, (bs, n))
    x = rng.standard_normal((bs, n, 3)).astype(np.float32)
    y = rng.normal(size=(bs, 2)).astype(np.float32) * 50 + 100
    return Batch(
        pos=jnp.asarray(pos), x=jnp.asarray(x),
        mask=jnp.ones((bs, n), bool), y_reg=jnp.asarray(y),
        y_reg_mask=jnp.ones((bs, 2), bool),
        area_idx=jnp.zeros(bs, jnp.int32),
        label_idx=jnp.arange(bs, dtype=jnp.int64),
        is_double=jnp.zeros(bs, bool))


def _bench_net(net, batch, n_steps, peaks):
    """One model row: build runner, post-collate, time, cost-account."""
    from dpcr_agb_tpu.models.factory import make_post_collate
    runner = _make_runner(net)
    post = make_post_collate(net)
    if post is not None:
        batch = post(batch)
    state = runner.init_state(batch)
    dt, state = _time_steps(runner, state, batch, n_steps)
    bs = int(batch.mask.shape[0])
    row = {"plots_per_sec": round(bs / dt, 2), "batch_size": bs,
           "sec_per_step": round(dt, 4)}
    cost = _cost_analysis(runner, state, batch)
    row.update({k: v for k, v in cost.items()})
    if peaks and "flops_per_step" in cost:
        row["flops_per_plot"] = round(cost["flops_per_step"] / bs)
        row["mfu"] = round(cost["flops_per_step"] / dt
                           / peaks["bf16_flops"], 4)
    if peaks and "bytes_per_step" in cost:
        row["membw_util"] = round(cost["bytes_per_step"] / dt
                                  / peaks["hbm_Bps"], 4)
    return row


# recorded p90 production auto-calibration at bs32/6144 on the synthetic
# plot distribution (RESULTS.md round-3 KPConv row; the production path
# recalibrates per dataset — utils/neighbor_calibration.py)
_KPCONV_P90_KLIMS = [4, 14, 51, 70, 54]
_KPCONV_ARCH = [
    "simple", "resnetb", "resnetb_strided", "resnetb", "resnetb",
    "resnetb_strided", "resnetb", "resnetb", "resnetb_strided",
    "resnetb", "resnetb", "resnetb_strided", "resnetb", "resnetb",
    "global_sum"]


def _extra_models(peaks, n_steps, budget_s=1500.0):
    """Guard rows for the other flagship models. Each row is independent —
    a failure (OOM, missing native lib) records an error string instead of
    killing the primary metric."""
    from __graft_entry__ import _example_batch, _flagship
    rows = {}
    t_start = time.perf_counter()

    def run(name, fn):
        if time.perf_counter() - t_start > budget_s:
            rows[name] = {"skipped": "bench time budget exhausted"}
            return
        try:
            rows[name] = fn()
        except Exception as e:
            rows[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}

    run("msenet14_bs32", lambda: _bench_net(
        _flagship(), _example_batch(bs=32, n_voxels=16000), n_steps, peaks))

    def senet50():
        from dpcr_agb_tpu.models.minkowski import build_resnet

        class _DS:
            num_reg_classes = 2
        option = {"activation": "gelu", "first_stride": 1,
                  "global_pool": "sum", "drop_path": 0.01,
                  "extra_options": {"bf16": True}}
        net = build_resnet("SENet50", option, _DS(), None)
        return _bench_net(net, _example_batch(bs=16, n_voxels=16000),
                          n_steps, peaks)
    run("senet50_bs16", senet50)

    def kpconv():
        from dpcr_agb_tpu import native
        from dpcr_agb_tpu.models.kpconv import KPCNN
        if not native.is_available():
            return {"skipped": "native pointops not built"}
        net = KPCNN(architecture=_KPCONV_ARCH, num_reg_targets=2,
                    in_features_dim=3, first_features_dim=64,
                    num_kernel_points=15, first_subsampling_dl=0.0125,
                    neighborhood_limits=_KPCONV_P90_KLIMS)
        return _bench_net(net, _dense_example_batch(bs=32, n=6144),
                          max(n_steps // 2, 2), peaks)
    run("kpconv_bs32", kpconv)
    return rows


def main():
    # None = user explicitly pinned JAX_PLATFORMS=cpu (deliberate host
    # baseline); False = probe failed (tunnel down) -> labeled fallback
    probed = _probe_device_backend(
        float(os.environ.get("DPCR_PROBE_TIMEOUT", 300)))
    device_up = probed is True

    import jax

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

    peaks = _device_peaks() if device_up else None

    # bs16 primary for cross-round continuity (BENCH_r01-r03); bs32 (the
    # paper batch size) is guarded in models.msenet14_bs32. Transient-tensor
    # budgets (fold chunking, pool-backward gather) derive from the device
    # HBM limit inside ops/sparse_stem.py.
    bs, n_voxels = int(os.environ.get("DPCR_BENCH_BS", 16)), 16000
    if not device_up:
        # keep the CPU fallback bounded: small batch, quarter-cap voxels
        bs, n_voxels = int(os.environ.get("DPCR_BENCH_BS", 4)), 4000
    n_steps = 10 if device_up else 2

    row = _bench_net(_flagship(), _example_batch(bs=bs, n_voxels=n_voxels),
                     n_steps, peaks)
    plots_per_sec = row["plots_per_sec"]

    metric = ("train_throughput_msenet14_nfi" if device_up
              else "train_throughput_msenet14_nfi_cpu" if probed is None
              else "train_throughput_msenet14_nfi_CPU_FALLBACK_tunnel_down")
    out = {
        "metric": metric,
        "value": plots_per_sec,
        "unit": "plots/sec/chip" if device_up else "plots/sec (host CPU)",
        "vs_baseline": round(plots_per_sec / 100.0, 3),
        # the reference publishes no throughput numbers (BASELINE.md);
        # the denominator is our documented estimate, not a measurement
        "baseline": "estimated A100 reference rate = 100 plots/s (no "
                    "published number; see bench.py docstring)",
    }
    for k in ("mfu", "flops_per_plot", "membw_util", "bytes_per_step",
              "flops_per_step"):
        if k in row:
            out[k] = row[k]
    if device_up and peaks:
        out["device_kind"] = peaks["device_kind"]
    if device_up and os.environ.get("DPCR_BENCH_EXTRA", "1") != "0":
        out["models"] = _extra_models(peaks, n_steps)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
