"""Whole-train-step HLO op profile (round-3: decompose the 58.4 ms
'everything else' the knockout marginals left unexplained, and confirm
where the L0 sections' time sits op-by-op).

Runs the bench.py step under jax.profiler.trace and parses the xplane.pb
directly (tensorflow.tsl xplane proto — the tensorboard_plugin_profile
converter in this image is broken against its TF build), aggregating
device-plane event durations per HLO op and per hlo_category.

Run ON THE REAL TPU:  python docs/experiments/round3/exp_profile_step.py
Env: DPCR_BENCH_BS (default 16), DPCR_PROFILE_STEPS (default 3).
"""
import glob
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import numpy as np

import scripts.bench_protocol  # noqa: F401  (shared compile cache)
import jax
import optax

from __graft_entry__ import _example_batch, _flagship
from dpcr_agb_tpu.models.base import InstanceSpec
from dpcr_agb_tpu.models.factory import make_post_collate
from dpcr_agb_tpu.training.optim import (adabelief,
                                         cosine_annealing_warm_restarts)
from dpcr_agb_tpu.training.step import StepRunner

TRACE_DIR = "/tmp/dpcr_profile"


def run_traced_steps():
    bs = int(os.environ.get("DPCR_BENCH_BS", 16))
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
    batch = _example_batch(bs=bs, n_voxels=16000)
    post = make_post_collate(net)
    if post is not None:
        batch = post(batch)
    state = runner.init_state(batch)
    for _ in range(3):                                   # compile + warm
        state, out = runner.train(state, batch)
    float(out["loss"])
    n = int(os.environ.get("DPCR_PROFILE_STEPS", 3))
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(n):
            state, out = runner.train(state, batch)
        float(out["loss"])
    return n, bs


def parse_xplane(n_steps):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = sorted(glob.glob(os.path.join(
        TRACE_DIR, "plugins/profile/*/*.xplane.pb")))
    assert paths, f"no xplane.pb under {TRACE_DIR} — profiler produced " \
        f"nothing (dir contents: {os.listdir(TRACE_DIR)})"
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    print(f"[profile] planes: {[p.name for p in space.planes]}",
          flush=True)
    per_op = defaultdict(lambda: [0, 0, "?"])          # ps, count, category
    total_ps = 0
    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        if "SparseCore" in plane.name or "Host" in plane.name:
            continue
        meta = plane.event_metadata
        stat_meta = plane.stat_metadata
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry per-op events; step/module lines duplicate
            if "xla op" not in lname and "xla ops" not in lname:
                continue
            for ev in line.events:
                m = meta.get(ev.metadata_id)
                name = m.name if m else f"op{ev.metadata_id}"
                cat = "?"
                for st in list(ev.stats) + list(m.stats if m else []):
                    sm = stat_meta.get(st.metadata_id)
                    if sm is not None and sm.name == "hlo_category":
                        ref = stat_meta.get(st.ref_value)
                        cat = st.str_value or (ref.name if ref else "?")
                per_op[name][0] += ev.duration_ps
                per_op[name][1] += max(ev.num_occurrences, 1)
                if cat != "?":
                    per_op[name][2] = cat
                total_ps += ev.duration_ps
    if not per_op:
        # dump line names to debug plane/line naming mismatches
        for plane in space.planes:
            print(f"[profile] plane {plane.name}: lines "
                  f"{[ln.name for ln in plane.lines][:8]}")
        raise SystemExit("no XLA-op events found on any device plane")
    rows = sorted(per_op.items(), key=lambda kv: -kv[1][0])
    step_ms = total_ps / 1e12 / n_steps * 1e3
    print(f"[profile] device XLA-op time: {step_ms:.1f} ms/step over "
          f"{n_steps} steps, {len(rows)} distinct ops")
    print(f"{'ms/step':>9}  {'%':>5}  {'n':>4}  category         op")
    for name, (ps, cnt, cat) in rows[:40]:
        ms = ps / 1e12 / n_steps * 1e3
        print(f"{ms:9.2f}  {100 * ps / total_ps:5.1f}  {cnt // n_steps:4d}"
              f"  {cat:<15.15}  {name[:90]}")
    by_cat = defaultdict(int)
    for name, (ps, cnt, cat) in rows:
        by_cat[cat] += ps
    print("[profile] by category:")
    for cat, ps in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {ps / 1e12 / n_steps * 1e3:9.2f} ms  "
              f"{100 * ps / total_ps:5.1f}%  {cat}")
    return {name: ps / 1e12 / n_steps * 1e3 for name, (ps, _, _) in rows}


def main():
    n, bs = run_traced_steps()
    ops = parse_xplane(n)
    out = os.path.join(os.path.dirname(__file__), "profile_step_ops.json")
    with open(out, "w") as f:
        json.dump(ops, f, indent=1)
    print(f"[profile] full table -> {out}")


if __name__ == "__main__":
    main()
