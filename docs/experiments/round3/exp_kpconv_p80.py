"""KPConv device throughput at tighter (p80 / p70) neighborhood crops —
VERDICT r3 item 3: 26.7 plots/s at p90-calibrated K=[16,40,52,53,46] vs a
30 plots/s gate; the gather cost model says row count is everything, and
the reference's own neighborhood_limits crop (models/instance/kpconv.py:
133-143) proves tolerance to cropping.

Protocol: calibrate limits at p90/p80/p70 on the same synthetic plot
distribution (utils/neighbor_calibration.py), time the honest whole-model
value+grad chain at bs32/6144 for each, and (separately, CPU-fine) check
the accuracy effect of the tighter crop with a short synthetic training
run — see exp_kpconv_crop_r2.py output in the round-3 log.

Run ON THE REAL TPU:  python docs/experiments/round3/exp_kpconv_p80.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import numpy as np

import scripts.bench_protocol  # noqa: F401  (shared compile cache)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "round2"))
from exp_kpcnn_calibrated import make_inputs, time_value_grad  # noqa: E402

from dpcr_agb_tpu.utils.neighbor_calibration import (  # noqa: E402
    calibrate_neighborhood_limits)


def synth_samples(n_samples=16, n=6144, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_samples):
        pos = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
        pos[:, 2] = rng.uniform(0, 0.6, n)
        out.append({"pos": pos})
    return out


def main():
    samples = synth_samples()
    results = {}
    for pct in (90, 80, 70):
        klims = calibrate_neighborhood_limits(samples, 0.0125,
                                              percentile=float(pct))
        print(f"p{pct} limits: {klims}", flush=True)
        batch, host_s = make_inputs(32, 6144, klims)
        ms = time_value_grad(batch, 32, f"p{pct}_{klims}")
        results[f"p{pct}"] = {"klims": klims, "ms": ms,
                              "plots_per_s": 32 / ms * 1e3,
                              "host_s_per_batch": host_s}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
