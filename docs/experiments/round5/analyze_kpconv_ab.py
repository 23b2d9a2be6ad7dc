#!/usr/bin/env python
"""Aggregate the KPConv crop/disposition A/B (docs/experiments/round4/
kpconv_ab.sh) into the decision table (VERDICT r4 item 2).

For each arm: best-val epoch (min val BMag RMSE), its val/test R2 for
both targets, and epochs completed. Decision rules printed at the end:
  crop:        flip calibrate_percentile default to the fastest pct whose
               mean test R2 is within NOISE of the uncropped p100 arm
               (NOISE = max seed-pair spread observed in any arm, i.e.
               the A/B's own seed noise floor).
  disposition: keep 'descent' (the reference's K<=30 rule) unless lloyd
               beats it by more than the same noise floor.
"""
import json
import os
import sys

OUT = sys.argv[1] if len(sys.argv) > 1 else "outputs/runs_r4/kpconv_ab"


def arm(tag):
    path = os.path.join(OUT, tag, "metrics.jsonl")
    try:
        rows = [json.loads(l) for l in open(path)]
    except OSError:
        return None
    val = [r for r in rows if r.get("stage") == "val"]
    test = {r["epoch"]: r for r in rows if r.get("stage") == "test"}
    tr = [r for r in rows if r.get("stage") == "train"]
    if not val:
        return None
    best = min(val, key=lambda r: r.get("val_total_BMag_ha_rmse", 1e30))
    t = test.get(best["epoch"], {})
    return {
        "epochs": max((r.get("epoch", 0) for r in tr), default=0),
        "best_epoch": best["epoch"],
        "val_b": best.get("val_SYNTH_BMag_ha_r2"),
        "val_v": best.get("val_SYNTH_V_ha_r2"),
        "test_b": t.get("test_SYNTH_BMag_ha_r2"),
        "test_v": t.get("test_SYNTH_V_ha_r2"),
    }


def mean(xs):
    xs = [x for x in xs if x is not None]
    return sum(xs) / len(xs) if xs else None


arms = {}
for pct in (100, 90, 80):
    for s in (0, 1):
        a = arm(f"p{pct}_s{s}")
        if a is None and pct == 100:
            # bs16 p100 OOMs device HBM; the bs8 x 2-accum retry
            # (docs/experiments/round5/kpconv_p100_accum.sh) stands in
            a = arm(f"p100a8_s{s}")
        arms[f"p{pct}_s{s}"] = a
# fixed-descent arms (post sign-fix, kpconv_ab_fixed.sh) — the arms the
# round-5 decisions are actually based on
for tag in ("p90f_s0", "p90f_s1", "p100a8f_s0", "p80f_s0"):
    arms[tag] = arm(tag)
for s in (0, 1):
    arms[f"p90_lloyd_s{s}"] = arm(f"p90_lloyd_s{s}")

print(f"{'arm':>14} {'ep':>3} {'bestE':>5} {'val R2 B/V':>13} "
      f"{'test R2 B/V':>13}")
for tag, a in arms.items():
    if a is None:
        print(f"{tag:>14}  -- INCOMPLETE/MISSING")
        continue
    fmt = lambda x: "None" if x is None else f"{x:.3f}"  # noqa: E731
    print(f"{tag:>14} {a['epochs']:>3} {a['best_epoch']:>5} "
          f"{fmt(a['val_b'])}/{fmt(a['val_v']):>6} "
          f"{fmt(a['test_b'])}/{fmt(a['test_v']):>6}")

# seed-noise floor: max |s0 - s1| test-R2 spread over complete arms
spreads = []
groups = {}
for pct_tag in ("p100", "p90", "p80", "p90_lloyd"):
    pair = [arms.get(f"{pct_tag}_s{s}") for s in (0, 1)]
    if all(p and p["test_b"] is not None for p in pair):
        spreads.append(abs(pair[0]["test_b"] - pair[1]["test_b"]))
        spreads.append(abs(pair[0]["test_v"] - pair[1]["test_v"]))
    groups[pct_tag] = {
        "test_b": mean([p["test_b"] for p in pair if p]),
        "test_v": mean([p["test_v"] for p in pair if p]),
    }
noise = max(spreads) if spreads else None
print(f"\nseed-noise floor (max |s0-s1| test R2): "
      f"{noise:.3f}" if noise is not None else "\nnoise floor: n/a")
print("group means:", json.dumps(groups, indent=1, default=str))

if noise is not None and groups["p100"]["test_b"] is not None:
    ref = groups["p100"]
    for pct in ("p80", "p90"):
        g = groups[pct]
        if g["test_b"] is None:
            continue
        ok = (ref["test_b"] - g["test_b"] <= noise
              and ref["test_v"] - g["test_v"] <= noise)
        print(f"crop decision: {pct} within noise of p100: {ok}")
    g, l_ = groups["p90"], groups["p90_lloyd"]
    if g["test_b"] is not None and l_["test_b"] is not None:
        lloyd_wins = (l_["test_b"] - g["test_b"] > noise
                      and l_["test_v"] - g["test_v"] > noise)
        print(f"disposition decision: lloyd beats descent beyond noise: "
              f"{lloyd_wins} (keep descent unless True)")
