"""Fold the bs32 structural battery (struct_b*.json) into the VERDICT-r3
item-3 verdict: bench >= 120 plots/s at bs32, or a measured refutation.

Prints the marginal table (stem / pool / L0-free ceiling at bs32), the
scattermax A/B, and the fill-sensitivity bound on batch-flat site packing.

Run after docs/experiments/round4/exp_structural.sh:
  python docs/experiments/round4/analyze_structural.py
"""
import glob
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def load():
    out = {}
    for p in glob.glob(os.path.join(HERE, "struct_b*.json")):
        tag = os.path.basename(p)[len("struct_"):-len(".json")]
        try:
            with open(p) as f:
                out[tag] = json.loads(f.read().strip().splitlines()[-1])
        except (OSError, ValueError, IndexError):
            pass
    return out


def main():
    r = load()
    if "b0" not in r:
        print("no baseline (b0) measurement yet")
        return 1
    v = {k: d.get("value") for k, d in r.items()}
    ms = {k: 32_000.0 / val if val else None for k, val in v.items()}
    print(f"b0 baseline bs32      : {v['b0']:.1f} plots/s "
          f"({ms['b0']:.1f} ms/step)  mfu={r['b0'].get('mfu')}")
    for tag, label in [("b1", "scattermax pool"), ("b5", "fill=1.0"),
                       ("b6", "fill=0.65")]:
        if tag in v and v[tag]:
            print(f"{tag} {label:<18}: {v[tag]:.1f} plots/s "
                  f"({v[tag] / v['b0'] - 1:+.1%} vs b0)")
    if all(t in v and v[t] for t in ("b2", "b3", "b4")):
        stem = ms["b0"] - ms["b2"]
        pool = ms["b0"] - ms["b3"]
        rest = ms["b4"]
        print(f"knockout marginals bs32: stem {stem:.1f} ms, pool "
              f"{pool:.1f} ms, rest(L0-free) {rest:.1f} ms "
              f"-> L0-free ceiling {32_000.0 / rest:.0f} plots/s")
    if all(t in v and v[t] for t in ("b5", "b6")):
        # fill=1.0 has 1.29x the valid sites of the default 0.775 mean;
        # fill=0.65 has 0.84x. If cost tracks PADDED sites, both read ~b0
        # and perfect flat packing could recover at most the site-scaled
        # fraction of the step.
        print(f"fill sensitivity: d(step)/d(valid sites) ~ "
              f"{(ms['b5'] - ms['b6']) / ms['b0'] / (1.0 - 0.65):.2f} "
              f"(0 = cost prices padded sites; 1 = prices valid sites)")
    tgt = 120.0
    best = max(val for val in v.values() if val)
    print(f"item-3 gate (>=120 plots/s bs32): "
          f"{'MET' if v['b0'] >= tgt or v.get('b1', 0) and v['b1'] >= tgt else 'NOT MET'} "
          f"(best production-math config {max(v['b0'], v.get('b1') or 0):.1f}; "
          f"best incl. knockout standins {best:.1f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
