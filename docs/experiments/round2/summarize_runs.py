"""Summarize flagship runs: best val/test R2 per target from metrics.jsonl."""
import json
import sys


def summarize(path):
    recs = [json.loads(l) for l in open(path)]
    out = {}
    for stage in ("val", "test"):
        srecs = [r for r in recs if r["stage"] == stage]
        for t in ("BMag_ha", "V_ha"):
            vals = [(r.get(f"{stage}_SYNTH_{t}_r2"), r["epoch"])
                    for r in srecs if f"{stage}_SYNTH_{t}_r2" in r]
            vals = [(v, e) for v, e in vals if v == v and v is not None]
            if vals:
                best = max(vals)
                out[f"{stage}_{t}"] = (round(best[0], 3), best[1])
    return out


if __name__ == "__main__":
    for p in sys.argv[1:]:
        print(p, summarize(p))
