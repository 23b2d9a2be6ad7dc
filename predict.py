#!/usr/bin/env python
"""Label-free inference CLI — the serving path the reference does not have
(its eval.py requires a labeled dataset; reference eval flow
trainer.py:361-418 joins predictions onto the geopandas label table).

Loads a trained checkpoint, rebuilds the model and the DETERMINISTIC eval
transform pipeline from the stored run config alone
(dpcr_agb_tpu/serving.py), runs every input point-cloud file
(.las/.laz/.ply/.csv/.npz — one plot per file, the NFI distribution format)
through the jitted eval step, and writes de-standardized predictions to csv.

    python predict.py checkpoint_dir=outputs/run model_name=SENet14 \
        input='plots/*.las' output=preds.csv [weight_name=total_BMag_ha_rmse] \
        [batch_size=16] [centers=centers.csv]

`centers=` (csv with columns file,x,y) pins each plot's XY center the way
training did (the label coordinate, las_dataset.py:527-533); without it the
XY mean of the points is used — fine for plot-extracted files, documented
divergence for off-center clouds. Z is always centered on the minimum.
"""
from __future__ import annotations

import glob
import logging
import os
import sys
from typing import Dict, List, Optional

import numpy as np

log = logging.getLogger(__name__)


def _parse(overrides: List[str]) -> Dict[str, str]:
    out: Dict[str, str] = {}
    for o in overrides:
        if "=" not in o:
            raise ValueError(f"expected key=value, got {o!r}")
        k, v = o.split("=", 1)
        out[k] = v
    for req in ("checkpoint_dir", "model_name", "input"):
        if req not in out:
            raise ValueError(f"predict.py requires {req}=")
    return out


def _sample_from_file(path: str, feature_cols: List[str],
                      center_xy: Optional[tuple], pre_transform) -> Optional[dict]:
    from dpcr_agb_tpu.data.las_io import read_pt
    pos, feats, _ = read_pt(path, feature_cols)
    if len(pos) == 0:
        log.warning(f"{path}: empty point cloud, skipping")
        return None
    pos = np.asarray(pos, np.float64)
    center = pos.min(axis=0, keepdims=True).copy()
    if center_xy is not None:
        center[:, 0], center[:, 1] = center_xy
    else:
        center[:, 0] = pos[:, 0].mean()
        center[:, 1] = pos[:, 1].mean()
    sample: dict = {"pos": (pos - center).astype(np.float32)}
    if feature_cols and feats is not None:
        sample["x"] = np.asarray(feats, np.float32)
    sample["label_idx"] = np.int64(0)
    sample["area_idx"] = np.int64(0)
    if pre_transform is not None:
        rng = np.random.default_rng(0)  # pre_transforms are deterministic
        sample = pre_transform(rng, sample)
        if sample["pos"].shape[0] == 0:
            log.warning(f"{path}: pre_transform left 0 points, skipping")
            return None
    return sample


def main(overrides=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s")
    args = _parse(list(overrides if overrides is not None else sys.argv[1:]))

    import optax

    from dpcr_agb_tpu.data.batch import collate
    from dpcr_agb_tpu.serving import load_serving_bundle
    from dpcr_agb_tpu.training.state import TrainState
    from dpcr_agb_tpu.training.step import StepRunner

    b = load_serving_bundle(args["checkpoint_dir"], args["model_name"],
                            args.get("weight_name", "latest"),
                            args.get("transform_type"))

    files = sorted(glob.glob(args["input"]))
    if os.path.isdir(args["input"]):
        files = sorted(glob.glob(os.path.join(args["input"], "*")))
    if not files:
        raise FileNotFoundError(f"no input files match {args['input']!r}")

    centers: Dict[str, tuple] = {}
    if args.get("centers"):
        import csv as _csv
        with open(args["centers"]) as f:
            for row in _csv.DictReader(f):
                centers[row["file"]] = (float(row["x"]), float(row["y"]))

    rng = np.random.default_rng(0)
    samples, names = [], []
    for path in files:
        s = _sample_from_file(path, b.feature_cols,
                              centers.get(os.path.basename(path)),
                              b.pre_transform)
        if s is None:
            continue
        samples.append(b.eval_transform(rng, s))
        names.append(os.path.basename(path))
    if not samples:
        raise ValueError("no usable input files")
    n_targets = len(b.reg_targets)
    for s in samples:  # label-free: NaN targets, all-False loss masks
        s["y_reg"] = np.full(n_targets, np.nan, np.float32)
        s["y_reg_mask"] = np.zeros(n_targets, bool)

    runner = StepRunner(net=b.net, spec=b.spec, tx=optax.sgd(0.0), mesh=None,
                        seed=0)
    state = TrainState(params=b.params, batch_stats=b.batch_stats,
                       opt_state=())

    bs = int(args.get("batch_size", 16))
    rows = []
    for i in range(0, len(samples), bs):
        chunk = samples[i:i + bs]
        batch = collate(chunk, b.collate_spec, pad_to_batch=bs)
        if b.post_collate is not None:
            batch = b.post_collate(batch)
        out = runner.evaluate(state, batch)
        preds = np.asarray(out["reg_out"])[: len(chunk)]
        for name, p in zip(names[i:i + bs], preds):
            rows.append([name] + [float(v) for v in p])

    out_path = args.get("output") or os.path.join(args["checkpoint_dir"],
                                                  "predictions.csv")
    import csv as _csv
    with open(out_path, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["file"] + [f"pred_{t}" for t in b.reg_targets])
        w.writerows(rows)
    log.info(f"wrote {len(rows)} predictions to {out_path}")
    return out_path


if __name__ == "__main__":
    main()
