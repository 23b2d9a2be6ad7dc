#!/usr/bin/env python
"""Export a trained model as a self-contained StableHLO artifact
(jax.export) for deployment — weights baked in as constants, fixed input
shapes, no Python/flax dependency at serving time beyond jax.

    python scripts/export_model.py checkpoint_dir=outputs/run \
        model_name=SENet14 output=model.stablehlo \
        [weight_name=total_BMag_ha_rmse] [batch_size=16] [num_points=16000]

The exported function takes plain arrays
    (pos [B,N,3] f32, x [B,N,C] f32, mask [B,N] bool, coords [B,N,3] i32)
and returns de-standardized predictions [B, n_targets] f32. Sidecar json
records shapes, target names, and the transform preset the inputs must have
gone through (the host-side pipeline is NOT part of the artifact).

Supported: the sparse-voxel/dense-grid models and point models. KPConv is
rejected — its host-precomputed neighbor pyramids are runtime inputs that a
standalone artifact cannot reproduce.
"""
from __future__ import annotations

import json
import logging
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

log = logging.getLogger(__name__)


def main(overrides=None):
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s: %(message)s")
    args = {}
    for o in list(overrides if overrides is not None else sys.argv[1:]):
        k, v = o.split("=", 1)
        args[k] = v
    for req in ("checkpoint_dir", "model_name", "output"):
        if req not in args:
            raise ValueError(f"export_model.py requires {req}=")

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from dpcr_agb_tpu.data.batch import PAD_COORD, Batch
    from dpcr_agb_tpu.models.base import convert_outputs, reg_output
    from dpcr_agb_tpu.models.factory import export_aux
    from dpcr_agb_tpu.serving import load_serving_bundle

    b = load_serving_bundle(args["checkpoint_dir"], args["model_name"],
                            args.get("weight_name", "latest"),
                            args.get("transform_type"))
    # raises for models whose aux is input-dependent (KPConv pyramids,
    # map-mode sparse kernel maps); returns the full-z-extent tag for the
    # dense-grid path so tall plots are never cropped at serving time
    aux = export_aux(b.net)

    bs = int(args.get("batch_size", 16))
    n_pts = int(args.get("num_points")
                or b.collate_spec.num_points
                or (max(b.collate_spec.buckets)
                    if b.collate_spec.buckets else 16000))
    n_targets = len(b.reg_targets)
    # model input channel count: probe from params when possible, else arg
    c_dim = int(args.get("feature_dim", 0))
    if not c_dim:
        c_dim = 3  # the NFI presets build x = [ones, pos_z, xy_distance]

    variables = {"params": b.params, "batch_stats": b.batch_stats}
    use_coords = bool(b.collate_spec.use_coords)

    spec = b.spec

    def serve(pos, x, mask, coords):
        batch = Batch(
            pos=pos, x=x, mask=mask,
            y_reg=jnp.zeros((bs, n_targets), jnp.float32),
            y_reg_mask=jnp.zeros((bs, n_targets), bool),
            area_idx=jnp.zeros(bs, jnp.int32),
            label_idx=jnp.zeros(bs, jnp.int64),
            is_double=jnp.zeros(bs, bool),
            coords=coords if use_coords else None, aux=aux)
        raw = b.net.apply(variables, batch, train=False)
        return reg_output(spec, convert_outputs(spec, raw))

    ex_args = (np.zeros((bs, n_pts, 3), np.float32),
               np.zeros((bs, n_pts, c_dim), np.float32),
               np.zeros((bs, n_pts), bool),
               np.full((bs, n_pts, 3), PAD_COORD, np.int32))
    # platforms=tpu,cpu cross-lowers for serving hardware other than the
    # machine doing the export
    plats = [p for p in args.get("platforms", "").split(",") if p] or None
    exported = jexport.export(jax.jit(serve), platforms=plats)(*ex_args)
    blob = exported.serialize()
    with open(args["output"], "wb") as f:
        f.write(blob)
    sidecar = {
        "model_name": args["model_name"],
        "weight_name": args.get("weight_name", "latest"),
        "batch_size": bs, "num_points": n_pts, "feature_dim": c_dim,
        "use_coords": use_coords, "reg_targets": b.reg_targets,
        "transform_type": args.get("transform_type")
        or b.data_cfg["transform_type"],
        "inputs": "pos[B,N,3]f32, x[B,N,C]f32, mask[B,N]bool, "
                  "coords[B,N,3]i32 (PAD_COORD=-2^20 padding)",
        "platforms": list(exported.platforms),
    }
    with open(args["output"] + ".json", "w") as f:
        json.dump(sidecar, f, indent=1)
    log.info(f"exported {len(blob) / 1e6:.1f} MB StableHLO artifact to "
             f"{args['output']} (platforms {exported.platforms})")
    return args["output"]


if __name__ == "__main__":
    main()
