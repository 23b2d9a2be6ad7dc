"""Model factory (reference models/model_factory.py:7-44 + the per-model
`class:` strings in conf/models/instance/*.yaml).

`instantiate_model(models_cfg, model_name, dataset)` returns a ModelBundle:
the flax module (callable as net(batch, train)), the InstanceSpec loss
config, and loader/collate policy — everything the trainer needs.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

from ..data.batch import CollateSpec
from .base import InstanceSpec, build_instance_spec
from .pointnet import MPointNet
from .simplestnet import SimplestNet

# class-string -> builder(option, dataset, bn_axis_name) -> (module, conv_type)
_BUILDERS: Dict[str, Callable] = {}


def register_builder(class_str: str):
    def wrap(fn):
        _BUILDERS[class_str] = fn
        return fn
    return wrap


@dataclasses.dataclass
class ModelBundle:
    name: str
    net: Any                      # flax module: net(batch, train=...)
    spec: InstanceSpec
    conv_type: str
    collate: CollateSpec
    option: Any                   # resolved model config entry
    head_namespace: str = "final"
    head_optim_settings: dict = dataclasses.field(default_factory=dict)
    backbone_optim_settings: dict = dataclasses.field(default_factory=dict)
    post_collate: Optional[Callable] = None  # host precompute (batch -> batch)


@register_builder("minkowski.MinkowskiBaselineModel")
def _build_minkowski(option, dataset, bn_axis_name):
    name = option["model_name"]
    kwargs = dict(
        num_reg_targets=dataset.num_reg_classes,
        activation=option.get("activation", "relu"),
        global_pool=option.get("global_pool", "mean"),
        dropout=option.get("dropout", 0.0),
        bn_momentum=option.get("bn_momentum", 0.1),
        bn_axis_name=bn_axis_name,
    )
    if name == "MinkowskiPointNet":
        return MPointNet(add_pos=option.get("add_pos", False), **kwargs), "SPARSE"
    from .minkowski import build_resnet  # deferred: sparse engine
    return build_resnet(name, option, dataset, bn_axis_name), "SPARSE"


@register_builder("simplestnet.SimplestNet")
def _build_simplest(option, dataset, bn_axis_name):
    return SimplestNet(num_reg_targets=dataset.num_reg_classes,
                       bn_axis_name=bn_axis_name), "PARTIAL_DENSE"


@register_builder("kpconv.KPConv")
def _build_kpconv(option, dataset, bn_axis_name):
    from .kpconv import build_kpconv
    return build_kpconv(option, dataset, bn_axis_name), "PARTIAL_DENSE"


@register_builder("pointnext.PointNext")
def _build_pointnext(option, dataset, bn_axis_name):
    from .pointnext import build_pointnext
    return build_pointnext(option, dataset, bn_axis_name), "PARTIAL_DENSE"


def make_post_collate(net) -> Optional[Callable]:
    """Host-side pyramid precompute for models that consume batch.aux
    (ops/host_pyramid.py): map-mode SparseResNet and KPCNN."""
    from .minkowski import DEFAULT_LEVEL_FRACS, SparseResNet
    if isinstance(net, SparseResNet):
        if net.dense_dims is not None:
            # dense path: only a z-extent bucket tag (dims specialize per
            # bucket; the stem cost scales with the z dimension)
            import dataclasses as _dc
            import numpy as _np
            z_max_dim = net.dense_dims[2]
            buckets = sorted({min(b, z_max_dim)
                              for b in (48, 64, 80, z_max_dim)})

            dxy = net.dense_dims[:2]

            def post_collate(batch):
                import jax as _jax

                from ..data.batch import normalize_sparse_rows
                if _jax.process_count() > 1:
                    # the bucket must be identical on every host (same
                    # compiled program) but depends on the LOCAL batch's
                    # z-extent — pin to the max under multi-host
                    zb = z_max_dim
                else:
                    coords = _np.asarray(batch.coords)
                    mask = _np.asarray(batch.mask)
                    z = coords[..., 2]
                    z_need = int(z[mask].max()) + 1 if mask.any() else 1
                    zb = next((b for b in buckets if b >= z_need), z_max_dim)
                # row-layout contract for the device scatters (sorted,
                # unique, in-volume, padding at tail): see
                # data/batch.normalize_sparse_rows
                batch = normalize_sparse_rows(batch, (*dxy, zb))
                return _dc.replace(
                    batch, aux={"zcells": _np.zeros(zb, _np.int8)})

            return post_collate
        from ..ops.host_pyramid import (make_sparse_post_collate,
                                        resnet_pyramid_plan)

        def plan_fn(v0: int):
            return resnet_pyramid_plan(net.first_stride, net.strides, v0,
                                       DEFAULT_LEVEL_FRACS,
                                       caps=net.level_caps)

        return make_sparse_post_collate(plan_fn)

    from .kpconv import DEFAULT_POINT_FRACS, KPCNN
    if isinstance(net, KPCNN):
        from .. import native
        if not native.is_available():
            return None  # device pyramid fallback
        from ..ops.host_pyramid import (kpconv_pyramid_plan,
                                        make_kpconv_post_collate)
        levels, _ = net._layer_plan()
        n_levels = len(levels)
        klims = list(net.neighborhood_limits or [40] * n_levels)
        deform_levels = [any("deformable" in b for b in lv) for lv in levels]

        def plan_fn(n0: int):
            return kpconv_pyramid_plan(
                net.first_subsampling_dl, net.conv_radius, n_levels, n0,
                net.point_fracs or DEFAULT_POINT_FRACS, klims,
                deform_levels, net.deform_radius / net.conv_radius)

        return make_kpconv_post_collate(plan_fn)
    return None


def export_aux(net):
    """Static `batch.aux` for a standalone (StableHLO) export, or None.

    Models whose aux is *input-dependent* (map-mode SparseResNet kernel maps,
    KPConv neighbor pyramids — both computed per batch by the host
    post-collate) cannot be baked into a fixed artifact; raise for those.
    The dense-grid path's aux is only a static z-extent tag: bake the FULL
    z extent so serving inputs of any height are representable (a probe
    through make_post_collate would pick the smallest bucket instead and
    silently drop voxels above it at scatter time)."""
    import numpy as _np

    from .kpconv import KPCNN
    from .minkowski import SparseResNet
    if isinstance(net, KPCNN) or (
            isinstance(net, SparseResNet) and net.dense_dims is None):
        raise ValueError(
            f"{type(net).__name__} consumes host-precomputed, input-dependent "
            "batch.aux (neighbor pyramids / kernel maps) and cannot be "
            "exported as a standalone artifact; serve it with predict.py")
    if isinstance(net, SparseResNet):
        return {"zcells": _np.zeros(net.dense_dims[2], _np.int8)}
    return None


def _collate_spec(conv_type: str, option, dataset) -> CollateSpec:
    dataset_opt = getattr(dataset, "dataset_opt", {})
    get = dataset_opt.get if hasattr(dataset_opt, "get") else dict(dataset_opt).get
    if conv_type == "SPARSE":
        # fixed bucket ladder caps the number of XLA programs at 3
        buckets = get("buckets", (4096, 8192, 16384))
        return CollateSpec(conv_type="sparse", use_coords=True,
                           buckets=tuple(buckets),
                           min_bucket=int(get("min_bucket", 1024)))
    # the pad size comes from the data preset's fixed point count; a model's
    # own num_points is an FPS target applied inside the model
    # (kpconv.py:49-67, pointnext.py:134-151), not the collate size
    tt = get("transform_type", None)
    num_points = None
    preset = get(str(tt), None) if tt else None
    if preset is not None:
        num_points = preset.get("num_points") if hasattr(preset, "get") \
            else None
    if num_points is None:
        fixed = get("fixed", None)
        if fixed is not None:
            num_points = fixed.get("num_points") if hasattr(fixed, "get") \
                else fixed["num_points"]
    return CollateSpec(conv_type="dense", num_points=num_points,
                       min_bucket=int(get("min_bucket", 1024)))


def instantiate_model(models_cfg, model_name: str, dataset,
                      bn_axis_name: Optional[str] = "data") -> ModelBundle:
    if model_name not in models_cfg:
        raise ValueError(f"Model {model_name!r} not found in models config. "
                         f"Available: {sorted(models_cfg)}")
    option = models_cfg[model_name]
    class_str = option["class"]
    if class_str not in _BUILDERS:
        raise ValueError(f"Unknown model class: {class_str}. "
                         f"Known: {sorted(_BUILDERS)}")
    net, conv_type = _BUILDERS[class_str](option, dataset, bn_axis_name)
    conv_type = option.get("conv_type", conv_type)
    spec = build_instance_spec(dataset, option)
    post_collate = make_post_collate(net)
    return ModelBundle(
        post_collate=post_collate,
        name=model_name, net=net, spec=spec, conv_type=conv_type,
        collate=_collate_spec(conv_type, option, dataset), option=option,
        head_namespace=option.get("head_namespace", "final"),
        head_optim_settings=dict(option.get("head_optim_settings", {}) or {}),
        backbone_optim_settings=dict(option.get("backbone_optim_settings", {})
                                     or {}),
    )
