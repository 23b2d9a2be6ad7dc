"""Sparse-voxel ResNet/SENet family (the paper's MSENet14/50 rows) on the
TPU-native voxel engine — behavioral port of
modules/MinkowskiEngine/{SENet.py:14-194, resnet_block.py:31-133,
senet_block.py:33-147} wrapped by models/instance/minkowski.py:29-89.

Architecture (SENet.py): stem ConvNormAct(k=7, stride=first_stride) +
MaxPool(k=3,s=2), 4 stages with strides (1,2,2,2) of Basic/Bottleneck blocks
(SE variants add squeeze-excite before the residual add), masked global pool
{sum,mean,max}, optional dropout, SeparateLinear head. gelu activations,
DropPath stochastic depth, trunc_normal(0.02) init, BN(momentum cfg).

TPU formulation: all resolution levels and kernel maps are computed once per
forward from the quantized coords (sort + binary search, ops/voxel.py), then
every conv is gather+matmul on the MXU. Shapes are static: level v-caps
default to decreasing fractions of the input cap and can be overridden with
`extra_options.level_caps`.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..nn.blocks import ACTIVATIONS, Dropout, DropPath, SELayer, SeparateLinear
from ..nn.init import trunc_normal
from ..nn.norm import MaskedBatchNorm, MaskedLayerNorm
from ..ops.masked import GLOBAL_POOL
from ..ops.voxel import (VoxelGrid, build_grid, downsample, hypercube_offsets,
                         kernel_map, max_pool_apply, sparse_conv_apply)

DEFAULT_LEVEL_FRACS = (1.0, 0.75, 0.4, 0.2, 0.1, 0.05, 0.03)


def _round8(n: int) -> int:
    return max(8, int(-(-n // 8) * 8))


def build_levels(coords: jnp.ndarray, mask: jnp.ndarray, n_levels: int,
                 caps: Sequence[int]) -> list:
    """Per-batch resolution pyramid: level l has unit coords at tensor stride
    2^l. Returns [n_levels] of batched VoxelGrids (leaves shaped [B, ...])."""
    grids = [jax.vmap(build_grid)(coords, mask)]
    for l in range(1, n_levels):
        ds = jax.vmap(lambda g: downsample(g, None, 2, caps[l])[0])
        grids.append(ds(grids[l - 1]))
    return grids


def batched_kernel_map(in_grid, out_grid, offsets: np.ndarray,
                       stride: int) -> jnp.ndarray:
    offs = jnp.asarray(offsets)
    return jax.vmap(lambda gi, go: kernel_map(gi, go, offs, stride))(
        in_grid, out_grid)


class SparseConv(nn.Module):
    """Minkowski-style sparse convolution over precomputed neighbor maps."""
    features: int
    kernel_volume: int            # K = kernel_size**3 (1 for pointwise)
    use_bias: bool = True
    offset_chunk: Any = None      # None = auto (ops/voxel.py target_cols)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, nbr_idx: Optional[jnp.ndarray] = None,
                 dense_occ: Optional[jnp.ndarray] = None, stride: int = 1,
                 sites: Optional[tuple] = None):
        """Three execution modes over the SAME parameters:
        * map mode: x [B,V_in,C], nbr_idx [B,K,V_out] (None = pointwise)
        * dense mode: x [B,D,H,W,C], dense_occ = output occupancy volume
          (ops/dense_grid.py — MXU 3D convolution, the TPU fast path)
        * sites mode: x [B,V,C] rows + sites=(coords [B,V,3], mask [B,V],
          dims) — ops/sparse_stem.py patch-gather conv evaluated only at
          occupied sites (the level-0 fast path; ~2% occupancy makes the
          dense conv ~50x redundant there)
        """
        cin = x.shape[-1]
        kernel = self.param("kernel", trunc_normal(0.02),
                            (self.kernel_volume, cin, self.features))
        if sites is not None:
            from ..ops.sparse_stem import stem_conv_sparse_batch
            coords, mask, dims = sites
            k = round(self.kernel_volume ** (1.0 / 3.0))
            y = stem_conv_sparse_batch(
                coords, mask, x.astype(self.dtype), dims,
                kernel.astype(self.dtype), k, compute_dtype=self.dtype)
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.features,))
                y = (y + bias.astype(y.dtype)) * sites[1][..., None].astype(
                    y.dtype)
            return y
        if dense_occ is not None:
            from ..ops.dense_grid import dense_conv
            k = round(self.kernel_volume ** (1.0 / 3.0))
            if x.ndim == 5 and self.kernel_volume == 1 and stride == 1:
                y = jnp.dot(x.astype(self.dtype),
                            kernel[0].astype(self.dtype),
                            preferred_element_type=jnp.float32) * dense_occ
            else:
                y = dense_conv(x, dense_occ, kernel, k, stride, self.dtype)
        elif nbr_idx is None:  # kernel 1, stride 1: plain matmul
            y = jnp.dot(x.astype(self.dtype), kernel[0].astype(self.dtype),
                        preferred_element_type=jnp.float32)
        else:
            conv = jax.vmap(lambda f, idx: sparse_conv_apply(
                f, idx, kernel.astype(self.dtype),
                offset_chunk=self.offset_chunk))
            y = conv(x.astype(self.dtype), nbr_idx)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            # bias param is f32; add in y's compute dtype — promoting the
            # whole activation volume to f32 here doubled the dense path's
            # pool-backward memory and capped the batch size at 16
            y = y + bias.astype(y.dtype)
            if dense_occ is not None:
                y = y * dense_occ  # bias only at occupied sites
        return y


def make_norm(norm_type: str, features: int, bn_momentum: float,
              axis_name=None, name=None):
    if norm_type == "bn":
        return MaskedBatchNorm(features, momentum=bn_momentum,
                               axis_name=axis_name, name=name)
    if norm_type == "bn_no_affine":
        return MaskedBatchNorm(features, momentum=bn_momentum, affine=False,
                               axis_name=axis_name, name=name)
    if norm_type == "ln":
        return MaskedLayerNorm(features, name=name)
    if norm_type == "in":
        from ..nn.norm import MaskedInstanceNorm
        return MaskedInstanceNorm(features, name=name)
    raise NotImplementedError(
        f"norm_type={norm_type!r} (bn, bn_no_affine, in, ln)")


class ResBlock(nn.Module):
    """BasicBlock / Bottleneck (+SE) over one (or two) resolution levels."""
    planes: int
    bottleneck: bool
    se: bool
    act_name: str = "gelu"
    stride: int = 1
    drop_path: float = 0.0
    use_bias: bool = True
    bn_momentum: float = 0.1
    norm_type: str = "bn"
    bn_axis_name: Any = None
    se_reduction: int = 16
    dtype: Any = jnp.float32

    @property
    def expansion(self) -> int:
        return 4 if self.bottleneck else 1

    @nn.compact
    def __call__(self, x, in_mask, out_mask, k3_map, k3_out_map, k1_map,
                 train: bool, dense: bool = False):
        """Map mode: k3_map [B,27,V_out] is the (possibly strided) in->out
        3^3 map for the block's first 3^3 conv; k3_out_map the stride-1 map at
        the output level; k1_map [B,1,V_out] the strided shortcut map.
        Dense mode (dense=True): x [B,D,H,W,C], in_mask/out_mask are
        occupancy volumes [B,D,H,W,1]; maps are ignored."""
        act = ACTIVATIONS[self.act_name]
        exp = self.planes * self.expansion
        need_proj = self.stride != 1 or x.shape[-1] != exp

        def flat(feats, occ):
            if not dense:
                return feats, occ
            b = feats.shape[0]
            return (feats.reshape(b, -1, feats.shape[-1]),
                    occ.reshape(b, -1) > 0)

        def norm_with(feats, occ, width, name):
            f2, m2 = flat(feats, occ)
            y = make_norm(self.norm_type, width, self.bn_momentum,
                          self.bn_axis_name, name=name)(
                f2, m2, use_running_average=not train)
            return y.reshape(feats.shape[:-1] + (width,)) if dense else y

        def conv(width, kvol, name, inp, nbr, occ, stride=1):
            if dense:
                return SparseConv(width, kvol, self.use_bias,
                                  dtype=self.dtype, name=name)(
                    inp, dense_occ=occ, stride=stride)
            return SparseConv(width, kvol, self.use_bias, dtype=self.dtype,
                              name=name)(inp, nbr)

        if self.bottleneck:
            out = conv(self.planes, 1, "conv1", x, None, in_mask)
            out = norm_with(out, in_mask, self.planes, "norm1")
            out = act(out)
            out = conv(self.planes, 27, "conv2", out, k3_map, out_mask,
                       self.stride)
            out = norm_with(out, out_mask, self.planes, "norm2")
            out = act(out)
            out = conv(exp, 1, "conv3", out, None, out_mask)
            out = norm_with(out, out_mask, exp, "norm3")
        else:
            out = conv(self.planes, 27, "conv1", x, k3_map, out_mask,
                       self.stride)
            out = norm_with(out, out_mask, self.planes, "norm1")
            out = act(out)
            out = conv(self.planes, 27, "conv2", out, k3_out_map, out_mask)
            out = norm_with(out, out_mask, self.planes, "norm2")

        if self.se:
            width = exp if self.bottleneck else self.planes
            f2, m2 = flat(out, out_mask)
            y = SELayer(width, act, self.se_reduction, name="se")(f2, m2)
            out = y.reshape(out.shape) if dense else y

        residual = x
        if need_proj:
            if dense:
                residual = SparseConv(exp, 1, self.use_bias, dtype=self.dtype,
                                      name="downsample_conv")(
                    x, dense_occ=out_mask, stride=self.stride)
            else:
                residual = SparseConv(exp, 1, self.use_bias, dtype=self.dtype,
                                      name="downsample_conv")(
                    x, k1_map if self.stride != 1 else None)
            residual = norm_with(residual, out_mask, exp, "downsample_norm")

        out = DropPath(self.drop_path, name="drop_path")(
            out, deterministic=not train) + residual
        out = act(out)
        if dense:
            return jnp.where(out_mask > 0, out, 0.0)
        return jnp.where(out_mask[..., None], out, 0.0)


class SparseResNet(nn.Module):
    """ResNetBase (SENet.py:14-118) on the voxel engine."""
    num_reg_targets: int
    block: str                     # basic | bottleneck | se_basic | se_bottleneck
    layers: Sequence[int]
    strides: Sequence[int] = (1, 2, 2, 2)
    planes: Sequence[int] = (64, 128, 256, 512)
    init_dim: int = 64
    activation: str = "gelu"
    first_stride: int = 1
    global_pool: str = "sum"
    dropout: float = 0.0
    drop_path: float = 0.0
    bn_momentum: float = 0.1
    norm_type: str = "bn"
    use_bias: bool = True
    level_caps: Optional[Sequence[int]] = None
    bn_axis_name: Any = None
    dtype: Any = jnp.float32
    # dense-grid execution (ops/dense_grid.py): scatter voxels into a bounded
    # [D,H,W] volume and run MXU 3D convs — the TPU fast path. None disables.
    dense_dims: Optional[Tuple[int, int, int]] = (88, 88, 104)

    @nn.compact
    def __call__(self, batch, train: bool = False,
                 enable_dropout: bool = False):
        """enable_dropout keeps the head Dropout active in eval (the
        reference's enable_dropout_in_eval, base_model.py:352-360)."""
        if batch.coords is None:
            raise ValueError("SparseResNet requires quantized coords "
                             "(use a sparse transform preset)")
        coords, mask = batch.coords, batch.mask
        x = batch.x.astype(self.dtype)
        bottleneck = "bottleneck" in self.block
        se = self.block.startswith("se")
        act = ACTIVATIONS[self.activation]

        if self.dense_dims is not None:
            return self._dense_forward(batch, train, enable_dropout,
                                       bottleneck, se, act)

        # ---- resolution pyramid + kernel maps (no params) ----
        # Preferred source: host-precomputed maps shipped as batch.aux
        # (ops/host_pyramid.py, built in the loader's prefetch threads) —
        # device sorts/searchsorted proved slow on TPU. Fallback: compute
        # on device (same semantics) when aux is absent.
        n_down = sum(1 for s in self.strides if s != 1) + 1  # + stem pool
        if self.first_stride != 1:
            n_down += 1
        n_levels = n_down + 1
        v0 = coords.shape[1]
        if self.level_caps is not None:
            caps = list(self.level_caps)
        else:
            caps = [_round8(int(v0 * DEFAULT_LEVEL_FRACS[min(
                l, len(DEFAULT_LEVEL_FRACS) - 1)])) for l in range(n_levels)]

        aux = batch.aux if isinstance(batch.aux, dict) and "pool_map" \
            in batch.aux else None
        off27 = hypercube_offsets(3)
        off343 = hypercube_offsets(7)
        off1 = hypercube_offsets(1)

        if aux is not None:
            masks = [aux[f"mask{l}"] for l in range(n_levels)]
            stem_map = aux["stem_map"]
            pool_map = aux["pool_map"]
            get_s1 = lambda lv: aux[f"s1_map{lv}"]  # noqa: E731
            get_down = lambda si: (aux[f"down_k3_{si}"],  # noqa: E731
                                   aux[f"down_k1_{si}"])
        else:
            grids = build_levels(coords, mask, n_levels, caps)
            masks = [g.mask for g in grids]
            if self.first_stride == 1:
                stem_map = batched_kernel_map(grids[0], grids[0], off343, 1)
            else:
                stem_map = batched_kernel_map(grids[0], grids[1], off343, 2)
            _stem_lv = 0 if self.first_stride == 1 else 1
            pool_map = batched_kernel_map(grids[_stem_lv],
                                          grids[_stem_lv + 1], off27, 2)
            _s1_cache = {}

            def get_s1(lv):
                if lv not in _s1_cache:
                    _s1_cache[lv] = batched_kernel_map(grids[lv], grids[lv],
                                                       off27, 1)
                return _s1_cache[lv]

            _down_levels = {}
            _lv = _stem_lv + 1
            for _si, _s in enumerate(self.strides):
                if _s != 1:
                    _down_levels[_si] = _lv
                    _lv += 1

            def get_down(si):
                lv = _down_levels[si]
                return (batched_kernel_map(grids[lv], grids[lv + 1], off27, 2),
                        batched_kernel_map(grids[lv], grids[lv + 1], off1, 2))

        level = 0
        # ---- stem: conv k7 stride first_stride + norm + act + maxpool k3 s2
        stem_out_level = 0 if self.first_stride == 1 else 1
        h = SparseConv(self.init_dim, off343.shape[0], self.use_bias,
                       dtype=self.dtype, name="stem_conv")(x, stem_map)
        level = stem_out_level
        h = make_norm(self.norm_type, self.init_dim, self.bn_momentum,
                      self.bn_axis_name, name="stem_norm")(
            h, masks[level], use_running_average=not train)
        h = act(h)
        h = jax.vmap(max_pool_apply)(h, pool_map, masks[level + 1])
        level += 1

        # ---- stages ----
        for si, (planes, n_blocks, stride) in enumerate(
                zip(self.planes, self.layers, self.strides)):
            for bi in range(n_blocks):
                s = stride if bi == 0 else 1
                in_mask = masks[level]
                if s != 1:
                    k3, k1 = get_down(si)
                    level += 1
                    k3_out = get_s1(level)
                else:
                    k3 = get_s1(level)
                    k3_out = k3
                    k1 = None
                h = ResBlock(planes=planes, bottleneck=bottleneck, se=se,
                             act_name=self.activation, stride=s,
                             drop_path=self.drop_path, use_bias=self.use_bias,
                             bn_momentum=self.bn_momentum,
                             norm_type=self.norm_type,
                             bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                             name=f"stage{si}_block{bi}")(
                    h, in_mask, masks[level], k3, k3_out, k1, train)

        # ---- head ----
        g = GLOBAL_POOL[self.global_pool](h.astype(jnp.float32),
                                          masks[level])
        g = Dropout(self.dropout)(g, deterministic=not (train or enable_dropout))
        return SeparateLinear(self.num_reg_targets, name="final")(g)

    def _dense_forward(self, batch, train, enable_dropout, bottleneck, se,
                       act):
        """Dense-grid execution (same parameters/submodule names as the map
        path — checkpoints interchange; parity is test-asserted).

        z-bucketing: when the loader attaches aux['zcells'] (a dummy array
        whose LENGTH is the batch's z-extent bucket), the volume's z dim
        shrinks to it — the stem cost scales with z, and jit re-specializes
        per bucket (a handful of compiles)."""
        from ..ops.dense_grid import (L0_MODE, dense_max_pool, level_dims,
                                      occupancy_pool, scatter_to_dense)
        coords, mask = batch.coords, batch.mask
        dims = tuple(self.dense_dims)
        if isinstance(batch.aux, dict) and "zcells" in batch.aux:
            dims = (dims[0], dims[1],
                    min(int(batch.aux["zcells"].shape[-1]), dims[2]))
        feats = batch.x.astype(self.dtype)

        def norm_flat(y, occ_v, width, name):
            b = y.shape[0]
            y2 = make_norm(self.norm_type, width, self.bn_momentum,
                           self.bn_axis_name, name=name)(
                y.reshape(b, -1, width), occ_v.reshape(b, -1) > 0,
                use_running_average=not train)
            return y2.reshape(y.shape[:-1] + (width,))

        # ---- stem ----
        if L0_MODE == "sparse" and self.first_stride == 1:
            # sparse level 0 (ops/sparse_stem.py): stem conv + BN + act +
            # maxpool on occupied ROWS only; densify at level 1 where
            # occupancy is ~8x higher. Removes the program's two largest
            # tensors (the full-res stem activation and the pool's
            # select_and_scatter backward volume).
            from ..ops.dense_grid import SPARSE_POOL_MODE
            from ..ops.sparse_stem import (max_pool_sparse,
                                           pool_neighbor_map_batch)
            h_rows = SparseConv(
                self.init_dim, 343, self.use_bias, dtype=self.dtype,
                name="stem_conv")(feats, sites=(coords, mask, dims))
            h_rows = make_norm(self.norm_type, self.init_dim,
                               self.bn_momentum, self.bn_axis_name,
                               name="stem_norm")(
                h_rows, mask, use_running_average=not train)
            h_rows = act(h_rows) * mask[..., None].astype(h_rows.dtype)
            if SPARSE_POOL_MODE == "fused":
                # dense forward (scatter + reduce_window — cheapest fwd,
                # round 2) with a row-space custom VJP: L1 cotangents are
                # routed straight to rows via the 8-parent equality gather;
                # no select_and_scatter, no full-res cotangent volume
                from ..ops.sparse_stem import pooled_rows_fused
                h, occ_l = pooled_rows_fused(coords, mask, h_rows, dims)
            elif SPARSE_POOL_MODE == "scattermax":
                # pool rows straight into the L1 volume (1..8 parent cells
                # per site): no full-res 64ch volume, no reduce_window, no
                # select_and_scatter backward
                from ..ops.sparse_stem import scatter_max_pool_batch
                h, occ_l = scatter_max_pool_batch(coords, mask, h_rows,
                                                  dims)
            elif SPARSE_POOL_MODE == "dense":
                # scatter the (BN'd, activated) rows back to the full-res
                # volume and pool densely: the dense pool fwd+bwd measured
                # cheaper than 27-row gathers + scatter-add backward
                from ..ops.sparse_stem import scatter_to_dense_batch
                hv, occ_v = scatter_to_dense_batch(coords, mask, h_rows,
                                                   dims)
                occ_l = occupancy_pool(occ_v)
                h = dense_max_pool(hv, occ_v, occ_l)
            else:
                grid0 = jax.vmap(build_grid)(coords, mask)
                v_cap = coords.shape[1]
                grid1 = jax.vmap(
                    lambda g: downsample(g, None, 2, v_cap)[0])(grid0)
                nbr = pool_neighbor_map_batch(coords, mask, grid1.coords,
                                              grid1.mask, dims)
                h_rows = max_pool_sparse(h_rows, nbr, grid1.mask)
                dims1 = level_dims(dims, 1)
                h, occ_l = jax.vmap(
                    lambda c, m, f: scatter_to_dense(c, m, f, dims1))(
                    grid1.coords, grid1.mask, h_rows)
        else:
            # dense level 0 (rematerialized: the full-resolution activation
            # is the biggest tensor in the program; recompute in backward).
            # The full-volume scatter lives HERE so the sparse path's jaxpr
            # never carries the [B,D,H,W,C] volume at all.
            h, occ = jax.vmap(
                lambda c, m, f: scatter_to_dense(c, m, f, dims))(
                coords, mask, feats)
            if self.first_stride == 1:
                occ_stem = occ
            else:
                occ_stem = occupancy_pool(occ)
            RematConv = nn.remat(SparseConv, static_argnums=(4,))
            h = RematConv(self.init_dim, 343, self.use_bias,
                          dtype=self.dtype, name="stem_conv")(
                h, None, occ_stem, self.first_stride)
            h = norm_flat(h, occ_stem, self.init_dim, "stem_norm")
            h = act(h) * occ_stem.astype(h.dtype)  # keep compute dtype
            occ_l = occupancy_pool(occ_stem)
            h = dense_max_pool(h, occ_stem, occ_l)

        # ---- stages (rematted blocks bound activation memory) ----
        RematBlock = nn.remat(ResBlock, static_argnums=(7, 8))
        for si, (planes, n_blocks, stride) in enumerate(
                zip(self.planes, self.layers, self.strides)):
            for bi in range(n_blocks):
                s = stride if bi == 0 else 1
                occ_in = occ_l
                if s != 1:
                    occ_l = occupancy_pool(occ_l)
                h = RematBlock(planes=planes, bottleneck=bottleneck, se=se,
                               act_name=self.activation, stride=s,
                               drop_path=self.drop_path,
                               use_bias=self.use_bias,
                               bn_momentum=self.bn_momentum,
                               norm_type=self.norm_type,
                               bn_axis_name=self.bn_axis_name,
                               dtype=self.dtype,
                               name=f"stage{si}_block{bi}")(
                    h, occ_in, occ_l, None, None, None, train, True)

        # ---- head ----
        hf = h.astype(jnp.float32)
        b = hf.shape[0]
        g = GLOBAL_POOL[self.global_pool](hf.reshape(b, -1, hf.shape[-1]),
                                          occ_l.reshape(b, -1) > 0)
        g = Dropout(self.dropout)(g,
                                  deterministic=not (train or enable_dropout))
        return SeparateLinear(self.num_reg_targets, name="final")(g)


_ARCHS = {
    # name -> (block, layers)
    "ResNet14_": ("basic", (1, 1, 1, 1)),
    "ResNet18_": ("basic", (2, 2, 2, 2)),
    "ResNet34_": ("basic", (3, 4, 6, 3)),
    "ResNet50_": ("bottleneck", (3, 4, 6, 3)),
    "ResNet101_": ("bottleneck", (3, 4, 23, 3)),
    "SENet14": ("se_basic", (1, 1, 1, 1)),
    "SENet18": ("se_basic", (2, 2, 2, 2)),
    "SENet34": ("se_basic", (3, 4, 6, 3)),
    "SENet50": ("se_bottleneck", (3, 4, 6, 3)),
    "SENet101": ("se_bottleneck", (3, 4, 23, 3)),
}

_ARCH_EXTRAS = {
    # SENet17 variants (SENet.py:155-169)
    "SENet17_6deep": dict(block="se_basic", layers=(1, 1, 1, 1, 2, 1),
                          strides=(1, 2, 2, 2, 2, 2), init_dim=32,
                          planes=(32, 64, 128, 256, 512, 1024)),
    "SENet17_5deep": dict(block="se_basic", layers=(1, 1, 1, 2, 2),
                          strides=(1, 2, 2, 2, 2), init_dim=64,
                          planes=(64, 128, 256, 512, 1024)),
}


def build_resnet(arch_name: str, option, dataset, bn_axis_name=None):
    extra = dict(option.get("extra_options", {}) or {})
    common = dict(
        num_reg_targets=dataset.num_reg_classes,
        activation=option.get("activation", "relu"),
        first_stride=int(option.get("first_stride", 2)),
        global_pool=option.get("global_pool", "mean"),
        dropout=float(option.get("dropout", 0.0)),
        drop_path=float(option.get("drop_path", 0.0)),
        bn_momentum=float(option.get("bn_momentum", 0.1)),
        norm_type=option.get("norm_type", "bn"),
        use_bias=bool(option.get("bias", True)),
        level_caps=extra.get("level_caps"),
        bn_axis_name=bn_axis_name,
        dtype=jnp.bfloat16 if extra.get("bf16", False) else jnp.float32,
        dense_dims=(tuple(extra["dense_dims"])
                    if extra.get("dense_dims") is not None else None)
        if "dense_dims" in extra else (88, 88, 104),
    )
    if arch_name in _ARCHS:
        block, layers = _ARCHS[arch_name]
        return SparseResNet(block=block, layers=layers, **common)
    if arch_name in _ARCH_EXTRAS:
        return SparseResNet(**{**common, **_ARCH_EXTRAS[arch_name]})
    raise ValueError(f"Unknown minkowski arch: {arch_name}. "
                     f"Known: {sorted(_ARCHS) + sorted(_ARCH_EXTRAS)}")
