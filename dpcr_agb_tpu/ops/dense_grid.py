"""Dense-grid execution of sparse-voxel convolutions — the TPU-native fast
path for the MSENet family.

NFI plots quantize into a BOUNDED grid (unit box / first_subsampling ≈
81-101 cells per axis), and TPU MXUs crush dense 3D convolutions while
arbitrary row gathers crawl (measured: a 27-offset gather conv at V=8192 is
gather-bound; the 343-offset stem map alone ~8 s/step). So: scatter voxel
features into a [D,H,W,C] volume, run `lax.conv_general_dilated` with an
occupancy mask, and the math is EXACTLY MinkowskiConvolution semantics:

  * stride-1 conv: out[u] = sum_o W[o] x[u+o], evaluated only at occupied
    sites (mask multiply after conv) with zeros at empty sites (scatter) —
    identical to the gather formulation with zero shadow rows
  * stride-2 conv/pool: output sites = cells with >=1 occupied child
    (occupancy maxpool window 2 stride 2); values from the k^3 window around
    2u (conv stride 2, pad k//2) — identical to unique(floor(coords/2))
  * BN/SE/global pools: masked by occupancy with masked moments

Occupancy waste (empty-cell FLOPs) is repaid ~100x by MXU efficiency at
these sizes. Parity with ops/voxel.py is test-asserted.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30

# Stem/pool execution modes (ops/dense_stem.py), env-selectable so bench
# sweeps can toggle without code edits:
#   DPCR_STEM_MODE: "xla3d" (default) | "zfold_firewall" | "zfold2d_firewall"
#   DPCR_POOL_BWD:  "xla" (default: select_and_scatter) | "manual" |
#                   "separable" | "pallas" (ops/pallas_pool.py fused
#                   plane-streamed fwd + equality-routed bwd kernels)
STEM_MODE = os.environ.get("DPCR_STEM_MODE", "xla3d")
POOL_BWD_MODE = os.environ.get("DPCR_POOL_BWD", "xla")
# DPCR_L0: "sparse" (default — ops/sparse_stem.py computes the stem only
# at occupied sites; bs16 bench 69.1 plots/s at fold group g=7) or
# "dense" (full-volume stem conv; 56.3 plots/s). Sweep history in
# docs/experiments/round2/README.md.
L0_MODE = os.environ.get("DPCR_L0", "sparse")
# DPCR_SPARSE_POOL (sparse L0 only): "fused" (DEFAULT — dense forward +
# row-space custom VJP, ops/sparse_stem.pooled_rows_fused: no
# select_and_scatter, no full-res cotangent volume; bench A/B 71.84 vs
# 65.99 plots/s at bs16, docs/experiments/round3/pool_fused_ab.log),
# "dense" (scatter rows to the volume, reduce_window pool,
# select_and_scatter backward — the round-2 default), "rows" (27-row
# gather + scatter-add backward; ~170 ms at bs16), or "scattermax" (rows
# straight into the L1 volume; lost in round 2)
SPARSE_POOL_MODE = os.environ.get("DPCR_SPARSE_POOL", "fused")

# DPCR_POOL_FWD (fused sparse pool only): forward flavor under the
# row-space custom VJP — "dense" (scatter + one-pass reduce_window),
# "separable" (three axis-wise window maxes; cheaper HBM traffic per the
# cost model, more launches), "scattermax" (8-parent scatter-max straight
# into the L1 volume — never materializes the full-res 65ch volume).
# All three produce identical values (tests/test_sparse_stem.py).
POOL_FWD_MODE = os.environ.get("DPCR_POOL_FWD", "dense")

# D-fold reformulation of tiny-Cin convs (the k7 Cin<=4 stem). Microbenched
# in isolation it crushes XLA's 3D conv emitter (fwd 140->71 ms, dw
# 350->78 ms at bs16 [88,88,80] bf16), but IN-MODEL it is a net loss:
# fold-in-forward poisons global layout assignment (batch lands on the lane
# dim -> 8x-padded whole-volume tensors -> OOM), and fold-in-backward-only
# via custom_vjp measured 40.8 vs 46.3 plots/s (and re-measured 47.8 vs
# 56.4 after the all-bf16 fixes; cotangent layout copies at the custom_vjp
# boundary; XLA already fuses the in-model stem backward far better than
# the standalone microbench suggested). Kept off; the code and its parity
# tests stay as the starting point for a Pallas stem kernel.
USE_DFOLD_TINY_CIN = False


def scatter_to_dense(coords: jnp.ndarray, mask: jnp.ndarray,
                     feats: jnp.ndarray, dims: Sequence[int],
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[V,3]+[V]+[V,C] -> dense [D,H,W,C] + occupancy [D,H,W,1].
    Out-of-bounds coords (shouldn't happen for NFI presets) are dropped."""
    d, h, w = dims
    c = jnp.clip(coords, 0, jnp.asarray([d - 1, h - 1, w - 1]))
    in_bounds = jnp.all((coords >= 0) & (coords < jnp.asarray([d, h, w])),
                        axis=-1)
    valid = mask & in_bounds
    flat_idx = (c[:, 0] * h + c[:, 1]) * w + c[:, 2]
    flat_idx = jnp.where(valid, flat_idx, d * h * w)  # drop row
    # single fused scatter: [feats | occupancy-indicator] in one pass
    # (duplicate coords can't occur — voxels are deduped upstream)
    payload = jnp.concatenate(
        [jnp.where(valid[:, None], feats, 0),
         valid[:, None].astype(feats.dtype)], axis=-1)
    dense = jnp.zeros((d * h * w, payload.shape[-1]), feats.dtype)
    dense = dense.at[flat_idx].add(payload, mode="drop")
    dense = dense.reshape(d, h, w, -1)
    return dense[..., :-1], dense[..., -1:]


def gather_from_dense(dense: jnp.ndarray, coords: jnp.ndarray,
                      mask: jnp.ndarray) -> jnp.ndarray:
    """Read back per-voxel features [V,C] from a dense volume."""
    d, h, w, _ = dense.shape
    c = jnp.clip(coords, 0, jnp.asarray([d - 1, h - 1, w - 1]))
    out = dense[c[:, 0], c[:, 1], c[:, 2]]
    return jnp.where(mask[:, None], out, 0)


def dense_conv(x: jnp.ndarray, occ_out: jnp.ndarray, weights: jnp.ndarray,
               kernel_size: int, stride: int = 1,
               compute_dtype=jnp.float32) -> jnp.ndarray:
    """x [B,D,H,W,Cin]; weights [K^3,Cin,Cout] in hypercube offset order
    (z fastest — matches reshape to [k,k,k,Cin,Cout]); occ_out masks output
    sites. Returns [B,D',H',W',Cout] f32.

    See USE_DFOLD_TINY_CIN for the (disabled) tiny-Cin stem
    reformulation and the measurements behind keeping it off."""
    k = kernel_size
    cin, cout = weights.shape[-2], weights.shape[-1]
    w_dense = weights.reshape(k, k, k, cin, cout)
    pad = k // 2
    if (STEM_MODE in ("zfold_firewall", "zfold2d_firewall")
            and cin * k <= 32 and k > 1):
        from .dense_stem import stem_conv_folded
        return stem_conv_folded(x, occ_out, weights, k, stride,
                                compute_dtype,
                                two_d=STEM_MODE == "zfold2d_firewall")
    if USE_DFOLD_TINY_CIN and cin * k <= 32:
        y = _tiny_cin_conv(x.astype(compute_dtype),
                           w_dense.astype(compute_dtype), k, stride)
        return y * occ_out.astype(y.dtype)
    # compute natively in compute_dtype (MXU accumulates f32 for bf16 inputs;
    # a mixed-dtype preferred_element_type breaks the conv transpose rule)
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype), w_dense.astype(compute_dtype),
        window_strides=(stride, stride, stride),
        padding=[(pad, pad)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y * occ_out.astype(y.dtype)


def _conv3d_plain(x: jnp.ndarray, w5: jnp.ndarray, k: int,
                  stride: int) -> jnp.ndarray:
    pad = k // 2
    return jax.lax.conv_general_dilated(
        x, w5, (stride,) * 3, [(pad, pad)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _tiny_cin_conv(x: jnp.ndarray, w5: jnp.ndarray, k: int,
                   stride: int) -> jnp.ndarray:
    """Tiny-Cin (stem) conv: plain 3D conv forward, D-fold backward.

    XLA's 3D dw-conv for Cin=3 k=7 is pathological on TPU (measured 350 ms
    at bs16 [88,88,80] vs 65-80 ms through the fold). Running the fold in
    the FORWARD graph instead poisons global layout assignment (batch lands
    on the lane dim for whole-volume tensors -> 8x padding -> OOM), so the
    fold lives only in the backward graph, whose layouts are isolated from
    the forward activations. The dx branch is dead-code-eliminated by XLA
    whenever the conv input is batch data (the stem), so its cost is zero
    in the training step."""
    return _conv3d_plain(x, w5, k, stride)


def _tiny_cin_conv_fwd(x, w5, k, stride):
    return _conv3d_plain(x, w5, k, stride), (x, w5)


def _tiny_cin_conv_bwd(k, stride, res, ct):
    x, w5 = res
    _, vjp = jax.vjp(
        lambda x_, w_: _dense_conv_dfold_core(x_, w_, k, stride), x, w5)
    return vjp(ct)


_tiny_cin_conv.defvjp(_tiny_cin_conv_fwd, _tiny_cin_conv_bwd)


def _dense_conv_dfold_core(x: jnp.ndarray, w_dense: jnp.ndarray, k: int,
                           stride: int) -> jnp.ndarray:
    """Equivalent conv with the D-axis taps folded into channels.

    out[b, d', h', w', o] = sum_{dd,dh,dw,c} w[dd,dh,dw,c,o] *
        xpad[b, s*d' + dd, s*h' + dh, s*w' + dw, c]
    Fold: xs[b, i, h, w, dd*Cin + c] = xpad[b, i + dd, h, w, c] sampled at
    i = 0, s, 2s, ... then a depth-1 3D conv finishes the (h, w) taps.
    A [B*D', H, W, kCin] 2D-conv reshape is ~1.7x faster still, but the
    reshape poisons downstream layouts (XLA propagates a 2x-padded
    pool-backward volume layout -> OOM at bs16), so we keep 5D NDHWC."""
    b, d, h, w_sp, cin = x.shape
    cout = w_dense.shape[-1]
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
    n_out = (d + 2 * pad - k) // stride + 1
    last = (n_out - 1) * stride
    xs = jnp.concatenate(
        [xp[:, dd:dd + last + 1:stride] for dd in range(k)], axis=-1)
    wf = jnp.transpose(w_dense, (1, 2, 0, 3, 4))
    wf = wf.reshape(1, k, k, k * cin, cout)
    return jax.lax.conv_general_dilated(
        xs, wf.astype(x.dtype),
        window_strides=(1, stride, stride),
        padding=[(0, 0), (pad, pad), (pad, pad)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def _dense_conv_dfold(x: jnp.ndarray, occ_out: jnp.ndarray,
                      w_dense: jnp.ndarray, k: int, stride: int,
                      compute_dtype) -> jnp.ndarray:
    y = _dense_conv_dfold_core(x.astype(compute_dtype),
                               w_dense.astype(compute_dtype), k, stride)
    return y * occ_out.astype(y.dtype)


def occupancy_pool(occ: jnp.ndarray) -> jnp.ndarray:
    """Next-level occupancy: cell occupied iff any of its 2^3 children is
    (= unique(floor(coords/2))). Non-differentiable by construction.
    init must match occ.dtype: a python-float -inf silently promotes the
    whole window reduction (and its backward volume) to f32."""
    pooled = jax.lax.reduce_window(
        occ, occ.dtype.type(-np.inf), jax.lax.max,
        (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "SAME")
    return jax.lax.stop_gradient(jnp.maximum(pooled, 0.0))


def dense_max_pool(x: jnp.ndarray, occ_in: jnp.ndarray,
                   occ_out: jnp.ndarray) -> jnp.ndarray:
    """Minkowski MaxPool(kernel 3, stride 2): max over the 3^3 input window
    around 2u, empty inputs excluded (-inf), output only at occupied sites.
    DPCR_POOL_BWD=manual swaps in the equality-routed backward
    (ops/dense_stem.manual_max_pool) replacing select_and_scatter;
    DPCR_POOL_BWD=separable factorizes the pool into three 1D k3/s2 window
    maxes (exact: max over a 3^3 window factorizes per axis; each pass
    halves one dim so window work is ~3+1.5+0.75 taps vs 27, and the
    autodiff backward becomes three shrinking select_and_scatters).
    NOTE: init must be the VALUE -inf for JAX's reduce_window_max gradient
    rule to apply (any other value falls back to the non-differentiable
    generic reduce_window primitive), must be a STATIC scalar (a traced
    jnp array also breaks the rule), and must be IN x's dtype — a
    python-float -inf promotes the pool and its select_and_scatter backward
    volume (the program's largest tensor) to f32, which is what capped the
    batch size at 16."""
    if POOL_BWD_MODE == "manual":
        from .dense_stem import manual_max_pool
        return manual_max_pool(x, occ_in, occ_out)
    if POOL_BWD_MODE == "pallas":
        from .pallas_pool import pallas_max_pool
        # interpret on non-TPU backends (CPU tests/virtual meshes); the
        # flag is static so each backend gets its own cached trace
        return pallas_max_pool(x, occ_in, occ_out,
                               jax.default_backend() != "tpu")
    return dense_max_pool_xla(x, occ_in, occ_out,
                              separable=POOL_BWD_MODE == "separable")


def dense_max_pool_xla(x: jnp.ndarray, occ_in: jnp.ndarray,
                       occ_out: jnp.ndarray,
                       separable: bool = False) -> jnp.ndarray:
    """The plain-XLA k3/s2 masked window max — dense_max_pool without the
    POOL_BWD_MODE dispatch (used as the forward of the fused rows->L1 pool
    in ops/sparse_stem.pooled_rows_fused, which supplies its own VJP)."""
    filled = jnp.where(occ_in > 0, x, jnp.asarray(NEG_INF, x.dtype))
    y = windowed_max(filled, separable=separable)
    return jnp.where(occ_out > 0, y, 0.0)


def windowed_max(filled: jnp.ndarray, separable: bool) -> jnp.ndarray:
    """The k3/s2 SAME-padded window max shared by dense_max_pool and
    dense_stem.manual_max_pool's forward. `separable` chains three 1D
    k3/s2 passes (exact: max over a 3^3 window factorizes per axis; each
    pass halves one dim so window work is ~3+1.5+0.75 taps vs 27). The
    init value must be the STATIC scalar -inf IN filled's dtype — see
    dense_max_pool's NOTE."""
    if separable:
        y = filled
        for axis in (1, 2, 3):
            window = [1, 1, 1, 1, 1]
            stride = [1, 1, 1, 1, 1]
            pad = [(0, 0)] * 5
            window[axis], stride[axis], pad[axis] = 3, 2, (1, 1)
            y = jax.lax.reduce_window(
                y, filled.dtype.type(-np.inf), jax.lax.max,
                tuple(window), tuple(stride), pad)
        return y
    return jax.lax.reduce_window(
        filled, filled.dtype.type(-np.inf), jax.lax.max,
        (1, 3, 3, 3, 1), (1, 2, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])


def level_dims(dims: Sequence[int], level: int) -> Tuple[int, int, int]:
    """Grid dims shrink by ceil-halving per level (SAME-padded stride 2)."""
    d, h, w = dims
    for _ in range(level):
        d, h, w = -(-d // 2), -(-h // 2), -(-w // 2)
    return d, h, w


def masked_moments_dense(x: jnp.ndarray, occ: jnp.ndarray, eps=1e-12):
    """Per-channel moments over occupied cells of [B,D,H,W,C]."""
    axes = (0, 1, 2, 3)
    count = jnp.maximum(jnp.sum(occ, axis=axes), eps)
    mean = jnp.sum(x * occ, axis=axes) / count
    var = jnp.sum(jnp.square(x - mean) * occ, axis=axes) / count
    return mean, var, count
