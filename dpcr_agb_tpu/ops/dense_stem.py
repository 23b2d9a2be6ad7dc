"""Dense-stem acceleration: z-folded stem convolution behind Pallas layout
firewalls, and an equality-trick manual maxpool backward.

Round-1/2 measurements on v5e at the bench shape (bs16 x (88,88,80) x
Cin3 -> 64, bf16, honest chained timing):

  * XLA 3D k7 stem conv fwd+dW:   ~130-140 ms  (the step's dominant op)
  * z-fold reformulation (7 z-taps folded into channels -> 2D 7x7 conv,
    Cin 21) fwd+dW:                ~80 ms      in ISOLATION
  * but folding IN-MODEL regressed throughput in round 1 (47.8 vs 56.4
    plots/s): XLA layout assignment propagates the folded tensor's exotic
    layout into neighboring whole-volume ops (batch lands on lanes -> 8x
    padded tensors -> OOM/slowdowns).

The fix here: wrap the folded computation between `layout_firewall` ops —
trivial Pallas copy kernels. A custom call is opaque to XLA layout
assignment, so layouts cannot propagate across it in either direction; the
cost is one extra HBM round trip of the boundary tensors (~4 ms for the
1.27 GB stem output at 819 GB/s — repaid ~10x if it keeps the fold's
isolated speed). The firewall's custom_vjp routes cotangents through a
copy as well, isolating the backward convs identically.

`manual_max_pool` replaces `reduce_window`'s select-and-scatter backward
(pathologically slow on TPU) with an equality-mask routing: grad flows to
every input equal to its window max. This diverges from first-argmax
semantics only on exact in-window value ties between OCCUPIED cells
(bf16 makes these possible but rare); empty-cell ties at the -inf fill are
masked out by occupancy. Enabled by the same flag sweep as the fold.
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


VMEM_BLOCK_BUDGET = 4 * 1024 * 1024  # per-block bytes (double-buffered)


def _pl_copy(x: jnp.ndarray) -> jnp.ndarray:
    """Identity copy through a Pallas kernel — an XLA layout firewall.

    Mosaic pads a VMEM block's minormost dim to 128 lanes and the
    second-minor to the dtype's sublane tile (32/itemsize), so a naive
    block over e.g. a [...,80,3] stem input costs 128/3 = 42x its logical
    bytes of VMEM (round-1 sweep: a 3.7 MB window became a 317 MB
    allocation and failed to compile). Two counter-measures here: small
    trailing dims are MERGED (a free bitcast — both sides are contiguous
    minor dims) until the minormost dim is >=128 elements, and block
    growth budgets the PADDED byte size. Blocks are grown from the
    trailing dims until they hit the VMEM budget so the grid stays coarse
    (hundreds of programs, not 100k tiny ones); when even two trailing
    dims exceed the budget, the second-minor dim is split instead."""
    if x.ndim < 2 or x.size == 0:
        return x
    orig_shape = x.shape
    shape = list(x.shape)
    while len(shape) > 2 and shape[-1] < 128:
        shape[-2] *= shape[-1]
        shape.pop()
    xr = x.reshape(shape)
    itemsize = np.dtype(x.dtype).itemsize
    sublane = max(32 // itemsize, 1)
    pad_last = -(-shape[-1] // 128) * 128

    def padded_bytes(rows: int) -> int:
        return pad_last * (-(-rows // sublane) * sublane) * itemsize

    if padded_bytes(shape[-2]) > VMEM_BLOCK_BUDGET:
        # split the second-minor dim into sublane-aligned row chunks
        rows = max((VMEM_BLOCK_BUDGET // padded_bytes(sublane)) * sublane,
                   sublane)
        n_chunks = -(-shape[-2] // rows)
        lead = tuple(shape[:-2])
        block = tuple(1 for _ in lead) + (rows, shape[-1])
        grid = lead + (n_chunks,)
        nl = len(lead)
        idx = lambda *g: g[:nl] + (g[nl], 0)  # noqa: E731
    else:
        n_whole = 2
        size = padded_bytes(shape[-2])
        while (n_whole < len(shape)
               and size * shape[-(n_whole + 1)] <= VMEM_BLOCK_BUDGET):
            size *= shape[-(n_whole + 1)]
            n_whole += 1
        lead = tuple(shape[:-n_whole])
        block = tuple(1 for _ in lead) + tuple(shape[-n_whole:])
        grid = lead
        if not grid:
            out = pl.pallas_call(
                _copy_kernel, interpret=_interpret(),
                out_shape=jax.ShapeDtypeStruct(xr.shape, x.dtype))(xr)
            return out.reshape(orig_shape)
        idx = lambda *g: g + (0,) * n_whole  # noqa: E731
    out = pl.pallas_call(
        _copy_kernel, interpret=_interpret(),
        out_shape=jax.ShapeDtypeStruct(xr.shape, x.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec(block, idx)],
        out_specs=pl.BlockSpec(block, idx))(xr)
    return out.reshape(orig_shape)


@jax.custom_vjp
def layout_firewall(x):
    return _pl_copy(x)


def _fw_fwd(x):
    return _pl_copy(x), None


def _fw_bwd(_, ct):
    return (_pl_copy(ct),)


layout_firewall.defvjp(_fw_fwd, _fw_bwd)


def zfold_conv(x: jnp.ndarray, w_dense: jnp.ndarray, k: int,
               stride: int) -> jnp.ndarray:
    """k^3 conv with the D-axis taps folded into channels: one 2D k x k
    conv at Cin*k channels. Equivalent math (test-asserted vs dense_conv);
    ~1.6x the XLA 3D emitter's speed at stem shapes."""
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


def zfold2d_conv(x: jnp.ndarray, w_dense: jnp.ndarray, k: int,
                 stride: int) -> jnp.ndarray:
    """z-fold + [B*D', H, W, k*Cin] reshape -> true 2D k x k conv.

    Round-1 isolation measured this ~1.7x faster than the depth-1 3D-conv
    fold, but the reshape poisoned whole-model layout assignment when
    inlined. Here it only ever runs BETWEEN layout_firewall copies
    (stem_conv_folded), so the exotic layouts cannot escape."""
    b, d, h, w_sp, cin = x.shape
    cout = w_dense.shape[-1]
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
    n_out = (d + 2 * pad - k) // stride + 1
    last = (n_out - 1) * stride
    xs = jnp.concatenate(
        [xp[:, dd:dd + last + 1:stride] for dd in range(k)], axis=-1)
    xs2 = xs.reshape(b * n_out, h, w_sp, k * cin)
    wf = jnp.transpose(w_dense, (1, 2, 0, 3, 4))
    wf = wf.reshape(k, k, k * cin, cout)
    y = jax.lax.conv_general_dilated(
        xs2, wf.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.reshape(b, n_out, y.shape[1], y.shape[2], cout)


def stem_conv_folded(x: jnp.ndarray, occ_out: jnp.ndarray,
                     weights: jnp.ndarray, kernel_size: int,
                     stride: int, compute_dtype,
                     two_d: bool = False) -> jnp.ndarray:
    """Firewalled z-folded stem conv: same contract as dense_grid.dense_conv."""
    k = kernel_size
    cin, cout = weights.shape[-2], weights.shape[-1]
    w5 = weights.reshape(k, k, k, cin, cout).astype(compute_dtype)
    xi = layout_firewall(x.astype(compute_dtype))
    y = (zfold2d_conv if two_d else zfold_conv)(xi, w5, k, stride)
    y = layout_firewall(y)
    return y * occ_out.astype(y.dtype)


NEG_INF = -1e30

# Forward evaluation for the manual-backward pool: "separable" chains three
# 1D k3/s2 window maxes (max over a 3^3 window factorizes exactly per axis;
# each pass halves the volume so total window work is ~(3+1.5+0.75) taps vs
# 27) — "window3d" keeps the single 3D reduce_window.
POOL_FWD_MODE = os.environ.get("DPCR_POOL_FWD", "separable")


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def manual_max_pool(x, occ_in, occ_out):
    return _pool_fwd_val(x, occ_in, occ_out)


def _pool_fwd_val(x, occ_in, occ_out):
    from .dense_grid import windowed_max
    filled = jnp.where(occ_in > 0, x, jnp.asarray(NEG_INF, x.dtype))
    y = windowed_max(filled, separable=POOL_FWD_MODE == "separable")
    return jnp.where(occ_out > 0, y, 0.0)


def _pool_fwd(x, occ_in, occ_out):
    y = _pool_fwd_val(x, occ_in, occ_out)
    return y, (x, occ_in, occ_out, y)


def _pool_bwd(res, ct):
    x, occ_in, occ_out, y = res
    b, d, h, w, c = x.shape
    d2, h2, w2 = y.shape[1:4]
    ctm = jnp.where(occ_out > 0, ct, 0.0)
    # dilate pooled max values + cotangents back onto the stride-2 grid
    yd = jnp.zeros((b, 2 * d2, 2 * h2, 2 * w2, c), y.dtype)
    yd = yd.at[:, ::2, ::2, ::2].set(
        jnp.where(occ_out > 0, y, jnp.asarray(NEG_INF, y.dtype)))
    cd = jnp.zeros((b, 2 * d2, 2 * h2, 2 * w2, c), ctm.dtype)
    cd = cd.at[:, ::2, ::2, ::2].set(ctm)
    ydp = jnp.pad(yd, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)),
                  constant_values=NEG_INF)[:, : d + 2, : h + 2, : w + 2]
    cdp = jnp.pad(cd, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))[
        :, : d + 2, : h + 2, : w + 2]
    acc = jnp.zeros(x.shape, jnp.float32)
    for dd in range(3):
        for hh in range(3):
            for ww in range(3):
                ys = ydp[:, dd:dd + d, hh:hh + h, ww:ww + w]
                cs = cdp[:, dd:dd + d, hh:hh + h, ww:ww + w]
                acc = acc + jnp.where(x == ys, cs, 0).astype(jnp.float32)
    dx = (acc * (occ_in > 0)).astype(x.dtype)
    return dx, None, None


manual_max_pool.defvjp(_pool_fwd, _pool_bwd)
