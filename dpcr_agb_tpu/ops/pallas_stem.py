"""Fused Pallas L0 stem forward: dense k^3 conv over the full volume with
patches staged through VMEM — the formulation class sketched in
docs/design/fused_l0_kernel.md (the one path rounds 2-5 did not build).

Reference semantics: MinkowskiConvolution stem (reference SENet.py stem,
`/root/reference/torch-points3d/torch_points3d/modules/MinkowskiEngine/
SENet.py:14-194`) — k=7 cross-correlation over the voxel volume where
empty cells are zeros; parity with ops/sparse_stem.stem_conv_sparse_batch
at occupied sites and with a dense XLA conv3d everywhere is test-asserted
(tests/test_pallas_stem.py).

Why this shape: the row formulation (ops/sparse_stem.py) is HBM-row-rate
bound (~3.6 M gather rows fwd; measured 7-22 ns/row), and XLA's own dense
conv3d at Cin=3 runs at 4.7% MFU. Here the host builds the z+y-folded
table ONCE (`_fold_zy(dense, k, k)` — [B, D+2p, H, W, k^2*Cin]), whose
rows ARE the per-(dx) patch matrices: the kernel is pure DMA + k
accumulating MXU matmuls [TY*W, k^2*Cin] @ [k^2*Cin, Cout] per x-plane —
no gather rows, no in-kernel shuffling, no lane concats.

Two grid layouts, both parity-tested:
  * x1 (v1): grid (B, D, NY), x-block-size 1 — each folded plane is
    DMA'd k times (once per dx role): ~7x read amplification of the
    folded table. Simplest possible kernel.
  * xtile (v2): grid (B, ND, NY) with TD output planes per program and a
    lo/hi x-block pair (halo k-1 <= TD): read amplification drops to
    (2*TD)/TD = 2x fetched, (TD+k-1)/TD used. Kernel slices the k
    shifted [TD, TY, W, KC] windows out of the lo||hi pair.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .sparse_stem import (_fold_zy, _grouped_weights, _scatter_to_dense_impl)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _fwd_kernel_x1(*refs, k: int, ty: int, w: int, out_dtype):
    """refs = (p_0..p_{k-1}, w_ref, out): p_dx [1,1,TY,W,KC] is the folded
    plane x+dx restricted to this y-tile; out [1,1,TY,W,Cout]."""
    planes, w_ref, out = refs[:k], refs[k], refs[k + 1]
    kc = planes[0].shape[-1]
    cout = out.shape[-1]
    acc = jnp.zeros((ty * w, cout), jnp.float32)
    for dx in range(k):
        pm = planes[dx][0, 0].reshape(ty * w, kc)
        acc = acc + jnp.dot(pm, w_ref[dx],
                            preferred_element_type=jnp.float32)
    out[0, 0] = acc.reshape(ty, w, cout).astype(out_dtype)


def _fwd_kernel_xtile(lo, hi, w_ref, out, *, k: int, td: int, ty: int,
                      w: int, out_dtype):
    """lo/hi [1,TD,TY,W,KC] are x-blocks j and j+1 (clamped) of the folded
    table; output planes x = j*TD + xo read folded planes j*TD + xo + dx,
    i.e. the k shifted TD-windows of the lo||hi pair along x."""
    kc = lo.shape[-1]
    cout = out.shape[-1]
    acc = jnp.zeros((td * ty * w, cout), jnp.float32)
    for dx in range(k):
        # planes [dx, dx+td) of the 2*td-long lo||hi axis, without
        # materializing the concat: up to two contiguous slices
        if dx == 0:
            pm = lo[0]
        elif dx == td:
            pm = hi[0]
        else:
            pm = jnp.concatenate([lo[0, dx:], hi[0, :dx]], axis=0)
        acc = acc + jnp.dot(pm.reshape(td * ty * w, kc), w_ref[dx],
                            preferred_element_type=jnp.float32)
    out[0] = acc.reshape(td, ty, w, cout).astype(out_dtype)


def _fwd_kernel_rev(p_ref, w_ref, out, acc, *, k: int, ty: int, w: int,
                    out_dtype):
    """Revisited-accumulator layout: grid (B, D, NY, K) with dx innermost.
    ONE folded operand (block index (b, x+dx, j) — no k-fold operand
    duplication in HBM), output block revisited across dx with a
    persistent f32 VMEM accumulator; flushed at dx == k-1."""
    dx = pl.program_id(3)
    kc = p_ref.shape[-1]
    cout = out.shape[-1]
    pm = p_ref[0, 0].reshape(ty * w, kc)
    part = jnp.dot(pm, w_ref[dx], preferred_element_type=jnp.float32)

    @pl.when(dx == 0)
    def _():
        acc[:] = part

    @pl.when(dx > 0)
    def _():
        acc[:] = acc[:] + part

    @pl.when(dx == k - 1)
    def _():
        out[0, 0] = acc[:].reshape(ty, w, cout).astype(out_dtype)


def _pad_rows(folded: jnp.ndarray, ty: int) -> jnp.ndarray:
    h2 = folded.shape[2]
    pad = _cdiv(h2, ty) * ty - h2
    if pad:
        folded = jnp.pad(folded, ((0, 0), (0, 0), (0, pad), (0, 0), (0, 0)))
    return folded


def _dma_kernel(hbm_ref, w_ref, out_ref, scratch, sem, *, k: int, td: int,
                ty: int, w: int, out_dtype):
    """Manual-DMA halo-slab layout: the folded table stays in HBM (ANY
    memory space — ONE operand, no BlockSpec duplication); each program
    copies its [td+k-1, ty, W, KCP] halo slab into VMEM scratch itself,
    then runs the k accumulating dots. This is the layout that finally
    amortizes the per-grid-step cost that sinks the BlockSpec variants
    (measured 16.4 us/program ~= DMA + MXU with no residual overhead).

    Requires the folded lane dim padded to a 128 multiple (KCP): Mosaic
    HBM memrefs are lane-tiled and memref slices must be tile-aligned
    ("Slice shape along dimension 4 must be aligned to tiling (128)")."""
    from jax.experimental.pallas import tpu as pltpu
    b, xi, yi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    kcp = scratch.shape[-1]
    cout = out_ref.shape[-1]
    dma = pltpu.make_async_copy(
        hbm_ref.at[b, pl.ds(xi * td, td + k - 1), pl.ds(yi * ty, ty)],
        scratch, sem)
    dma.start()
    dma.wait()
    acc = jnp.zeros((td * ty * w, cout), jnp.float32)
    for dx in range(k):
        pm = scratch[dx:dx + td].reshape(td * ty * w, kcp)
        acc = acc + jnp.dot(pm, w_ref[dx],
                            preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(td, ty, w, cout).astype(out_dtype)


def fused_stem_fwd_dma(folded: jnp.ndarray, wf: jnp.ndarray, d: int,
                       k: int, td: int = 8, ty: int = 8,
                       interpret: bool = False) -> jnp.ndarray:
    """folded [B, D+2p, H2, W, KC] -> conv volume [B, D, H2, W, Cout] via
    the manual-DMA slab kernel. Pads KC to a 128 multiple and x/y extents
    to the tile grid; wf [k, KC, Cout]."""
    from jax.experimental.pallas import tpu as pltpu
    b, dp, h2, w, kc = folded.shape
    cout = wf.shape[-1]
    kcp = _cdiv(kc, 128) * 128
    nd, ny = _cdiv(d, td), _cdiv(h2, ty)
    folded = jnp.pad(folded, (
        (0, 0), (0, nd * td + k - 1 - dp), (0, ny * ty - h2), (0, 0),
        (0, kcp - kc)))
    wfp = jnp.pad(wf, ((0, 0), (0, kcp - kc), (0, 0)))
    out = pl.pallas_call(
        partial(_dma_kernel, k=k, td=td, ty=ty, w=w,
                out_dtype=folded.dtype),
        grid=(b, nd, ny),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((k, kcp, cout), lambda *_: (0, 0, 0))],
        out_specs=pl.BlockSpec((1, td, ty, w, cout),
                               lambda bb, x, j: (bb, x, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nd * td, ny * ty, w, cout),
                                       folded.dtype),
        scratch_shapes=[
            pltpu.VMEM((td + k - 1, ty, w, kcp), folded.dtype),
            pltpu.SemaphoreType.DMA],
        interpret=interpret,
    )(folded, wfp.astype(folded.dtype))
    return out[:, :d, :h2]


def fused_stem_fwd_from_folded(folded: jnp.ndarray, wf: jnp.ndarray,
                               d: int, k: int, ty: int = 22,
                               td: int = 0, interpret: bool = False,
                               ) -> jnp.ndarray:
    """folded [B, D+2p, H2, W, KC] (from `_fold_zy(dense, k, k)`), wf
    [k, KC, Cout] (from `_grouped_weights(weights, k, k).reshape`);
    returns the conv volume [B, D, H2, W, Cout] at ALL sites (unmasked —
    empty cells already read zeros, which IS the Minkowski semantics; mask
    by occupancy downstream exactly like the dense path).
    td=0: x1 layout; td>0: xtile layout (requires td >= k-1, td | d)."""
    b, dp, h2, w, kc = folded.shape
    cout = wf.shape[-1]
    folded = _pad_rows(folded, ty)
    h2p = folded.shape[2]
    ny = h2p // ty
    wspec = pl.BlockSpec((k, kc, cout), lambda *_: (0, 0, 0))
    if td == -1:                                   # revisited accumulator
        from jax.experimental.pallas import tpu as pltpu
        out = pl.pallas_call(
            partial(_fwd_kernel_rev, k=k, ty=ty, w=w,
                    out_dtype=folded.dtype),
            grid=(b, d, ny, k),
            in_specs=[
                pl.BlockSpec((1, 1, ty, w, kc),
                             lambda bb, x, j, dx: (bb, x + dx, j, 0, 0)),
                wspec],
            out_specs=pl.BlockSpec((1, 1, ty, w, cout),
                                   lambda bb, x, j, dx: (bb, x, j, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, d, h2p, w, cout),
                                           folded.dtype),
            scratch_shapes=[pltpu.VMEM((ty * w, cout), jnp.float32)],
            interpret=interpret,
        )(folded, wf.astype(folded.dtype))
        return out[:, :, :h2]
    if td == 0:
        in_specs = [
            pl.BlockSpec((1, 1, ty, w, kc),
                         lambda bb, x, j, _dx=dx: (bb, x + _dx, j, 0, 0))
            for dx in range(k)
        ] + [wspec]
        out = pl.pallas_call(
            partial(_fwd_kernel_x1, k=k, ty=ty, w=w, out_dtype=folded.dtype),
            grid=(b, d, ny),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, ty, w, cout),
                                   lambda bb, x, j: (bb, x, j, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, d, h2p, w, cout),
                                           folded.dtype),
            interpret=interpret,
        )(*([folded] * k + [wf.astype(folded.dtype)]))
        return out[:, :, :h2]
    if td < k - 1 or d % td:
        raise ValueError(f"xtile layout needs td >= {k - 1} and td | {d}; "
                         f"got td={td} d={d}")
    nd = d // td
    # pad x so the hi block of the last tile stays in bounds
    xpad = (nd + 1) * td - dp
    if xpad > 0:
        folded = jnp.pad(folded,
                         ((0, 0), (0, xpad), (0, 0), (0, 0), (0, 0)))
    lo = pl.BlockSpec((1, td, ty, w, kc),
                      lambda bb, x, j: (bb, x, j, 0, 0))
    hi = pl.BlockSpec((1, td, ty, w, kc),
                      lambda bb, x, j: (bb, x + 1, j, 0, 0))
    out = pl.pallas_call(
        partial(_fwd_kernel_xtile, k=k, td=td, ty=ty, w=w,
                out_dtype=folded.dtype),
        grid=(b, nd, ny),
        in_specs=[lo, hi, wspec],
        out_specs=pl.BlockSpec((1, td, ty, w, cout),
                               lambda bb, x, j: (bb, x, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nd * td, h2p, w, cout),
                                       folded.dtype),
        interpret=interpret,
    )(folded, folded, wf.astype(folded.dtype))
    return out[:, :d, :h2]


def fused_stem_conv_volume(coords: jnp.ndarray, mask: jnp.ndarray,
                           feats: jnp.ndarray, dims, weights: jnp.ndarray,
                           kernel_size: int = 7,
                           compute_dtype=jnp.bfloat16, ty: int = 22,
                           td: int = 0, chunks: int = 1,
                           dma: bool = False, interpret: bool = False):
    """Sparse rows -> dense conv volume, Pallas-fused: scatter (Cin wide,
    tiny), z+y fold (one streaming pass), Pallas matmul kernel. Returns
    (conv_volume [B,D,H,W,Cout] UNMASKED, occ [B,D,H,W,1]).

    Same math as ops/dense_grid.dense_conv without the final occupancy
    mask; at occupied sites equals stem_conv_sparse_batch's rows.

    chunks > 1 runs the fold+kernel over batch sub-chunks (lax.map): the
    folded table is TRANSIENT, so chunking divides its HBM residency by
    the chunk count at unchanged DMA volume — the same argument as the
    row path's DPCR_FOLD_CHUNKS (the bs32/z80 full-batch table is 6.2 GB
    plus concat operands, which OOMs alongside the 2.5 GB output)."""
    k = kernel_size
    d, h, w = dims
    cin, cout = weights.shape[-2], weights.shape[-1]
    b, v = mask.shape
    wf = _grouped_weights(weights, k, k).reshape(k, k * k * cin, cout)

    def one(c, m, f):
        dense, occ = _scatter_to_dense_impl(c, m, f.astype(compute_dtype),
                                            dims)
        folded = _fold_zy(dense, k, k)
        if dma:
            y = fused_stem_fwd_dma(folded, wf, d, k, td=td or 8, ty=ty,
                                   interpret=interpret)
        else:
            y = fused_stem_fwd_from_folded(folded, wf, d, k, ty=ty, td=td,
                                           interpret=interpret)
        return y, occ

    if chunks <= 1:
        return one(coords, mask, feats)
    if b % chunks:
        raise ValueError(f"chunks={chunks} must divide the batch ({b})")
    bc = b // chunks
    y, occ = jax.lax.map(
        lambda a: one(*a),
        (coords.reshape(chunks, bc, v, 3), mask.reshape(chunks, bc, v),
         feats.reshape(chunks, bc, v, -1)))
    return (y.reshape(b, *y.shape[2:]), occ.reshape(b, *occ.shape[2:]))
