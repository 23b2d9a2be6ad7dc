"""Pallas fused Minkowski MaxPool (kernel 3, stride 2) with a custom
equality-routed backward — replaces XLA's `reduce_window` forward +
`select_and_scatter` backward over the program's largest tensor (the
full-resolution [B,D,H,W,C] volume, 1.27 GB at the bs16 bench shape).

Why a hand kernel: the round-2 step breakdown put the L0 section at
221.8 ms of the 238.7 ms train step, and the pool's select_and_scatter
backward is one of its dominant ops. Every XLA-level reformulation lost
(docs/experiments/round2/README.md: manual equality-routed backward
-38%, separable windows -6%, scatter-max -31%) because each round-trips
the full volume through HBM several times. The Pallas version streams
PLANES with blocked specs (Mosaic double-buffers the plane DMAs):

  forward  — grid (B, D1): for output plane x1, load input planes
             {2*x1-1, 2*x1, 2*x1+1} (clamped at the edges and masked),
             fold empty→-inf, take the 3^3/stride-2 window max with
             even/odd reshape-shift tricks entirely in VMEM, write one
             output plane. One HBM read of x + one write of y.
  backward — grid (B, D): for input plane x0, load its x/occ planes,
             the ≤2 covering output planes (x1 = x0//2 always covers;
             (x0+1)//2 covers iff x0 is odd) with their cotangents, and
             route ct to input cells that EQUAL their window max.
             One HBM read of x/y/ct + one write of dx.

Tie semantics: exact-value ties inside one window route the FULL
cotangent to every maximizer (select_and_scatter picks exactly one;
scatter-max VJP splits evenly) — measure-zero for real activations;
the parity tests use distinct values.

Semantics match ops/dense_grid.dense_max_pool (reference Minkowski
MaxPool, SENet.py stem): max over the 3^3 input window around 2u, empty
inputs excluded, output zeroed at unoccupied sites. Parity is
test-asserted in interpreter mode on CPU (tests/test_pallas_pool.py);
the op is opt-in via DPCR_POOL_BWD=pallas until the TPU bench confirms.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG = -np.inf


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# in-VMEM window helpers (operate on one [H, W, C] plane)
# ---------------------------------------------------------------------------

def _split2(p: jnp.ndarray, axis: int):
    """Even/odd deinterleave along `axis` (size must be even) via a
    split-reshape + unit slice. Mosaic lowers strided slices (`p[0::2]`)
    to gather, which it only supports in 2D — reshapes that keep the lane
    (minor) dim intact lower fine."""
    sh = p.shape
    q = p.reshape(sh[:axis] + (sh[axis] // 2, 2) + sh[axis + 1:])
    ev = jax.lax.index_in_dim(q, 0, axis + 1, keepdims=False)
    od = jax.lax.index_in_dim(q, 1, axis + 1, keepdims=False)
    return ev, od


def _pool_yz(p: jnp.ndarray, h1: int, w1: int) -> jnp.ndarray:
    """[H, W, C] -> [H1, W1, C] stride-2 SAME 3-window max over both dims.
    Window for output i is inputs {2i-1, 2i, 2i+1}; with ev/od the even/odd
    input rows, that is max(ev[i], od[i], od[i-1])."""
    h, w, c = p.shape
    neg = jnp.asarray(NEG, p.dtype)
    if 2 * h1 > h:                                  # odd H: pad one -inf row
        p = jnp.concatenate([p, jnp.full((1, w, c), neg, p.dtype)], 0)
    ev, od = _split2(p, 0)                          # [H1, W, C] each
    od_up = jnp.concatenate([jnp.full((1, w, c), neg, p.dtype), od[:-1]], 0)
    my = jnp.maximum(jnp.maximum(ev, od), od_up)    # [H1, W, C]
    if 2 * w1 > w:                                  # odd W
        my = jnp.concatenate([my, jnp.full((h1, 1, c), neg, my.dtype)], 1)
    evz, odz = _split2(my, 1)
    odz_up = jnp.concatenate(
        [jnp.full((h1, 1, c), neg, my.dtype), odz[:, :-1]], 1)
    return jnp.maximum(jnp.maximum(evz, odz), odz_up)   # [H1, W1, C]


def _upsample2(a: jnp.ndarray, shift: int, axis: int, size: int,
               fill) -> jnp.ndarray:
    """out[i] = a[(i + shift) // 2] along `axis`, truncated/padded to
    `size`; source positions past the end of `a` get `fill`."""
    sh = a.shape                                    # rep[i] = a[i // 2]
    rep = jnp.broadcast_to(jnp.expand_dims(a, axis + 1),
                           sh[:axis + 1] + (2,) + sh[axis + 1:]
                           ).reshape(sh[:axis] + (2 * sh[axis],)
                                     + sh[axis + 1:])
    n = rep.shape[axis]
    if shift:
        rep = jax.lax.slice_in_dim(rep, 1, n, axis=axis)
        pad = list(rep.shape)
        pad[axis] = 1
        rep = jnp.concatenate([rep, jnp.full(pad, fill, rep.dtype)],
                              axis=axis)
    if n < size:
        pad = list(rep.shape)
        pad[axis] = size - n
        rep = jnp.concatenate([rep, jnp.full(pad, fill, rep.dtype)],
                              axis=axis)
    return jax.lax.slice_in_dim(rep, 0, size, axis=axis)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(xa, xb, xc, oa, ob, oc, out, *, d):
    """Output plane x1 from input planes {2x1-1, 2x1, 2x1+1}: plane a is
    clamped at x1=0 and plane c at the odd-D top edge — both masked."""
    x1 = pl.program_id(1)
    h1, w1 = out.shape[2], out.shape[3]
    neg = jnp.asarray(NEG, xa.dtype)
    fa = jnp.where((oa[0, 0][..., None] > 0) & (x1 > 0), xa[0, 0], neg)
    fb = jnp.where(ob[0, 0][..., None] > 0, xb[0, 0], neg)
    fc = jnp.where((oc[0, 0][..., None] > 0) & (2 * x1 + 1 <= d - 1),
                   xc[0, 0], neg)
    m3 = jnp.maximum(jnp.maximum(fa, fb), fc)
    out[0, 0] = _pool_yz(m3, h1, w1)


def _bwd_kernel(xr, orr, ya, ya_hi, yb, yb_hi, cta, cta_hi, ctb, ctb_hi,
                dx, *, d1, h, h1, th):
    """dx H-tile of plane x0 via equality routing against the saved output
    planes. ct is pre-masked to occupied outputs, so comparing against the
    SAVED y (zero at unoccupied sites) never routes garbage.

    All in-register math is f32: Mosaic cannot lower the sublane-axis
    interleave (`tpu.repeat` along dim -2) for bf16 vectors — probed
    on-device 2026-08-19; the f32 path compiles on both axes. Loads stay
    bf16 (DMA traffic unchanged) and bf16->f32 is exact, so the equality
    routing is bit-identical.

    TILING: the f32 temporaries over a full [88,80,64] plane put the
    un-tiled kernel at 61.7 MB of scoped VMEM vs the 16 MB limit (measured
    on v5e 2026-08-19), so the grid carries an H-tile axis: each program
    handles `th` input rows. Output rows (i+ty)//2 for a tile straddle one
    H1-block boundary, so each y/ct term arrives as a (lo, hi) block pair
    and the kernel uses lo plus hi's first row."""
    x0 = pl.program_id(1)
    hb = pl.program_id(2)
    w, c = xr.shape[3], xr.shape[4]
    w1 = ya.shape[3]
    th2 = th // 2
    neg = jnp.asarray(NEG, jnp.float32)

    rows_g = hb * th + jax.lax.broadcasted_iota(jnp.int32, (th, 1, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, w, 1), 1)
    in_h = rows_g < h

    filled = jnp.where((orr[0, 0][..., None] > 0) & in_h,
                       xr[0, 0].astype(jnp.float32), neg)

    def one_xterm(y_lo, y_hi, ct_lo, ct_hi, enable):
        # rows [hb*th2, hb*th2 + th2] of the output plane: lo block + the
        # first row of the next block (garbage past h1 — masked below)
        yf = jnp.concatenate([y_lo, y_hi[:1]], 0).astype(jnp.float32)
        ctf = jnp.concatenate([ct_lo, ct_hi[:1]], 0).astype(jnp.float32)
        acc = jnp.zeros((th, w, c), jnp.float32)
        for ty in (0, 1):
            vy = ((rows_g % 2) == 1) if ty else (rows_g >= 0)
            vy = vy & (((rows_g + ty) // 2) < h1) & in_h
            for tz in (0, 1):
                vz = ((cols % 2) == 1) if tz else (cols >= 0)
                vz = vz & (((cols + tz) // 2) < w1)
                y_up = _upsample2(_upsample2(yf, ty, 0, th, neg),
                                  tz, 1, w, neg)
                ct_up = _upsample2(_upsample2(ctf, ty, 0, th, 0.0),
                                   tz, 1, w, 0.0)
                sel = (filled == y_up) & vy & vz & enable
                acc = acc + jnp.where(sel, ct_up, 0.0)
        return acc

    # term a: x1 = x0//2 always covers x0 (odd x0: 2*(x0//2)+1 == x0).
    acc = one_xterm(ya[0, 0], ya_hi[0, 0], cta[0, 0], cta_hi[0, 0], True)
    # term b: x1 = (x0+1)//2 — distinct iff x0 odd; masked past the top.
    enable_b = ((x0 % 2) == 1) & (((x0 + 1) // 2) < d1)
    acc = acc + one_xterm(yb[0, 0], yb_hi[0, 0], ctb[0, 0], ctb_hi[0, 0],
                          enable_b)
    dx[0, 0] = acc.astype(dx.dtype)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

def _fwd_call(x, occ4, interpret=False):
    b, d, h, w, c = x.shape
    d1, h1, w1 = _cdiv(d, 2), _cdiv(h, 2), _cdiv(w, 2)
    # occ planes ride as f32: Mosaic can only insert the broadcast minor dim
    # ([..., None] in the kernel) on 32-bit types, and the occ volume is
    # 1/C-th of x — the wider dtype is noise next to the x stream
    occ4 = occ4.astype(jnp.float32)

    def xspec(m):
        return pl.BlockSpec((1, 1, h, w, c),
                            lambda bb, i, _m=m: (bb, _m(i), 0, 0, 0))

    def ospec(m):
        return pl.BlockSpec((1, 1, h, w),
                            lambda bb, i, _m=m: (bb, _m(i), 0, 0))

    lo = lambda i: jnp.maximum(2 * i - 1, 0)            # noqa: E731
    mid = lambda i: 2 * i                               # noqa: E731
    hi = lambda i: jnp.minimum(2 * i + 1, d - 1)        # noqa: E731
    return pl.pallas_call(
        partial(_fwd_kernel, d=d),
        grid=(b, d1),
        in_specs=[xspec(lo), xspec(mid), xspec(hi),
                  ospec(lo), ospec(mid), ospec(hi)],
        out_specs=pl.BlockSpec((1, 1, h1, w1, c),
                               lambda bb, i: (bb, i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, d1, h1, w1, c), x.dtype),
        interpret=interpret,
    )(x, x, x, occ4, occ4, occ4)


def _bwd_call(x, occ4, y, ct, interpret=False):
    b, d, h, w, c = x.shape
    d1, h1, w1 = y.shape[1], y.shape[2], y.shape[3]
    occ4 = occ4.astype(jnp.float32)   # see _fwd_call
    # H-tile size: VMEM scales with it (see _bwd_kernel TILING note); must
    # be even so local row parity equals global parity
    th = min(8, h + (h % 2))
    nh = _cdiv(h, th)

    ident = lambda i: i                                  # noqa: E731
    ia = lambda i: i // 2                                # noqa: E731
    ib = lambda i: jnp.minimum((i + 1) // 2, d1 - 1)     # noqa: E731
    hlo = lambda j: j                                    # noqa: E731
    hhi = lambda j: jnp.minimum(j + 1, nh - 1)           # noqa: E731

    def xspec():
        return pl.BlockSpec((1, 1, th, w, c),
                            lambda bb, i, j: (bb, i, j, 0, 0))

    def yspec(m, hm):
        return pl.BlockSpec(
            (1, 1, th // 2, w1, c),
            lambda bb, i, j, _m=m, _hm=hm: (bb, _m(i), _hm(j), 0, 0))

    ospec = pl.BlockSpec((1, 1, th, w),
                         lambda bb, i, j: (bb, i, j, 0))
    return pl.pallas_call(
        partial(_bwd_kernel, d1=d1, h=h, h1=h1, th=th),
        grid=(b, d, nh),
        in_specs=[xspec(), ospec,
                  yspec(ia, hlo), yspec(ia, hhi),
                  yspec(ib, hlo), yspec(ib, hhi),
                  yspec(ia, hlo), yspec(ia, hhi),
                  yspec(ib, hlo), yspec(ib, hhi)],
        out_specs=pl.BlockSpec((1, 1, th, w, c),
                               lambda bb, i, j: (bb, i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, d, h, w, c), x.dtype),
        interpret=interpret,
    )(x, occ4, y, y, y, y, ct, ct, ct, ct)


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(3,))
def pallas_max_pool(x: jnp.ndarray, occ_in: jnp.ndarray,
                    occ_out: jnp.ndarray, interpret: bool = False
                    ) -> jnp.ndarray:
    """Drop-in for ops/dense_grid.dense_max_pool: x [B,D,H,W,C], occupancy
    volumes [B,D,H,W,1] / [B,ceil(D/2),...,1]; pooled volume zeroed at
    unoccupied output sites."""
    y = _fwd_call(x, occ_in[..., 0], interpret=interpret)
    return jnp.where(occ_out > 0, y, 0.0).astype(x.dtype)


def _pool_fwd(x, occ_in, occ_out, interpret):
    y = pallas_max_pool(x, occ_in, occ_out, interpret)
    return y, (x, occ_in, occ_out, y)


def _pool_bwd(interpret, res, ct):
    x, occ_in, occ_out, y = res
    ct = jnp.where(occ_out > 0, ct, 0.0).astype(x.dtype)
    dx = _bwd_call(x, occ_in[..., 0], y, ct, interpret=interpret)
    # Occupied windows always contain >=1 real cell (y > -inf there) and
    # empty-input cells carry filled == -inf, so equality can only route
    # to real cells; zeroing at holes is belt-and-braces for y == 0
    # coincidences at unoccupied-output cells (ct is 0 there anyway).
    dx = dx * (occ_in > 0).astype(dx.dtype)
    return dx, jnp.zeros_like(occ_in), jnp.zeros_like(occ_out)


pallas_max_pool.defvjp(_pool_fwd, _pool_bwd)
