"""Round-2 stem investigation: where do the 284 ms/step (bs16) actually go?

Times, with the honest chained protocol (scripts/bench_protocol.py), at the
bench shape bs16 x (88,88,80) x Cin3 -> 64, bf16:
  1. stem k7 conv forward alone, and forward+dW (no dx: stem input is data)
  2. dense_max_pool forward and forward+backward (select_and_scatter probe)
  3. z-fold variant of the stem conv (fold 7 z-taps into channels, 2D k7
     conv over (x,y) with Cin=21)
  4. xy+z full fold ("49-fold"): 49 shifted copies -> [.., 147] channels,
     then 7-tap 1D conv over x == 7 accumulated [sites,147]@[147,64] matmuls
  5. equality-trick manual maxpool backward (candidate select_and_scatter
     replacement)

Run ON THE REAL TPU: python docs/experiments/round2/exp_stem_breakdown.py
"""
import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.bench_protocol import timed_diff

B, D, H, W = 16, 88, 88, 80
CIN, COUT = 3, 64
K = 7
DT = jnp.bfloat16


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(B, D, H, W, CIN)), DT)
    occ = jnp.asarray(rng.random((B, D, H, W, 1)) < 0.02, DT)
    x = x * occ
    w = jnp.asarray(rng.normal(size=(K, K, K, CIN, COUT)) * 0.05, DT)
    return x, occ, w


def conv3d(x, w, stride=1):
    pad = K // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride,) * 3, [(pad, pad)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def stem_fwd_chain(n):
    def run(x, w):
        def body(c, _):
            y = conv3d(c, w)
            # feed back through a cheap projection to keep the chain honest
            nxt = (c + jnp.mean(y, axis=-1, keepdims=True)
                   .astype(c.dtype) * 1e-6)
            return nxt, None
        out, _ = jax.lax.scan(body, x, None, length=n)
        return out
    return run


def stem_fwd_dw_chain(n):
    def run(x, w):
        def loss(wi, xi):
            y = conv3d(xi, wi)
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

        def body(c, _):
            wi, xi = c
            g = jax.grad(loss)(wi, xi)
            return (wi - g.astype(wi.dtype) * 1e-9, xi), None
        (wout, _), _ = jax.lax.scan(body, (w, x), None, length=n)
        return wout
    return run


def zfold(x):
    """[B,D,H,W,C] -> [B,D,H,W,7C]: z(=D? choose D as folded axis) taps."""
    pad = K // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
    return jnp.concatenate([xp[:, i:i + D] for i in range(K)], axis=-1)


def zfold_conv(x, w):
    # w [7,7,7,C,Cout] -> folded [1,7,7,7C,Cout] (D-tap fastest along C)
    wf = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(1, K, K, K * CIN, COUT)
    xs = zfold(x)
    pad = K // 2
    return jax.lax.conv_general_dilated(
        xs, wf, (1, 1, 1), [(0, 0), (pad, pad), (pad, pad)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def zfold_fwd_dw_chain(n):
    def run(x, w):
        def loss(wi, xi):
            y = zfold_conv(xi, wi)
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

        def body(c, _):
            wi, xi = c
            g = jax.grad(loss)(wi, xi)
            return (wi - g.astype(wi.dtype) * 1e-9, xi), None
        (wout, _), _ = jax.lax.scan(body, (w, x), None, length=n)
        return wout
    return run


def fold49_conv(x, w):
    """Fold (dd over D, dh over H) 49 taps into channels then 7-tap conv
    over W_axis? No — fold (D,H) taps, then 1D conv over the W axis."""
    pad = K // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0), (0, 0)))
    cols = [xp[:, i:i + D, j:j + H] for i in range(K) for j in range(K)]
    xs = jnp.concatenate(cols, axis=-1)                  # [B,D,H,W,49C]
    # w -> [1,1,7,49C,Cout], (dd,dh) fastest along C to match cols order
    wf = jnp.transpose(w, (0, 1, 2, 3, 4)).reshape(K * K, K, CIN, COUT)
    wf = jnp.transpose(wf, (1, 0, 2, 3)).reshape(1, 1, K, K * K * CIN, COUT)
    return jax.lax.conv_general_dilated(
        xs, wf, (1, 1, 1), [(0, 0), (0, 0), (pad, pad)],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def fold49_fwd_dw_chain(n):
    def run(x, w):
        def loss(wi, xi):
            y = fold49_conv(xi, wi)
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6

        def body(c, _):
            wi, xi = c
            g = jax.grad(loss)(wi, xi)
            return (wi - g.astype(wi.dtype) * 1e-9, xi), None
        (wout, _), _ = jax.lax.scan(body, (w, x), None, length=n)
        return wout
    return run


NEG = -1e30


def maxpool(x, occ_in, occ_out):
    filled = jnp.where(occ_in > 0, x, jnp.asarray(NEG, x.dtype))
    y = jax.lax.reduce_window(
        filled, x.dtype.type(-np.inf), jax.lax.max,
        (1, 3, 3, 3, 1), (1, 2, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])
    return jnp.where(occ_out > 0, y, 0.0)


def occupancy_pool(occ):
    pooled = jax.lax.reduce_window(
        occ, occ.dtype.type(-np.inf), jax.lax.max,
        (1, 2, 2, 2, 1), (1, 2, 2, 2, 1), "SAME")
    return jax.lax.stop_gradient(jnp.maximum(pooled, 0.0))


def pool_fwd_chain(n):
    def run(h, occ):
        occ2 = occupancy_pool(occ)

        def body(c, _):
            y = maxpool(c, occ, occ2)
            nxt = c + jnp.mean(y).astype(c.dtype) * 1e-6
            return nxt, None
        out, _ = jax.lax.scan(body, h, None, length=n)
        return out
    return run


def pool_fwd_bwd_chain(n):
    def run(h, occ):
        occ2 = occupancy_pool(occ)

        def loss(hi):
            return jnp.sum(maxpool(hi, occ, occ2).astype(jnp.float32) ** 2) * 1e-6

        def body(c, _):
            g = jax.grad(loss)(c)
            return c - g.astype(c.dtype) * 1e-9, None
        out, _ = jax.lax.scan(body, h, None, length=n)
        return out
    return run


def manual_pool_bwd(x, occ_in, occ_out, ct):
    """Equality-trick maxpool backward: route ct[w] to inputs equal to the
    window max (ties split by count would diverge; here: full grad to every
    tie, then mask by occ — empty-cell NEG ties are killed by occ)."""
    filled = jnp.where(occ_in > 0, x, jnp.asarray(NEG, x.dtype))
    y = jax.lax.reduce_window(
        filled, x.dtype.type(-np.inf), jax.lax.max,
        (1, 3, 3, 3, 1), (1, 2, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])
    ctm = ct * (occ_out > 0)
    # scatter y and ct back to L0: for each of 27 offsets compare
    d2, h2, w2 = y.shape[1:4]
    yd = jnp.zeros((x.shape[0], 2 * d2, 2 * h2, 2 * w2, x.shape[4]), y.dtype)
    yd = yd.at[:, ::2, ::2, ::2].set(y)
    cd = jnp.zeros_like(yd)
    cd = cd.at[:, ::2, ::2, ::2].set(ctm)
    # crop/pad to L0 + halo 1 then take 3^3 neighborhood comparisons
    ydp = jnp.pad(yd, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)),
                  constant_values=NEG)[:, : D + 2, : H + 2, : W + 2]
    cdp = jnp.pad(cd, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))[
        :, : D + 2, : H + 2, : W + 2]
    acc = jnp.zeros_like(x, dtype=jnp.float32)
    for dd in range(3):
        for hh in range(3):
            for ww in range(3):
                ys = ydp[:, dd:dd + D, hh:hh + H, ww:ww + W]
                cs = cdp[:, dd:dd + D, hh:hh + H, ww:ww + W]
                acc = acc + jnp.where(x == ys, cs, 0).astype(jnp.float32)
    return acc * (occ_in > 0)


def manual_pool_chain(n):
    def run(h, occ):
        occ2 = occupancy_pool(occ)

        def body(c, _):
            y = maxpool(c, occ, occ2)
            g = manual_pool_bwd(c, occ, occ2, y)  # ct := y for the probe
            return c - g.astype(c.dtype) * 1e-9, None
        out, _ = jax.lax.scan(body, h, None, length=n)
        return out
    return run


def main():
    x, occ, w = make_inputs()
    h = conv3d(x, w)  # a [B,D,H,W,64] activation volume for pool probes
    h = jax.block_until_ready(h)
    print(f"shape: {B}x({D},{H},{W}) cin{CIN} cout{COUT} {DT.__name__}")
    print("note: all numbers are ms per chained iteration, bs16")

    r = {}
    r["stem_fwd"] = timed_diff(stem_fwd_chain, (x, w))
    print(f"stem k7 conv fwd           : {r['stem_fwd']:8.2f} ms")
    r["stem_fwd_dw"] = timed_diff(stem_fwd_dw_chain, (x, w))
    print(f"stem k7 conv fwd+dW        : {r['stem_fwd_dw']:8.2f} ms")
    r["zfold_fwd_dw"] = timed_diff(zfold_fwd_dw_chain, (x, w))
    print(f"z-fold  conv fwd+dW        : {r['zfold_fwd_dw']:8.2f} ms")
    # 49-fold: REMOVED — OOM (XLA lays out the [B,D,H,W,3] slice with
    # batch on sublanes/lanes -> 42.7x padding, 2.36G temp). The z-fold
    # number stands as the best XLA-level reformulation.
    r["pool_fwd"] = timed_diff(pool_fwd_chain, (h, occ))
    print(f"maxpool fwd                : {r['pool_fwd']:8.2f} ms")
    r["pool_fwd_bwd"] = timed_diff(pool_fwd_bwd_chain, (h, occ))
    print(f"maxpool fwd+bwd (sel&scat) : {r['pool_fwd_bwd']:8.2f} ms")
    r["pool_manual"] = timed_diff(manual_pool_chain, (h, occ))
    print(f"maxpool fwd+manual bwd     : {r['pool_manual']:8.2f} ms")
    import json
    print(json.dumps(r))


if __name__ == "__main__":
    main()
