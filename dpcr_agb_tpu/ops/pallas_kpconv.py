"""Fused rigid-KPConv Pallas TPU kernel.

The XLA formulation of the KPConv core op (models/kpconv.kpconv_apply_batched,
reference modules/KPConv/blocks.py:302-400) materializes three HBM giants per
block at level 0 (bs8/16384pts/K40/Kp15): the influence tensor `all_w`
[B,Nq,K,Kp] (315 MB), the gathered features [B,Nq,K,C] and the weighted
tensor [B,Nq,Kp,C], and lowers einsum("bqkp,bqkc->bqpc") to MXU-starved
batched tiny matmuls. This kernel fuses, per query tile, the ENTIRE chain

    influence(rel_pos, kernel_points) -> weighted sum over neighbors
    -> per-kernel-point matmul with W -> sum over kernel points

so the only HBM traffic is the pre-gathered neighbor tensors in (read once)
and the output [M, Cout] (written once). The neighbor gather itself stays in
XLA (Mosaic has no arbitrary-row dynamic gather; measured crash at >8
sublanes) — callers gather `rel`/`nx` with one flat row gather.

MEASURED OUTCOME (v5e, honest chained timing at level-0 shapes
bs8/16384/K40/Kp15/C64): kernel-only fwd 46 ms f32 (T=64/128) / 29.6 ms
bf16 (T=256); value+grad 181 ms — vs the XLA einsum formulation's 17 ms
fwd / 104 ms value+grad. The per-edge influence*feature product
(B*N*K*Kp*C madds) lands on the VPU here, while XLA maps the same
contraction onto the MXU as batched matmuls; the early 70/270 ms "XLA
baseline" that motivated this kernel came from a memoization-broken
harness (the axon transport caches executions on identical buffers).
Kept as an OPT-IN (models/kpconv.KPCNN.fused_kernel) with full parity
tests, for re-evaluation on future Mosaic/hardware generations.

Semantics == kpconv_apply_batched with stop_gradient'd influences (the rigid
path): gradients flow to features and weights only, matching the shared
per-level `all_w` design in models/kpconv.KPCNN.

Layout notes (why the operands look the way they do):
  * rel is passed as three lane-dense [M, K] planes (x,y,z). A single
    [M, K, 3] operand pads lanes 3->128 (42x VMEM + VPU waste).
  * d2 is computed per kernel point on [T, K] lane-dense tiles, then the
    Kp per-point weights are assembled into [T, K, 1] slices for the
    neighbor contraction (one small relayout per kernel point).
  * the kernel-point contraction runs as ONE MXU matmul per tile:
    acc [T, Kp*C] @ Wf [Kp*C, Cout].
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom out of ~16 MB


def _influence(d2, extent: float, influence: str):
    if influence == "constant":
        return jnp.ones_like(d2)
    if influence == "linear":
        return jnp.clip(1.0 - jnp.sqrt(jnp.maximum(d2, 0.0)) / extent, 0.0)
    if influence == "gaussian":
        sigma = extent * 0.3
        return jnp.exp(-d2 / (2 * sigma * sigma + 1e-9))
    raise ValueError(f"Unknown KP_influence: {influence}")


def _d2_all(rx, ry, rz, kp_ref, p):
    kpx = kp_ref[p, 0]
    kpy = kp_ref[p, 1]
    kpz = kp_ref[p, 2]
    dx = rx - kpx
    dy = ry - kpy
    dz = rz - kpz
    return dx * dx + dy * dy + dz * dz


def _min_idx(rx, ry, rz, kp_ref, n_kp):
    """Index of the closest kernel point per (query, neighbor). Strict `<`
    keeps the FIRST minimizer on exact d2 ties — matching the XLA path's
    one-hot argmin (kpconv_apply_batched); a `<=`-style mask double-counted
    tied kernel points."""
    def body(p, carry):
        m, idx = carry
        d2 = _d2_all(rx, ry, rz, kp_ref, p)
        take = d2 < m
        return jnp.minimum(m, d2), jnp.where(take, p, idx)
    d0 = _d2_all(rx, ry, rz, kp_ref, 0)
    _, idx = jax.lax.fori_loop(1, n_kp, body,
                               (d0, jnp.zeros(d0.shape, jnp.int32)))
    return idx


def _w_tile(rx, ry, rz, kp_ref, p, min_idx, extent, influence, aggregation):
    d2 = _d2_all(rx, ry, rz, kp_ref, p)
    w = _influence(d2, extent, influence)
    if aggregation == "closest":
        w = jnp.where(min_idx == p, w, 0.0)
    return w


def _fwd_kernel(rx_ref, ry_ref, rz_ref, nx_ref, wf_ref, kp_ref, out_ref, *,
                n_kp, extent, influence, aggregation, compute_dtype):
    rx, ry, rz = rx_ref[...], ry_ref[...], rz_ref[...]
    nx = nx_ref[...]
    min_idx = (_min_idx(rx, ry, rz, kp_ref, n_kp)
               if aggregation == "closest" else None)

    def body(p, out):
        w = _w_tile(rx, ry, rz, kp_ref, p, min_idx, extent, influence,
                    aggregation)
        part = jnp.sum(w[:, :, None].astype(nx.dtype) * nx, axis=1)  # [T,C]
        return out + jnp.dot(part.astype(compute_dtype),
                             wf_ref[p].astype(compute_dtype),
                             preferred_element_type=jnp.float32)

    cout = out_ref.shape[-1]
    out0 = jnp.zeros((rx.shape[0], cout), jnp.float32)
    out_ref[...] = jax.lax.fori_loop(0, n_kp, body, out0)


def _bwd_kernel(rx_ref, ry_ref, rz_ref, nx_ref, wf_ref, kp_ref, g_ref,
                dnx_ref, dwf_ref, *, n_kp, extent, influence, aggregation,
                compute_dtype):
    i = pl.program_id(0)
    rx, ry, rz = rx_ref[...], ry_ref[...], rz_ref[...]
    nx = nx_ref[...]
    g = g_ref[...]
    min_idx = (_min_idx(rx, ry, rz, kp_ref, n_kp)
               if aggregation == "closest" else None)

    @pl.when(i == 0)
    def _():
        dwf_ref[...] = jnp.zeros_like(dwf_ref)

    def body(p, dnx):
        w = _w_tile(rx, ry, rz, kp_ref, p, min_idx, extent, influence,
                    aggregation)
        wp = w[:, :, None]                                     # [T,K,1]
        dacc_p = jax.lax.dot_general(
            g.astype(compute_dtype), wf_ref[p].astype(compute_dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                # [T,C]
        dnx = dnx + wp * dacc_p[:, None, :]
        part = jnp.sum(wp.astype(nx.dtype) * nx, axis=1)       # [T,C]
        dwf_ref[p] += jax.lax.dot_general(
            part.astype(compute_dtype), g.astype(compute_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # [C,Cout]
        return dnx

    dnx0 = jnp.zeros(nx.shape, jnp.float32)
    dnx_ref[...] = jax.lax.fori_loop(0, n_kp, body, dnx0).astype(
        dnx_ref.dtype)


TILE_OVERRIDE = None  # for benchmarking experiments


def _pick_tile(m: int, k: int, c: int, n_kp: int, cout: int,
               bwd: bool) -> int:
    """Largest T (multiple of 8, <=512) fitting the VMEM budget."""
    if TILE_OVERRIDE is not None:
        return TILE_OVERRIDE
    k_pad = -(-k // 128) * 128   # xyz planes are lane-padded
    c_pad = -(-c // 128) * 128   # nx / product temps are lane-padded
    for t in (512, 256, 128, 64, 32, 16, 8):
        # double-buffered xyz/nx ins, one live [T,K,C] product temp,
        # weights (both precisions), out/g; bwd adds the dnx f32
        # accumulator + dnx out block
        ins = 3 * t * k_pad * 4 * 2 + t * k * c_pad * 4 * 2
        temps = t * k * c_pad * 4
        if bwd:
            temps += t * k * c_pad * 4 * 2 + t * k * c_pad * 4
        w = n_kp * c * cout * 4 * 3 + t * cout * 4 * 4
        if ins + temps + w <= VMEM_BUDGET:
            return t
    return 8


def _pad_rows(x, m_pad):
    pad = m_pad - x.shape[0]
    if pad == 0:
        return x
    return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _kpconv_fused_flat(rel, nx, wf, kp_key, extent, influence, aggregation,
                       compute_dtype):
    out, _ = _kpconv_fused_fwd(rel, nx, wf, kp_key, extent, influence,
                               aggregation, compute_dtype)
    return out


def _specs(t, k, c, n_kp, cout):
    ins = [
        pl.BlockSpec((t, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((t, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((t, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((t, k, c), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_kp, c, cout), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_kp, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    return ins


def _call_fwd(rel, nx, wf, kp, extent, influence, aggregation, compute_dtype):
    m, k, _ = rel.shape
    c = nx.shape[-1]
    n_kp, cout = kp.shape[0], wf.shape[-1]
    t = _pick_tile(m, k, c, n_kp, cout, bwd=False)
    m_pad = -(-m // t) * t
    rx = _pad_rows(rel[:, :, 0], m_pad)
    ry = _pad_rows(rel[:, :, 1], m_pad)
    rz = _pad_rows(rel[:, :, 2], m_pad)
    nxp = _pad_rows(nx, m_pad)
    kernel = functools.partial(
        _fwd_kernel, n_kp=n_kp, extent=float(extent), influence=influence,
        aggregation=aggregation, compute_dtype=compute_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(m_pad // t,),
        in_specs=_specs(t, k, c, n_kp, cout),
        out_specs=pl.BlockSpec((t, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, cout), jnp.float32),
        interpret=_interpret(),
    )(rx, ry, rz, nxp, wf, jnp.asarray(kp))
    return out[:m]


def _call_bwd(rel, nx, wf, kp, extent, influence, aggregation, compute_dtype,
              g):
    m, k, _ = rel.shape
    c = nx.shape[-1]
    n_kp, cout = kp.shape[0], wf.shape[-1]
    t = _pick_tile(m, k, c, n_kp, cout, bwd=True)
    m_pad = -(-m // t) * t
    rx = _pad_rows(rel[:, :, 0], m_pad)
    ry = _pad_rows(rel[:, :, 1], m_pad)
    rz = _pad_rows(rel[:, :, 2], m_pad)
    nxp = _pad_rows(nx, m_pad)
    gp = _pad_rows(g, m_pad)
    kernel = functools.partial(
        _bwd_kernel, n_kp=n_kp, extent=float(extent), influence=influence,
        aggregation=aggregation, compute_dtype=compute_dtype)
    dnx, dwf = pl.pallas_call(
        kernel,
        grid=(m_pad // t,),
        in_specs=_specs(t, k, c, n_kp, cout) + [
            pl.BlockSpec((t, cout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((t, k, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_kp, c, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, k, c), nx.dtype),
            jax.ShapeDtypeStruct((n_kp, c, cout), jnp.float32),
        ),
        interpret=_interpret(),
    )(rx, ry, rz, nxp, wf, jnp.asarray(kp), gp)
    return dnx[:m], dwf


_KP_CACHE: dict = {}


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kpconv_fused_fwd(rel, nx, wf, kp_key, extent, influence, aggregation,
                      compute_dtype):
    kp = _KP_CACHE[kp_key]
    out = _call_fwd(rel, nx, wf, kp, extent, influence, aggregation,
                    compute_dtype)
    return out, (rel, nx, wf)


def _kpconv_fused_bwd(kp_key, extent, influence, aggregation, compute_dtype,
                      res, g):
    rel, nx, wf = res
    kp = _KP_CACHE[kp_key]
    dnx, dwf = _call_bwd(rel, nx, wf, kp, extent, influence, aggregation,
                         compute_dtype, g.astype(jnp.float32))
    # geometry carries no gradient on the rigid path (the model
    # stop_gradients shared influences); a zero cotangent is DCE'd upstream
    return jnp.zeros_like(rel), dnx, dwf


_kpconv_fused_flat.defvjp(_kpconv_fused_fwd, _kpconv_fused_bwd)


def kpconv_fused(rel: jnp.ndarray, nx: jnp.ndarray, weights: jnp.ndarray,
                 kernel_points: np.ndarray, extent: float,
                 influence: str = "linear", aggregation: str = "sum",
                 compute_dtype=jnp.float32) -> jnp.ndarray:
    """Fused rigid KPConv.

    rel [..., K, 3] f32: neighbor position minus query position (shadow
        neighbors at ~1e6 -> zero influence, matching SHADOW_POS semantics).
    nx  [..., K, C]: gathered neighbor features (shadow rows zero).
    weights [Kp, C, Cout] f32.
    kernel_points np [Kp, 3] (static disposition, scaled to radius).
    Returns [..., Cout] f32. Gradients flow to nx and weights only (the
    rigid shared-influence path stop_gradients geometry).
    """
    if rel.shape[:-1] != nx.shape[:-1]:
        raise ValueError(f"rel {rel.shape} vs nx {nx.shape}")
    n_kp, c, cout = weights.shape
    lead = rel.shape[:-2]
    k = rel.shape[-2]
    m = int(np.prod(lead)) if lead else 1
    kp = np.ascontiguousarray(np.asarray(kernel_points, np.float32))
    kp_key = (kp.tobytes(), n_kp)
    _KP_CACHE[kp_key] = kp
    wf = weights.astype(jnp.float32)
    out = _kpconv_fused_flat(
        rel.reshape(m, k, 3).astype(jnp.float32),
        nx.reshape(m, k, c),
        wf, kp_key, float(extent), influence, aggregation, compute_dtype)
    return out.reshape(*lead, cout)
