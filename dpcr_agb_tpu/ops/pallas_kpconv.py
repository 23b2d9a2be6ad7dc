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

VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom out of ~16 MB


def _influence(d2, extent: float, influence: str):
    if influence == "constant":
        return jnp.ones_like(d2)
    if influence == "linear":
        return jnp.clip(1.0 - jnp.sqrt(jnp.maximum(d2, 0.0)) / extent, 0.0)
    if influence == "gaussian":
        sigma = extent * 0.3
        return jnp.exp(-d2 / (2 * sigma * sigma + 1e-9))
    raise ValueError(f"Unknown KP_influence: {influence}")


def _weights_tile(rx, ry, rz, kp: np.ndarray, extent: float, influence: str,
                  aggregation: str):
    """[T,K] xyz planes -> list of Kp weight tiles [T,K] (f32)."""
    n_kp = kp.shape[0]
    d2s = []
    for p in range(n_kp):
        dx = rx - kp[p, 0]
        dy = ry - kp[p, 1]
        dz = rz - kp[p, 2]
        d2s.append(dx * dx + dy * dy + dz * dz)
    ws = [_influence(d2, extent, influence) for d2 in d2s]
    if aggregation == "closest":
        # keep only the closest kernel point's weight per neighbor
        min_d2 = d2s[0]
        for d2 in d2s[1:]:
            min_d2 = jnp.minimum(min_d2, d2)
        ws = [jnp.where(d2 <= min_d2, w, 0.0) for w, d2 in zip(ws, d2s)]
    elif aggregation != "sum":
        raise ValueError(f"Unknown aggregation_mode: {aggregation}")
    return ws


def _fwd_kernel(rx_ref, ry_ref, rz_ref, nx_ref, wf_ref, out_ref, *,
                kp, extent, influence, aggregation, compute_dtype):
    rx, ry, rz = rx_ref[...], ry_ref[...], rz_ref[...]
    nx = nx_ref[...]
    ws = _weights_tile(rx, ry, rz, kp, extent, influence, aggregation)
    parts = []
    for w in ws:
        wp = w[:, :, None].astype(nx.dtype)          # [T,K,1]
        parts.append(jnp.sum(wp * nx, axis=1))       # [T,C]
    acc = jnp.concatenate(parts, axis=-1)            # [T,Kp*C]
    out_ref[...] = jnp.dot(acc.astype(compute_dtype),
                           wf_ref[...].astype(compute_dtype),
                           preferred_element_type=jnp.float32)


def _bwd_kernel(rx_ref, ry_ref, rz_ref, nx_ref, wf_ref, g_ref,
                dnx_ref, dwf_ref, *, kp, extent, influence, aggregation,
                compute_dtype):
    i = pl.program_id(0)

    rx, ry, rz = rx_ref[...], ry_ref[...], rz_ref[...]
    nx = nx_ref[...]
    g = g_ref[...]
    ws = _weights_tile(rx, ry, rz, kp, extent, influence, aggregation)
    c = nx.shape[-1]

    # dacc = g @ Wf^T  (contract Cout)
    dacc = jax.lax.dot_general(
        g.astype(compute_dtype), wf_ref[...].astype(compute_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [T, Kp*C]

    # dnx = sum_p w_p * dacc_p ; acc recomputed for dW
    dnx = jnp.zeros_like(nx, dtype=jnp.float32)
    parts = []
    for p, w in enumerate(ws):
        wp = w[:, :, None]                            # [T,K,1]
        dacc_p = dacc[:, p * c:(p + 1) * c]           # [T,C]
        dnx = dnx + wp * dacc_p[:, None, :].astype(jnp.float32)
        parts.append(jnp.sum(wp.astype(nx.dtype) * nx, axis=1))
    dnx_ref[...] = dnx.astype(dnx_ref.dtype)

    acc = jnp.concatenate(parts, axis=-1)             # [T,Kp*C]
    dwf = jax.lax.dot_general(
        acc.astype(compute_dtype), g.astype(compute_dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # [Kp*C, Cout]

    @pl.when(i == 0)
    def _():
        dwf_ref[...] = jnp.zeros_like(dwf_ref)
    dwf_ref[...] += dwf


def _pick_tile(m: int, k: int, c: int, n_kp: int, cout: int) -> int:
    """Largest T (multiple of 8, <=512) fitting the VMEM budget."""
    for t in (512, 256, 128, 64, 32, 16, 8):
        # double-buffered ins + dnx out (bwd) + acc/dacc + w tiles (lane
        # padded K->128) + weights + out
        ins = t * k * 4 * 3 * 2 + t * k * c * 4 * 2 * 2
        scratch = t * n_kp * c * 4 * 3 + n_kp * t * 128 * 4
        w = n_kp * c * cout * 4 * 2 + t * cout * 4 * 2
        if ins + scratch + w <= VMEM_BUDGET:
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


def _call_fwd(rel, nx, wf, kp, extent, influence, aggregation, compute_dtype):
    m, k, _ = rel.shape
    c = nx.shape[-1]
    n_kp, cout = kp.shape[0], wf.shape[-1]
    t = _pick_tile(m, k, c, n_kp, cout)
    m_pad = -(-m // t) * t
    rx = _pad_rows(rel[:, :, 0], m_pad)
    ry = _pad_rows(rel[:, :, 1], m_pad)
    rz = _pad_rows(rel[:, :, 2], m_pad)
    nxp = _pad_rows(nx, m_pad)
    grid = (m_pad // t,)
    kernel = functools.partial(
        _fwd_kernel, kp=kp, extent=float(extent), influence=influence,
        aggregation=aggregation, compute_dtype=compute_dtype)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, k, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_kp * c, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((t, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, cout), jnp.float32),
        interpret=_interpret(),
    )(rx, ry, rz, nxp, wf)
    return out[:m]


def _call_bwd(rel, nx, wf, kp, extent, influence, aggregation, compute_dtype,
              g):
    m, k, _ = rel.shape
    c = nx.shape[-1]
    n_kp, cout = kp.shape[0], wf.shape[-1]
    t = _pick_tile(m, k, c, n_kp, cout)
    m_pad = -(-m // t) * t
    rx = _pad_rows(rel[:, :, 0], m_pad)
    ry = _pad_rows(rel[:, :, 1], m_pad)
    rz = _pad_rows(rel[:, :, 2], m_pad)
    nxp = _pad_rows(nx, m_pad)
    gp = _pad_rows(g, m_pad)
    grid = (m_pad // t,)
    kernel = functools.partial(
        _bwd_kernel, kp=kp, extent=float(extent), influence=influence,
        aggregation=aggregation, compute_dtype=compute_dtype)
    dnx, dwf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, k, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_kp * c, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, cout), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((t, k, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_kp * c, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, k, c), nx.dtype),
            jax.ShapeDtypeStruct((n_kp * c, cout), jnp.float32),
        ),
        interpret=_interpret(),
    )(rx, ry, rz, nxp, wf, gp)
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
    wf = weights.astype(jnp.float32).reshape(n_kp * c, cout)
    out = _kpconv_fused_flat(
        rel.reshape(m, k, 3).astype(jnp.float32),
        nx.reshape(m, k, c),
        wf, kp_key, float(extent), influence, aggregation, compute_dtype)
    return out.reshape(*lead, cout)
