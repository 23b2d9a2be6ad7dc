"""Host-side (numpy) sparse-voxel pyramid precompute — the phase-B
alternative to computing level grids + kernel maps inside the jitted step
(SURVEY.md §7 decision 2: "decide per-op by profiling; the design must allow
both behind one interface").

Profiling on the axon v5e showed XLA-TPU sort/searchsorted dominating both
compile and step time, so the default data path precomputes the pyramid in
the loader's prefetch threads (overlapped with device compute) and ships the
maps as `batch.aux`; the device keeps only MXU gathers/matmuls. Semantics
mirror ops/voxel.py exactly (same key packing, cap-drop rule, shadow index),
which tests assert.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from .. import native
from .voxel import COORD_OFFSET, SENTINEL_KEY, hypercube_offsets

_SENT = int(SENTINEL_KEY)


def pack_keys_np(coords: np.ndarray, valid: np.ndarray) -> np.ndarray:
    c = np.clip(coords, -COORD_OFFSET, COORD_OFFSET - 1) + COORD_OFFSET
    key = (c[..., 0].astype(np.int64) << 20) | (c[..., 1] << 10) | c[..., 2]
    return np.where(valid, key, _SENT).astype(np.int64)


class HostGrid:
    __slots__ = ("coords", "mask", "keys_sorted", "order")

    def __init__(self, coords: np.ndarray, mask: np.ndarray):
        self.coords = coords
        self.mask = mask
        built = native.build_sorted_keys(coords, mask) \
            if native.is_available() else None
        if built is not None:
            self.keys_sorted, self.order = built
        else:
            keys = pack_keys_np(coords, mask)
            self.order = np.argsort(keys, kind="stable").astype(np.int32)
            self.keys_sorted = keys[self.order]


def downsample_np(grid: HostGrid, stride: int, v_out: int) -> HostGrid:
    """unique(floor(coords/stride)) with the same sorted-order cap-drop as
    ops/voxel.downsample."""
    if native.is_available():
        out = native.downsample_coords(grid.coords, grid.mask, stride, v_out)
        if out is not None:
            return HostGrid(out[0], out[1])
    down = np.floor_divide(grid.coords, stride)
    keys = pack_keys_np(down, grid.mask)
    order = np.argsort(keys, kind="stable")
    skeys = keys[order]
    sdown = down[order]
    valid = skeys != _SENT
    first = np.empty_like(valid)
    first[0] = valid[0]
    first[1:] = (skeys[1:] != skeys[:-1]) & valid[1:]
    uniq = sdown[first][:v_out]
    out_coords = np.zeros((v_out, 3), np.int32)
    out_coords[: len(uniq)] = uniq
    out_mask = np.zeros(v_out, bool)
    out_mask[: len(uniq)] = True
    return HostGrid(out_coords, out_mask)


def lookup_np(grid: HostGrid, probe_coords: np.ndarray,
              probe_valid: np.ndarray) -> np.ndarray:
    v = grid.coords.shape[0]
    pk = pack_keys_np(probe_coords, probe_valid)
    pos = np.searchsorted(grid.keys_sorted, pk)
    pos_c = np.minimum(pos, v - 1)
    found = (grid.keys_sorted[pos_c] == pk) & (pk != _SENT)
    return np.where(found, grid.order[pos_c], v).astype(np.int32)


def kernel_map_np(in_grid: HostGrid, out_grid: HostGrid,
                  offsets: np.ndarray, stride: int) -> np.ndarray:
    base = out_grid.coords * stride
    lo = base.min(initial=0) + offsets.min(initial=0)
    hi = base.max(initial=0) + offsets.max(initial=0)
    if -COORD_OFFSET <= lo and hi < COORD_OFFSET:
        # fast path: probe key = base key + offset key (no clipping can
        # occur, so the packed-key arithmetic is exact)
        base_keys = pack_keys_np(base, out_grid.mask)            # [V]
        # offsets can be negative: compose keys ARITHMETICALLY (bitwise OR
        # would corrupt sign bits)
        off_keys = (offsets[:, 0].astype(np.int64) * (1 << 20)
                    + offsets[:, 1].astype(np.int64) * (1 << 10)
                    + offsets[:, 2].astype(np.int64))            # [K]
        if native.is_available():
            return native.key_kernel_map(in_grid.keys_sorted, in_grid.order,
                                         base_keys, off_keys)
        pk = np.where(out_grid.mask[None, :],
                      base_keys[None, :] + off_keys[:, None], _SENT)
        v = in_grid.coords.shape[0]
        pos = np.searchsorted(in_grid.keys_sorted, pk)
        pos_c = np.minimum(pos, v - 1)
        found = (in_grid.keys_sorted[pos_c] == pk) & (pk != _SENT)
        return np.where(found, in_grid.order[pos_c], v).astype(np.int32)
    probe = base[None, :, :] + offsets[:, None, :]
    return lookup_np(in_grid, probe, out_grid.mask[None, :])


def resnet_pyramid_plan(first_stride: int, strides: Sequence[int],
                        v0: int, fracs: Sequence[float],
                        caps: Optional[Sequence[int]] = None) -> dict:
    """The level/map layout a SparseResNet forward consumes — must match
    models/minkowski.SparseResNet.__call__."""
    n_down = sum(1 for s in strides if s != 1) + 1
    if first_stride != 1:
        n_down += 1
    n_levels = n_down + 1
    if caps is None:
        caps = [max(8, -(-int(v0 * fracs[min(l, len(fracs) - 1)]) // 8) * 8)
                for l in range(n_levels)]
    return {"first_stride": first_stride, "strides": tuple(strides),
            "n_levels": n_levels, "caps": tuple(int(c) for c in caps)}


def sparse_pyramid_host(coords: np.ndarray, mask: np.ndarray,
                        plan: dict) -> Dict[str, np.ndarray]:
    """Per-sample pyramid arrays for one SparseResNet forward."""
    off343 = hypercube_offsets(7)
    off27 = hypercube_offsets(3)
    off1 = hypercube_offsets(1)
    caps = plan["caps"]
    n_levels = plan["n_levels"]

    grids: List[HostGrid] = [HostGrid(coords, mask)]
    for l in range(1, n_levels):
        grids.append(downsample_np(grids[l - 1], 2, caps[l]))

    out: Dict[str, np.ndarray] = {}
    for l, g in enumerate(grids):
        out[f"mask{l}"] = g.mask
    if plan["first_stride"] == 1:
        out["stem_map"] = kernel_map_np(grids[0], grids[0], off343, 1)
        stem_level = 0
    else:
        out["stem_map"] = kernel_map_np(grids[0], grids[1], off343, 2)
        stem_level = 1
    out["pool_map"] = kernel_map_np(grids[stem_level],
                                    grids[stem_level + 1], off27, 2)
    level = stem_level + 1
    s1_done = set()

    def ensure_s1(lv):
        if lv not in s1_done:
            out[f"s1_map{lv}"] = kernel_map_np(grids[lv], grids[lv], off27, 1)
            s1_done.add(lv)

    for si, stride in enumerate(plan["strides"]):
        if stride != 1:
            out[f"down_k3_{si}"] = kernel_map_np(grids[level],
                                                 grids[level + 1], off27, 2)
            out[f"down_k1_{si}"] = kernel_map_np(grids[level],
                                                 grids[level + 1], off1, 2)
            level += 1
        ensure_s1(level)
    return out


def collate_sparse_aux(coords_b: np.ndarray, mask_b: np.ndarray,
                       plan: dict) -> Dict[str, np.ndarray]:
    """Stack per-sample pyramids into batch arrays."""
    per = [sparse_pyramid_host(coords_b[i], mask_b[i], plan)
           for i in range(coords_b.shape[0])]
    return {k: np.stack([p[k] for p in per]) for k in per[0]}


def make_sparse_post_collate(plan_fn):
    """Loader post_collate: plan_fn(v0) -> plan; attaches batch.aux."""
    import dataclasses

    def post_collate(batch):
        plan = plan_fn(batch.coords.shape[1])
        aux = collate_sparse_aux(np.asarray(batch.coords),
                                 np.asarray(batch.mask), plan)
        return dataclasses.replace(batch, aux=aux)

    return post_collate


# ---- KPConv pyramid (host side of models/kpconv.KPCNN) ----------------------

def kpconv_pyramid_plan(first_subsampling_dl: float, conv_radius: float,
                        n_levels: int, v0: int, fracs: Sequence[float],
                        klims: Sequence[int],
                        deform_levels: Optional[Sequence[bool]] = None,
                        deform_scale: float = 1.0) -> dict:
    caps = [max(16, -(-int(v0 * fracs[min(l, len(fracs) - 1)]) // 8) * 8)
            for l in range(n_levels)]
    return {"dl": first_subsampling_dl, "conv_radius": conv_radius,
            "n_levels": n_levels, "caps": tuple(caps),
            "klims": tuple(int(k) for k in klims),
            "deform_levels": tuple(deform_levels or [False] * n_levels),
            "deform_scale": float(deform_scale)}


def _edge_transpose(nbr: np.ndarray, ns: int):
    """Edge-sort permutation + segment offsets enabling a scatter-free
    gather transpose on TPU (models/kpconv.neighbor_gather): perm sorts the
    flattened edge list by support row; off[j] = first sorted-edge position
    referencing support j (len ns+2; the last segment holds shadow edges).
    Pure geometry — precomputed here so the device backward is gather +
    cumsum + diff instead of a scatter-add."""
    flat = nbr.reshape(-1)
    perm = np.argsort(flat, kind="stable").astype(np.int32)
    off = np.searchsorted(flat[perm], np.arange(ns + 2)).astype(np.int32)
    return perm, off


REV_KR_LADDER = (2, 3, 4, 6, 8)  # reverse-list width buckets, in units of K


def _rev_cap(plan: dict, k: int, nbr: np.ndarray, ns: int) -> int:
    """Reverse-list width: an explicit plan['rev_kr'] wins; otherwise pick
    the smallest ladder bucket covering this sample's max in-degree (radius
    graphs keep in-degree near the out-degree cap K, but density spikes can
    exceed 2K — a fixed cap would crash training at collate time). The
    ladder bounds jit re-specializations; batch stacking pads to the batch
    max (sentinel-padded, gradient-exact)."""
    if "rev_kr" in plan:
        return int(plan["rev_kr"])
    md = max_in_degree(nbr, ns)
    for mult in REV_KR_LADDER:
        if mult * k >= md:
            return mult * k
    return max(md, REV_KR_LADDER[-1] * k)


def kpconv_pyramid_host(pos: np.ndarray, mask: np.ndarray,
                        plan: dict) -> Dict[str, np.ndarray]:
    """Per-sample KPConv pyramid on the native C++ ops: per-level points
    (voxel barycenters, reference grid_subsampling.cpp semantics), radius
    conv/pool neighbor lists sorted by distance with shadow padding
    (neighbors.cpp semantics). Matches models/kpconv.KPCNN's device pyramid
    (radius schedule kpconv.py:148,196,234)."""
    from .. import native

    SHADOW_POS = 1e6
    n_levels = plan["n_levels"]
    caps, klims = plan["caps"], plan["klims"]
    r = plan["dl"] * plan["conv_radius"]
    out: Dict[str, np.ndarray] = {}

    # level 0 keeps the ORIGINAL row order (indices address batch features);
    # padding rows are parked far away so the radius search never hits them.
    # collate puts valid rows first (data/batch.py collate), so the radius
    # search runs on the compact valid slice only — feeding the padded
    # arrays would drop every shadow row into ONE grid cell and cost
    # O(padding^2) distance tests per level (measured 5-10x of the whole
    # pyramid on real batches).
    padded = np.where(mask[:, None], pos, SHADOW_POS).astype(np.float32)
    m = mask.copy()
    n0 = int(m.sum())
    if n0 and not m[:n0].all():
        # the [:n] slicing below indexes rows positionally, so a sparse
        # mask would silently address the wrong feature rows
        raise ValueError("host pyramid requires a prefix-packed mask "
                         "(valid rows first, as data/batch.py collates)")
    pts = pos[mask].astype(np.float32)

    for l in range(n_levels):
        cap = padded.shape[0]
        n = int(m.sum())
        out[f"kp_pts{l}"] = padded
        out[f"kp_mask{l}"] = m
        r_search = r * (plan["deform_scale"] if plan["deform_levels"][l]
                        else 1.0)
        nbr = np.full((cap, klims[l]), cap, np.int32)
        if n:
            nv = native.radius_neighbors(padded[:n], padded[:n], r_search,
                                         klims[l])
            # C++ pads with len(supports)=n; shadow index = padded count
            nbr[:n] = np.where(nv >= n, cap, nv)
        out[f"kp_conv{l}"] = nbr
        if plan.get("reverse_dx", False):
            out[f"kp_crev{l}"] = reverse_lists(
                nbr, cap, _rev_cap(plan, klims[l], nbr, cap))
        if plan.get("edge_transpose", False):
            # scatter-free-backward aux: OFF by default — measured SLOWER
            # than XLA's scatter-add on TPU v5e (dx 212 vs 129 ms at
            # bs8/16384/K40: the cotangent re-sort gather + layout copies
            # outweigh the removed scatter). Kept for re-evaluation on
            # other topologies.
            out[f"kp_cperm{l}"], out[f"kp_coff{l}"] = \
                _edge_transpose(nbr, cap)
        if l < n_levels - 1:
            dl_next = 2 * r / plan["conv_radius"]
            sub, _ = native.grid_subsample(pts, dl_next)
            next_cap = caps[l + 1]
            sub = sub[:next_cap]
            q_pad = np.full((next_cap, 3), SHADOW_POS, np.float32)
            qm = np.zeros(next_cap, bool)
            q_pad[: len(sub)] = sub
            qm[: len(sub)] = True
            pool = np.full((next_cap, klims[l]), cap, np.int32)
            if len(sub) and n:
                pv = native.radius_neighbors(sub.astype(np.float32),
                                             padded[:n], r_search, klims[l])
                pool[: len(sub)] = np.where(pv >= n, cap, pv)
            out[f"kp_pool{l}"] = pool
            if plan.get("reverse_dx", False):
                out[f"kp_prev{l}"] = reverse_lists(
                    pool, cap, _rev_cap(plan, klims[l], pool, cap))
            if plan.get("edge_transpose", False):
                out[f"kp_pperm{l}"], out[f"kp_poff{l}"] = \
                    _edge_transpose(pool, cap)
            pts = sub
            padded, m = q_pad, qm
        r *= 2
    return out


def make_kpconv_post_collate(plan_fn, cache_bytes: Optional[int] = None):
    """Loader post_collate for KPCNN: plan_fn(n0) -> plan; attaches aux.

    Per-sample pyramid cache: deterministic eval presets feed identical
    point sets every epoch, so pyramids are memoized by a content hash of
    the sample's points (stochastic presets — training augs, treeadd-eval —
    miss naturally). Insert-until-full policy (no LRU eviction: sequential
    epoch scans would thrash an LRU smaller than the working set). Budget
    via DPCR_PYRAMID_CACHE_MB (default 2048; 0 disables)."""
    import dataclasses
    import hashlib
    import os

    if cache_bytes is None:
        cache_bytes = int(os.environ.get(
            "DPCR_PYRAMID_CACHE_MB", "2048")) * (1 << 20)
    cache: Dict[bytes, Dict[str, np.ndarray]] = {}
    cache_used = [0]

    def pyramid_for(pos_i, mask_i, plan):
        if cache_bytes <= 0:
            return kpconv_pyramid_host(pos_i, mask_i, plan)
        key = hashlib.blake2b(
            pos_i.tobytes() + repr(sorted(plan.items())).encode(),
            digest_size=16).digest()
        hit = cache.get(key)
        if hit is not None:
            return hit
        out = kpconv_pyramid_host(pos_i, mask_i, plan)
        if cache_used[0] < cache_bytes:
            cache[key] = out
            cache_used[0] += sum(a.nbytes for a in out.values())
        return out

    def post_collate(batch):
        plan = plan_fn(batch.pos.shape[1])
        pos_b = np.asarray(batch.pos)
        mask_b = np.asarray(batch.mask)
        per = [pyramid_for(pos_b[i], mask_b[i], plan)
               for i in range(pos_b.shape[0])]
        aux = {}
        for k in per[0]:
            arrs = [p[k] for p in per]
            if k.startswith(("kp_crev", "kp_prev")):
                # reverse-list widths come from a per-sample bucket ladder
                # (_rev_cap); pad to the batch max with the sentinel edge id
                # e = nq*K of the forward list (identical across samples)
                lvl = k[len("kp_crev"):]
                fwd = per[0]["kp_conv" + lvl if k.startswith("kp_crev")
                             else "kp_pool" + lvl]
                e = fwd.shape[0] * fwd.shape[1]
                kr = max(a.shape[1] for a in arrs)
                arrs = [np.pad(a, ((0, 0), (0, kr - a.shape[1])),
                               constant_values=e)
                        if a.shape[1] < kr else a for a in arrs]
            # preallocate + row assign: ~3x faster than np.stack for these
            # MB-sized int32 lists (stack funnels through a slower path; the
            # batched pyramid copy was the #1 post-collate cost at bs16)
            out = np.empty((len(arrs),) + arrs[0].shape, arrs[0].dtype)
            for i, a in enumerate(arrs):
                out[i] = a
            aux[k] = out
        return dataclasses.replace(batch, aux=aux)

    return post_collate


def reverse_lists(nbr: np.ndarray, ns: int, kr: int) -> np.ndarray:
    """Reverse neighbor lists for a scatter-free gather-based backward:
    rnbr[j] = flat edge ids e = q*K + k with nbr[q, k] == j, padded with
    sentinel E = Nq*K. Row ns holds shadow edges (discarded upstream).

    kr must be >= the max in-degree (asserted) — gradients are exact, no
    edge is dropped. Radius graphs keep in-degree near the out-degree cap;
    callers pick kr from a small bucket ladder to bound recompiles.
    """
    nq, k = nbr.shape
    e = nq * k
    flat = nbr.reshape(-1)
    order = np.argsort(flat, kind="stable").astype(np.int64)
    sorted_sup = flat[order]
    off = np.searchsorted(sorted_sup, np.arange(ns + 2))
    counts = np.diff(off)
    if counts[:-1].max(initial=0) > kr:
        raise ValueError(
            f"in-degree {int(counts[:-1].max())} exceeds kr={kr}")
    rnbr = np.full((ns + 1, kr), e, np.int32)
    # rank of each sorted edge within its support segment
    rank = np.arange(e) - off[sorted_sup]
    keep = rank < kr  # only the shadow row can overflow; drop its tail
    rnbr[sorted_sup[keep], rank[keep]] = order[keep]
    return rnbr


def max_in_degree(nbr: np.ndarray, ns: int) -> int:
    flat = nbr.reshape(-1)
    counts = np.bincount(flat[flat < ns], minlength=ns)
    return int(counts.max(initial=0))
