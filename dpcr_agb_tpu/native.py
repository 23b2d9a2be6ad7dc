"""ctypes bindings for the native host ops (native/pointops.cpp) — the C++
layer replacing the reference's cpp_wrappers (grid subsampling, radius
neighbors, KD-tree plot queries). Auto-builds with g++ on first use and falls
back to numpy/sklearn implementations when a compiler isn't available, so the
framework stays importable everywhere.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _ensure_lib(src_name: str, committed_name: str) -> Optional[str]:
    """Path to an up-to-date .so for native/<src_name>.

    Builds to a source-hash-keyed filename (libX-<hash>.so, gitignored) so a
    source edit can never be shadowed by the stale committed binary, and so
    each machine gets its own -march=native build (the committed .so is the
    portable no-compiler fallback). Atomic rename keeps concurrent loader
    workers from racing on a half-written file."""
    src = os.path.join(_SRC_DIR, src_name)
    committed = os.path.join(_SRC_DIR, committed_name)
    if not os.path.exists(src):
        return committed if os.path.exists(committed) else None
    import hashlib
    with open(src, "rb") as f:
        tag = hashlib.blake2b(f.read(), digest_size=6).hexdigest()
    built = os.path.join(
        _SRC_DIR, f"{committed_name.rsplit('.so', 1)[0]}-{tag}.so")
    if os.path.exists(built):
        return built
    err: object = None
    for flags in (["-O3", "-march=native"], ["-O3"]):
        tmp = f"{built}.tmp{os.getpid()}"
        try:
            subprocess.run(
                ["g++", *flags, "-fPIC", "-shared", "-std=c++17",
                 "-o", tmp, src],
                check=True, capture_output=True, timeout=180)
            os.replace(tmp, built)
            return built
        except (OSError, subprocess.SubprocessError) as e:
            err = e
            if os.path.exists(tmp):
                os.unlink(tmp)
    log.info(f"native build of {src_name} failed ({err}); "
             "using committed binary")
    return committed if os.path.exists(committed) else None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = _ensure_lib("pointops.cpp", "libpointops.so")
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError as e:
        log.info(f"native pointops unavailable: {e}")
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.grid_subsample.restype = ctypes.c_int64
    lib.grid_subsample.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_float, f32p, ctypes.c_void_p, ctypes.c_int64]
    lib.radius_neighbors.restype = None
    lib.radius_neighbors.argtypes = [
        f32p, ctypes.c_int64, f32p, ctypes.c_int64, ctypes.c_float,
        ctypes.c_int32, i32p]
    lib.radius_query_2d.restype = ctypes.c_int64
    lib.radius_query_2d.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, i32p, ctypes.c_int64]
    lib.batch_grid_subsample.restype = None
    lib.batch_grid_subsample.argtypes = [
        f32p, i64p, ctypes.c_int64, ctypes.c_float, f32p, i64p,
        ctypes.c_int64]
    _lib = lib
    return _lib


def is_available() -> bool:
    return get_lib() is not None


def grid_subsample(points: np.ndarray, dl: float,
                   feats: Optional[np.ndarray] = None,
                   ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Voxel-barycenter subsample; numpy fallback when the .so is missing."""
    points = np.ascontiguousarray(points, np.float32)
    n = len(points)
    lib = get_lib()
    if lib is not None:
        out_p = np.empty((n, 3), np.float32)
        c = 0 if feats is None else feats.shape[1]
        if feats is None:
            n_out = lib.grid_subsample(points, n, None, 0, dl, out_p, None, n)
            return out_p[:n_out], None
        feats = np.ascontiguousarray(feats, np.float32)
        out_f = np.empty((n, c), np.float32)
        n_out = lib.grid_subsample(
            points, n, feats.ctypes.data_as(ctypes.c_void_p), c, dl, out_p,
            out_f.ctypes.data_as(ctypes.c_void_p), n)
        return out_p[:n_out], out_f[:n_out]
    # numpy fallback
    cells = np.floor(points / dl).astype(np.int64)
    _, inverse, counts = np.unique(cells, axis=0, return_inverse=True,
                                   return_counts=True)
    out_p = np.zeros((len(counts), 3), np.float64)
    np.add.at(out_p, inverse, points)
    out_p = (out_p / counts[:, None]).astype(np.float32)
    out_f = None
    if feats is not None:
        out_f = np.zeros((len(counts), feats.shape[1]), np.float64)
        np.add.at(out_f, inverse, feats)
        out_f = (out_f / counts[:, None]).astype(np.float32)
    return out_p, out_f


def radius_neighbors(queries: np.ndarray, supports: np.ndarray,
                     radius: float, max_k: int) -> np.ndarray:
    """[Nq, max_k] int32, ascending by distance, padded with len(supports)."""
    queries = np.ascontiguousarray(queries, np.float32)
    supports = np.ascontiguousarray(supports, np.float32)
    lib = get_lib()
    if lib is not None:
        out = np.empty((len(queries), max_k), np.int32)
        lib.radius_neighbors(queries, len(queries), supports, len(supports),
                             radius, max_k, out)
        return out
    from sklearn.neighbors import KDTree
    tree = KDTree(supports)
    idx, dist = tree.query_radius(queries, radius, return_distance=True,
                                  sort_results=True)
    out = np.full((len(queries), max_k), len(supports), np.int32)
    for i, row in enumerate(idx):
        k = min(max_k, len(row))
        out[i, :k] = row[:k]
    return out


def radius_query_2d(points_xy: np.ndarray, cx: float, cy: float,
                    radius: float) -> np.ndarray:
    """Indices of points within `radius` of (cx, cy) in the xy plane."""
    points_xy = np.ascontiguousarray(points_xy, np.float32)
    lib = get_lib()
    if lib is not None:
        out = np.empty(len(points_xy), np.int32)
        m = lib.radius_query_2d(points_xy, len(points_xy), cx, cy, radius,
                                out, len(points_xy))
        return out[:m].astype(np.int64)
    d2 = (points_xy[:, 0] - cx) ** 2 + (points_xy[:, 1] - cy) ** 2
    return np.flatnonzero(d2 <= radius * radius)


def _bind_pyramid(lib) -> None:
    if getattr(lib, "_pyramid_bound", False):
        return
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.build_sorted_keys.restype = None
    lib.build_sorted_keys.argtypes = [i32p, u8p, ctypes.c_int64, i64p, i32p]
    lib.key_kernel_map.restype = None
    lib.key_kernel_map.argtypes = [i64p, i32p, ctypes.c_int64, i64p, i64p,
                                   ctypes.c_int64, ctypes.c_int64, i32p]
    lib.downsample_coords.restype = ctypes.c_int64
    lib.downsample_coords.argtypes = [i32p, u8p, ctypes.c_int64,
                                      ctypes.c_int32, ctypes.c_int64, i32p,
                                      u8p]
    lib._pyramid_bound = True


def build_sorted_keys(coords: np.ndarray, mask: np.ndarray):
    """(keys_sorted int64 [V], order int32 [V]) or None if lib missing."""
    lib = get_lib()
    if lib is None:
        return None
    _bind_pyramid(lib)
    coords = np.ascontiguousarray(coords, np.int32)
    mask_u8 = np.ascontiguousarray(mask, np.uint8)
    v = len(coords)
    keys = np.empty(v, np.int64)
    order = np.empty(v, np.int32)
    lib.build_sorted_keys(coords, mask_u8, v, keys, order)
    return keys, order


def key_kernel_map(keys_sorted: np.ndarray, order: np.ndarray,
                   base_keys: np.ndarray, off_keys: np.ndarray) -> np.ndarray:
    lib = get_lib()
    _bind_pyramid(lib)
    k, v_out = len(off_keys), len(base_keys)
    out = np.empty((k, v_out), np.int32)
    lib.key_kernel_map(np.ascontiguousarray(keys_sorted, np.int64),
                       np.ascontiguousarray(order, np.int32),
                       len(keys_sorted),
                       np.ascontiguousarray(base_keys, np.int64),
                       np.ascontiguousarray(off_keys, np.int64), k, v_out,
                       out)
    return out


def downsample_coords(coords: np.ndarray, mask: np.ndarray, stride: int,
                      v_out: int):
    """(out_coords [v_out,3] i32, out_mask [v_out] bool) or None."""
    lib = get_lib()
    if lib is None:
        return None
    _bind_pyramid(lib)
    out_c = np.empty((v_out, 3), np.int32)
    out_m = np.empty(v_out, np.uint8)
    lib.downsample_coords(np.ascontiguousarray(coords, np.int32),
                          np.ascontiguousarray(mask, np.uint8), len(coords),
                          stride, v_out, out_c, out_m)
    return out_c, out_m.astype(bool)


# --- LASzip mini codec (native/laszip.cpp) ----------------------------------

_laz_lib: Optional[ctypes.CDLL] = None
_laz_tried = False


def get_laz_lib() -> Optional[ctypes.CDLL]:
    global _laz_lib, _laz_tried
    if _laz_lib is not None or _laz_tried:
        return _laz_lib
    _laz_tried = True
    path = _ensure_lib("laszip.cpp", "liblaszip_mini.so")
    if path is None:
        log.info("native laszip build skipped (no source or compiler)")
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError as e:
        log.info(f"native laszip unavailable: {e}")
        return None
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    lib.laz_decompress.restype = ctypes.c_int64
    lib.laz_decompress.argtypes = [
        u8p, ctypes.c_int64, u16p, u16p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, u8p]
    lib.laz_compress.restype = ctypes.c_int64
    lib.laz_compress.argtypes = [
        u8p, ctypes.c_int64, u16p, u16p, ctypes.c_int64, ctypes.c_int64,
        u8p, ctypes.c_int64]
    _laz_lib = lib
    return _laz_lib


def laz_available() -> bool:
    return get_laz_lib() is not None


def laz_decompress(blob: bytes, item_types, item_sizes, n_points: int,
                   chunk_size: int, point_data_offset: int = 0) -> np.ndarray:
    """Decompress a LAZ point blob -> raw point records
    [n_points, record_size] u8. Raises on unsupported items/corrupt data."""
    lib = get_laz_lib()
    if lib is None:
        raise RuntimeError("native laszip codec unavailable (no compiler?)")
    types = np.ascontiguousarray(item_types, np.uint16)
    sizes = np.ascontiguousarray(item_sizes, np.uint16)
    rec = int(sizes.sum())
    src = np.frombuffer(blob, np.uint8)
    out = np.zeros((n_points, rec), np.uint8)
    rc = lib.laz_decompress(np.ascontiguousarray(src), len(src), types,
                            sizes, len(types), n_points, chunk_size,
                            point_data_offset, out.reshape(-1))
    if rc != 0:
        raise RuntimeError(f"laz_decompress failed (code {rc}) — "
                           "unsupported LAZ variant or corrupt stream")
    return out


def laz_compress(records: np.ndarray, item_types, item_sizes,
                 chunk_size: int = 50000) -> bytes:
    """Compress raw point records [n, record_size] u8 -> LAZ point blob
    (chunk-table offset + chunks + chunk table)."""
    lib = get_laz_lib()
    if lib is None:
        raise RuntimeError("native laszip codec unavailable (no compiler?)")
    types = np.ascontiguousarray(item_types, np.uint16)
    sizes = np.ascontiguousarray(item_sizes, np.uint16)
    records = np.ascontiguousarray(records, np.uint8)
    n = len(records)
    cap = records.size + 4096 + 8 * max(1, n // max(1, chunk_size))
    out = np.zeros(cap, np.uint8)
    rc = lib.laz_compress(records.reshape(-1), n, types, sizes, len(types),
                          chunk_size, out, cap)
    if rc < 0:
        raise RuntimeError(f"laz_compress failed (code {rc})")
    return out[:rc].tobytes()
