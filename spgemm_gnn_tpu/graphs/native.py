"""ctypes binding for the native graph core (native/graphcore.cpp).

Auto-builds the shared library on first use when g++ is available; every entry
point has a pure-numpy fallback, so the native layer is an accelerator, never a
requirement. (This is the framework's analogue of the reference's C++
graph-loading/metadata layer — SURVEY.md §2.1 rows `spmm_base.h` /
`generate_meta.py`.)
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libgraphcore.so")

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def _load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_SO_PATH):
            src = os.path.join(_NATIVE_DIR, "graphcore.cpp")
            if not os.path.exists(src):
                _LIB = False
                return False
            try:
                subprocess.run(["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                               check=True, capture_output=True, timeout=120)
            except Exception:
                _LIB = False
                return False
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _LIB = False
            return False
        lib.gc_build_csr.restype = ctypes.c_int
        lib.gc_build_csr.argtypes = [ctypes.c_int64, _i64p, _i64p,
                                     ctypes.c_int64, _i32p, _i32p, _i32p]
        lib.gc_degrees.restype = ctypes.c_int
        lib.gc_degrees.argtypes = [ctypes.c_int64, _i32p, _i32p,
                                   ctypes.c_int64, _i32p, _i32p]
        lib.gc_plan_count.restype = ctypes.c_int64
        lib.gc_plan_count.argtypes = [_i64p, _i32p] + [ctypes.c_int64] * 7
        lib.gc_plan_fill.restype = ctypes.c_int
        lib.gc_plan_fill.argtypes = [_i32p, _i32p, _i32p, _i16p, _i16p]
        try:
            lib.gc_stream_count.restype = ctypes.c_int
            lib.gc_stream_count.argtypes = (
                [_i64p, ctypes.c_int64] + [ctypes.c_int64] * 6
                + [ctypes.POINTER(ctypes.c_int64)] * 2)
            lib.gc_stream_fill.restype = ctypes.c_int
            lib.gc_stream_fill.argtypes = [_i32p, _i32p, _i32p, _i32p, _i16p]
        except AttributeError:   # stale .so without the stream planner
            lib.gc_stream_count = None
        try:
            lib.gc_labelprop.restype = ctypes.c_int64
            lib.gc_labelprop.argtypes = [_i64p, _i32p, ctypes.c_int64,
                                         ctypes.c_int64, _i64p]
        except AttributeError:   # stale .so without the LPA entry
            lib.gc_labelprop = None
        _LIB = lib
        return lib


def available() -> bool:
    return bool(_load())


def build_csr(src: np.ndarray, dst: np.ndarray, num_nodes: int):
    """Sorted CSR from an edge list. Returns (indptr, indices, edge_dst) or
    None if the native lib is unavailable."""
    lib = _load()
    if not lib:
        return None
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    e = src.shape[0]
    indptr = np.empty(num_nodes + 1, np.int32)
    indices = np.empty(e, np.int32)
    edge_dst = np.empty(e, np.int32)
    rc = lib.gc_build_csr(e, src, dst, num_nodes, indptr, indices, edge_dst)
    if rc != 0:
        return None
    return indptr, indices, edge_dst


def build_plan_arrays(indptr: np.ndarray, indices: np.ndarray,
                      num_nodes: int, S: int, C: int, RW: int,
                      B: int, R: int, num_src_nodes: int = 0):
    """Native tile planning. Returns (ws_dst, ws_src, e_src_local, e_dst_local)
    or None. Output is bit-identical to the Python planner."""
    lib = _load()
    if not lib:
        return None
    indptr64 = np.ascontiguousarray(indptr, np.int64)
    indices32 = np.ascontiguousarray(indices, np.int32)
    with _LOCK:   # planner keeps state between the two passes
        w = lib.gc_plan_count(indptr64, indices32, num_nodes, S, C, RW,
                              B, R, num_src_nodes)
        if w < 0:
            return None
        ws_dst = np.empty(w, np.int32)
        ws_src = np.empty(w, np.int32)
        e_src = np.empty((w, S), np.int16)
        e_dst = np.empty((w, S), np.int16)
        rc = lib.gc_plan_fill(indices32, ws_dst, ws_src,
                              e_src.reshape(-1), e_dst.reshape(-1))
    if rc != 0:
        return None
    return ws_dst, ws_src, e_src, e_dst


def labelprop(indptr: np.ndarray, indices: np.ndarray, num_nodes: int,
              iters: int = 8):
    """Native label propagation (bit-identical to the numpy sweeps in
    graphs/relabel.py, tests/test_native.py). Returns int64 labels or None."""
    lib = _load()
    if not lib or getattr(lib, "gc_labelprop", None) is None:
        return None
    indptr64 = np.ascontiguousarray(indptr, np.int64)
    indices32 = np.ascontiguousarray(indices, np.int32)
    labels = np.arange(num_nodes, dtype=np.int64)
    rc = lib.gc_labelprop(indptr64, indices32, num_nodes, iters, labels)
    if rc < 0:
        return None
    return labels


def build_stream_arrays(indptr: np.ndarray, indices: np.ndarray,
                        num_rows: int, S: int, C: int, RW: int, R: int,
                        GB: int, group_tiles: int):
    """Native stream planning (graphs/stream_tiles.py layout). Returns
    (ws_local, row0, e_src, e_dst) or None. Bit-identical to the Python
    builder (tests/test_native.py)."""
    lib = _load()
    if not lib or getattr(lib, "gc_stream_count", None) is None:
        return None
    indptr64 = np.ascontiguousarray(indptr, np.int64)
    indices32 = np.ascontiguousarray(indices, np.int32)
    with _LOCK:   # planner keeps state between the two passes
        g_out = ctypes.c_int64()
        wg_out = ctypes.c_int64()
        rc = lib.gc_stream_count(indptr64, num_rows, S, C, RW, R, GB,
                                 group_tiles, ctypes.byref(g_out),
                                 ctypes.byref(wg_out))
        if rc != 0:
            return None
        g, wg = g_out.value, wg_out.value
        ws_local = np.empty((g, wg), np.int32)
        row0 = np.empty(g, np.int32)
        e_src = np.empty((g, wg, S), np.int32)
        e_dst = np.empty((g, wg, S), np.int16)
        rc = lib.gc_stream_fill(indices32, ws_local.reshape(-1), row0,
                                e_src.reshape(-1), e_dst.reshape(-1))
    if rc != 0:
        return None
    return ws_local, row0, e_src, e_dst
