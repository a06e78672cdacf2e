"""ctypes bindings for the native C++ ingest runtime (graphio.cpp).

Compiles lazily with g++ on first use and caches the .so next to the source;
every entry point has a NumPy fallback (io.mmio), so the framework works
without a toolchain. Disable with GRB_NATIVE=0.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "graphio.cpp")
_SO = os.path.join(_DIR, "libgraphio.so")
_DISABLED = os.environ.get("GRB_NATIVE", "1") in ("0", "false")

_lock = threading.Lock()
_lib = None
_build_failed = False

_i64p = ctypes.POINTER(ctypes.c_int64)
_f64p = ctypes.POINTER(ctypes.c_double)


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _build_failed
    if _DISABLED or _build_failed:
        return None
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.gb_read_mtx.restype = ctypes.c_int
        lib.gb_read_mtx.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            _i64p, _i64p, _i64p,
            ctypes.POINTER(_i64p), ctypes.POINTER(_i64p), ctypes.POINTER(_f64p)]
        lib.gb_canonicalize.restype = ctypes.c_int64
        lib.gb_canonicalize.argtypes = [
            _i64p, _i64p, _f64p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(_i64p), ctypes.POINTER(_i64p), ctypes.POINTER(_f64p)]
        lib.gb_free.restype = None
        lib.gb_free.argtypes = [ctypes.c_void_p]
        lib.gb_coo_to_csr.restype = ctypes.c_int
        lib.gb_coo_to_csr.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            _i64p, _i64p, _f64p, _i64p, _i64p, _f64p]
        _lib = lib
        return _lib


def _steal(lib, ptr, n, np_dtype, ct):
    arr = np.ctypeslib.as_array(ctypes.cast(ptr, ctypes.POINTER(ct)),
                                shape=(n,)).copy()
    lib.gb_free(ptr)
    return arr.astype(np_dtype, copy=False)


def read_mtx_native(path: str, directed: int = 0,
                    remove_self_loops: bool = True):
    """Native readMtx (reference: util.hpp:364-430 semantics). Returns
    (rows, cols, vals, nrows, ncols) or None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    nr = ctypes.c_int64()
    nc = ctypes.c_int64()
    nv = ctypes.c_int64()
    rp = _i64p()
    cp = _i64p()
    vp = _f64p()
    rc = lib.gb_read_mtx(path.encode(), directed, int(remove_self_loops),
                         ctypes.byref(nr), ctypes.byref(nc), ctypes.byref(nv),
                         ctypes.byref(rp), ctypes.byref(cp), ctypes.byref(vp))
    if rc != 0:
        return None
    n = nv.value
    rows = _steal(lib, rp, n, np.int64, ctypes.c_int64)
    cols = _steal(lib, cp, n, np.int64, ctypes.c_int64)
    vals = _steal(lib, vp, n, np.float64, ctypes.c_double)
    return rows, cols, vals, nr.value, nc.value


def canonicalize_native(rows, cols, vals, undirected: bool,
                        remove_self_loops: bool):
    """Native canonicalize_coo. Returns (rows, cols, vals) or None."""
    lib = get_lib()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    vals = np.ascontiguousarray(vals, np.float64)
    rp = _i64p()
    cp = _i64p()
    vp = _f64p()
    n = lib.gb_canonicalize(
        rows.ctypes.data_as(_i64p), cols.ctypes.data_as(_i64p),
        vals.ctypes.data_as(_f64p), len(rows), int(undirected),
        int(remove_self_loops), ctypes.byref(rp), ctypes.byref(cp),
        ctypes.byref(vp))
    r = _steal(lib, rp, n, np.int64, ctypes.c_int64)
    c = _steal(lib, cp, n, np.int64, ctypes.c_int64)
    v = _steal(lib, vp, n, np.float64, ctypes.c_double)
    return r, c, v


def coo_to_csr_native(rows, cols, vals, nrows: int, ncols: int):
    """Native O(m+n) radix coo2csr (reference: util.hpp:501-559). Returns
    (row_ptr, cols, vals) float64 values, or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    vals64 = np.ascontiguousarray(vals, np.float64)
    m = len(rows)
    row_ptr = np.zeros(nrows + 1, np.int64)
    cols_out = np.empty(m, np.int64)
    vals_out = np.empty(m, np.float64)
    rc = lib.gb_coo_to_csr(
        m, nrows, ncols,
        rows.ctypes.data_as(_i64p), cols.ctypes.data_as(_i64p),
        vals64.ctypes.data_as(_f64p), row_ptr.ctypes.data_as(_i64p),
        cols_out.ctypes.data_as(_i64p), vals_out.ctypes.data_as(_f64p))
    if rc != 0:
        return None
    return row_ptr, cols_out, vals_out
