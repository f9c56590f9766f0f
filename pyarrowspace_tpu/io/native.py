"""ctypes bindings to the native C++ host runtime (native/arrowspace_host.cpp).

The library is built lazily with g++ on first use (cached as
native/libarrowspace_host.so).  All entry points degrade gracefully: callers
fall back to the pure-Python path when the toolchain or library is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

from ..utils.logging import get_logger

log = get_logger("native")

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "libarrowspace_host.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    src = _NATIVE_DIR / "arrowspace_host.cpp"
    if not src.exists():
        return False
    # Build to a process-unique temp path and rename: concurrent first-use
    # across processes (pytest-xdist workers) must never observe a
    # half-written .so (rename is atomic on POSIX).
    tmp = _SO_PATH.with_suffix(f".so.{os.getpid()}")
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-fPIC", "-shared",
           "-std=c++17", "-o", str(tmp), str(src)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO_PATH)
        log.info("built %s", _SO_PATH)
        return True
    except Exception as e:  # toolchain missing / build error -> fallback
        log.warning("native build failed: %s", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first use; None if
    unavailable (callers must fall back)."""
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not _SO_PATH.exists() and not _build():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_SO_PATH))
        except OSError as e:
            log.warning("native load failed: %s", e)
            _load_failed = True
            return None
        lib.asx_scan_validate.restype = ctypes.c_int
        lib.asx_scan_validate.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        lib.asx_knn_f64.restype = ctypes.c_int
        lib.asx_knn_f64.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32)]
        lib.asx_symmetrize_ell.restype = ctypes.c_int
        lib.asx_symmetrize_ell.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64)]
        lib.asx_write_blob.restype = ctypes.c_int
        lib.asx_write_blob.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_uint8),
                                       ctypes.c_uint64]
        lib.asx_blob_size.restype = ctypes.c_int64
        lib.asx_blob_size.argtypes = [ctypes.c_char_p]
        lib.asx_read_blob.restype = ctypes.c_int
        lib.asx_read_blob.argtypes = [ctypes.c_char_p,
                                      ctypes.POINTER(ctypes.c_uint8),
                                      ctypes.c_uint64]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def scan_validate(data: np.ndarray) -> Optional[tuple[int, int]]:
    """(nan_count, inf_count) via the OpenMP scan; None if unavailable."""
    lib = get_lib()
    if lib is None or data.dtype != np.float64:
        return None
    arr = np.ascontiguousarray(data)
    nan_c, inf_c = ctypes.c_int64(0), ctypes.c_int64(0)
    rc = lib.asx_scan_validate(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        arr.shape[0], arr.shape[1], ctypes.byref(nan_c), ctypes.byref(inf_c))
    if rc != 0:
        return None
    return nan_c.value, inf_c.value


def knn_host(data: np.ndarray, k: int, eps: float
             ) -> Optional[tuple[np.ndarray, np.ndarray]]:
    """Exact host-side eps/k-NN (OpenMP) — validation/golden engine.
    Returns (dist [n,k] f64, idx [n,k] int32) or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    arr = np.ascontiguousarray(data, dtype=np.float64)
    n, f = arr.shape
    out_d = np.empty((n, k), dtype=np.float64)
    out_i = np.empty((n, k), dtype=np.int32)
    rc = lib.asx_knn_f64(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, f, k,
        float(eps), out_d.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        return None
    return out_d, out_i


def symmetrize_host(idx: np.ndarray, w: np.ndarray, ell_width: int
                    ) -> Optional[tuple[np.ndarray, np.ndarray, int]]:
    """Host OpenMP symmetrize-to-ELL with ops/symmetrize.py's exact
    semantics (golden/fallback engine).  Returns (nbr_idx [n,m] int32,
    nbr_w [n,m] f64, n_dropped) or None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    idx_c = np.ascontiguousarray(idx, dtype=np.int32)
    w_c = np.ascontiguousarray(w, dtype=np.float64)
    n, k = idx_c.shape
    m = int(ell_width)
    out_i = np.empty((n, m), dtype=np.int32)
    out_w = np.empty((n, m), dtype=np.float64)
    dropped = ctypes.c_int64(0)
    rc = lib.asx_symmetrize_ell(
        idx_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        w_c.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, k, m,
        out_i.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out_w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.byref(dropped))
    if rc != 0:
        return None
    return out_i, out_w, dropped.value


def write_blob(path: str, payload: bytes) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    buf = (ctypes.c_uint8 * len(payload)).from_buffer_copy(payload)
    return lib.asx_write_blob(path.encode(), buf, len(payload)) == 0


def read_blob(path: str) -> Optional[bytes]:
    lib = get_lib()
    if lib is None:
        return None
    size = lib.asx_blob_size(path.encode())
    if size < 0:
        return None
    out = (ctypes.c_uint8 * size)()
    if lib.asx_read_blob(path.encode(), out, size) != 0:
        return None
    return bytes(out)
