"""ctypes bindings for the native preprocessing kernels (native/pcnative.cpp).

Builds the shared library on first use (g++ -O3) and caches it next to the
source; every caller falls back to the pure-python implementations in
preprocess.py when the toolchain or build is unavailable, so the native path
is a transparent fast path, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

# source ships INSIDE the package (_native/pcnative.cpp) so a pip install
# carries it; the compiled .so lands next to it when that dir is writable
# (repo checkout), else in a per-user cache (read-only site-packages)
_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "_native", "pcnative.cpp",
)


def _so_path() -> str:
    d = os.path.dirname(_SRC)
    if os.access(d, os.W_OK):
        return os.path.join(d, "libpcnative.so")
    cache = os.environ.get(
        "PLPE_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "plpe"),
    )
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, "libpcnative.so")


_SO = _so_path()

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
                 "-o", _SO, _SRC],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        lib.pc_dbscan.restype = ctypes.c_int32
        lib.pc_dbscan.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int32,
            ctypes.c_double,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.pc_radius_counts.restype = None
        lib.pc_radius_counts.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int32,
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.pc_load_csv_files.restype = ctypes.c_int32
        lib.pc_load_csv_files.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def dbscan(xyz: np.ndarray, eps: float, min_points: int) -> np.ndarray | None:
    """Native DBSCAN labels, or None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(xyz, dtype=np.float64)
    labels = np.empty(len(pts), dtype=np.int64)
    lib.pc_dbscan(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(pts),
        float(eps),
        int(min_points),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return labels


def load_csv_files(
    paths: list[str], max_rows: int, cols: int, n_threads: int = 0
) -> tuple[np.ndarray, np.ndarray] | None:
    """Bulk-parse CSV float files with the native thread pool.

    Returns ``(values [n, max_rows, cols] float32, rows [n] int32)`` where
    ``rows[i] == -1`` marks an unreadable file, or None when the native
    library is unavailable (callers fall back to numpy parsing).
    """
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    blob = b"\0".join(p.encode() for p in paths) + b"\0"
    out = np.empty((n, max_rows, cols), dtype=np.float32)
    rows = np.empty((n,), dtype=np.int32)
    nt = n_threads or min(os.cpu_count() or 1, 16)
    lib.pc_load_csv_files(
        blob,
        n,
        int(max_rows),
        int(cols),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        int(nt),
    )
    return out, rows


def radius_counts(xyz: np.ndarray, radius: float) -> np.ndarray | None:
    """Neighbor counts within radius (excl. self), or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(xyz, dtype=np.float64)
    counts = np.empty(len(pts), dtype=np.int32)
    lib.pc_radius_counts(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(pts),
        float(radius),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return counts
