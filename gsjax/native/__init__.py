"""Native (C++) host-side components, loaded via ctypes.

The reference ships two CUDA extensions (SURVEY.md §2.2): the rasterizer
(whose TPU equivalent is gsjax.ops.pallas_composite) and ``simple-knn``
(whose equivalent lives here — an exact multithreaded KD-tree compiled
on first use with the system g++ and cached next to the source).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "simple_knn.cpp")
_lock = threading.Lock()
_lib = None
_lib_error: Exception | None = None


def _lib_path() -> str:
    # The build cache is keyed on a hash of the source (git checkouts do
    # not preserve mtimes, so an mtime comparison can let a stale — or
    # wrong-arch — binary shadow newer source). Binaries are never
    # committed; each source revision compiles to its own file name.
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_HERE, f"libsimple_knn-{digest}.so")


def _build(lib_path: str) -> str:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", lib_path + ".tmp", _SRC, "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(lib_path + ".tmp", lib_path)
    return lib_path


def load():
    """Compile (once) and load the native library. Raises on failure."""
    global _lib, _lib_error
    with _lock:
        if _lib is not None:
            return _lib
        if _lib_error is not None:
            raise _lib_error
        try:
            lib_path = _lib_path()
            if not os.path.exists(lib_path):
                _build(lib_path)
            lib = ctypes.CDLL(lib_path)
            lib.knn_mean_sq_dist.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.knn_mean_sq_dist.restype = None
            _lib = lib
            return lib
        except Exception as e:  # noqa: BLE001 — callers fall back to scipy
            _lib_error = e
            raise


def knn_mean_sq_dist(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Mean squared distance to the k nearest neighbors, exact, via the
    native KD-tree. (N, 3) float -> (N,) float32."""
    lib = load()
    pts = np.ascontiguousarray(points, dtype=np.float32)
    n = pts.shape[0]
    out = np.empty(n, dtype=np.float32)
    lib.knn_mean_sq_dist(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        np.int32(n),
        np.int32(k),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
