"""ctypes bindings to the native C++ host runtime (native/euroc_loader.cpp).

Built lazily with g++ on first use and cached next to the source; every entry
point has a pure-Python fallback (the callers catch ImportError/OSError), so
the package works without a toolchain — with the toolchain, CSV parsing and
the streaming IMU synchronizer run native, matching the reference's C++ host
runtime (SURVEY.md §2 "Non-ROS EuRoC toolkit", "Build system").
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "euroc_loader.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libeuroc.so")


@lru_cache(maxsize=1)
def _lib() -> ctypes.CDLL:
    src = os.path.abspath(_SRC)
    so = os.path.abspath(_SO)
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", src, "-o", so],
            check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(so)
    lib.euroc_csv_count_rows.restype = ctypes.c_long
    lib.euroc_csv_count_rows.argtypes = [ctypes.c_char_p]
    lib.euroc_csv_load.restype = ctypes.c_long
    lib.euroc_csv_load.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_long,
    ]
    lib.imu_ring_create.restype = ctypes.c_void_p
    lib.imu_ring_create.argtypes = [ctypes.c_long]
    lib.imu_ring_destroy.argtypes = [ctypes.c_void_p]
    lib.imu_ring_push.argtypes = [
        ctypes.c_void_p,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.imu_ring_bucket.restype = ctypes.c_long
    lib.imu_ring_bucket.argtypes = [
        ctypes.c_void_p,
        ctypes.c_double,
        ctypes.c_double,
        ctypes.c_double,
        ctypes.c_long,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    return lib


def load_csv(path: str, n_cols: int) -> np.ndarray:
    """Fast CSV of doubles -> (rows, n_cols). Raises on toolchain failure."""
    lib = _lib()
    n = lib.euroc_csv_count_rows(path.encode())
    if n < 0:
        raise FileNotFoundError(path)
    out = np.empty((n, n_cols), np.float64)
    got = lib.euroc_csv_load(
        path.encode(), n_cols, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n
    )
    if got < 0:
        raise OSError(f"native csv load failed: {path}")
    return out[:got]


class ImuRing:
    """Streaming IMU synchronizer (native ring buffer + frame bucketing).

    The online/streaming analogue of the reference's IMU buffer handling: IMU
    callbacks push samples; each camera frame pulls a fixed-slot padded bucket
    aligned exactly the way larvio_tpu.models.propagation expects.
    """

    def __init__(self, capacity: int = 4096):
        self._lib = _lib()
        self._h = self._lib.imu_ring_create(capacity)

    def push(self, t: float, w: np.ndarray, a: np.ndarray) -> None:
        w = np.ascontiguousarray(w, np.float64)
        a = np.ascontiguousarray(a, np.float64)
        self._lib.imu_ring_push(
            self._h,
            float(t),
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )

    def bucket(self, t_prev: float, t_img: float, slots: int, margin: float = 0.04):
        t = np.zeros(slots, np.float32)
        w = np.zeros((slots, 3), np.float32)
        a = np.zeros((slots, 3), np.float32)
        v = np.zeros(slots, np.uint8)
        self._lib.imu_ring_bucket(
            self._h,
            float(t_prev),
            float(t_img),
            float(margin),
            slots,
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return t, w, a, v.astype(bool)

    def __del__(self):
        try:
            self._lib.imu_ring_destroy(self._h)
        except Exception:
            pass
