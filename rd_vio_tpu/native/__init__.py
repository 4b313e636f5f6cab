"""Native (C++) runtime components: EuRoC dataloader + sensor queue.

Compiled on demand with g++ into a cached shared library and bound via ctypes
(no pybind11 in this environment). The compute path stays JAX/XLA; this is the
IO/runtime side the reference implements in C++ (SURVEY.md §2 L5/L7).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "_librdvio_native.so")
_SOURCES = ["euroc_loader.cpp", "sensor_queue.cpp", "preintegrator.cpp"]
_lock = threading.Lock()
_lib = None


def _build() -> str:
    srcs = [os.path.join(_HERE, s) for s in _SOURCES]
    newest_src = max(os.path.getmtime(s) for s in srcs)
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= newest_src:
        return _LIB_PATH
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
        *srcs, "-lpng", "-o", _LIB_PATH,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def load_library():
    """Build (if needed) and load the native library. Raises on failure."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        path = _build()
        lib = ctypes.CDLL(path)
        # euroc loader
        lib.rdvio_euroc_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.rdvio_euroc_open.restype = ctypes.c_int64
        lib.rdvio_euroc_imu_count.argtypes = [ctypes.c_int64]
        lib.rdvio_euroc_imu_count.restype = ctypes.c_int64
        lib.rdvio_euroc_imu_data.argtypes = [
            ctypes.c_int64, ctypes.POINTER(ctypes.c_double)
        ]
        lib.rdvio_euroc_frame_count.argtypes = [ctypes.c_int64]
        lib.rdvio_euroc_frame_count.restype = ctypes.c_int64
        lib.rdvio_euroc_frame_times.argtypes = [
            ctypes.c_int64, ctypes.POINTER(ctypes.c_double)
        ]
        lib.rdvio_euroc_image_size.argtypes = [
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)
        ]
        lib.rdvio_euroc_load_image.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_float)
        ]
        lib.rdvio_euroc_load_image.restype = ctypes.c_int
        lib.rdvio_euroc_prefetch.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64
        ]
        lib.rdvio_euroc_close.argtypes = [ctypes.c_int64]
        # sensor queue
        lib.rdvio_queue_create.argtypes = [ctypes.c_int64]
        lib.rdvio_queue_create.restype = ctypes.c_int64
        lib.rdvio_queue_push_gyro.argtypes = [ctypes.c_int64] + [ctypes.c_double] * 4
        lib.rdvio_queue_push_accel.argtypes = [ctypes.c_int64] + [ctypes.c_double] * 4
        lib.rdvio_queue_push_motion.argtypes = [
            ctypes.c_int64, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ]
        lib.rdvio_queue_fused_count.argtypes = [ctypes.c_int64]
        lib.rdvio_queue_fused_count.restype = ctypes.c_int64
        lib.rdvio_queue_pop_interval.argtypes = [
            ctypes.c_int64, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ]
        lib.rdvio_queue_pop_interval.restype = ctypes.c_int64
        lib.rdvio_queue_destroy.argtypes = [ctypes.c_int64]
        # preintegrator
        dptr = ctypes.POINTER(ctypes.c_double)
        lib.rdvio_preintegrate_batch.argtypes = (
            [ctypes.c_longlong, ctypes.c_longlong] + [dptr] * 20
        )
        lib.rdvio_predict_mean.argtypes = [ctypes.c_longlong] + [dptr] * 11
        u8ptr = ctypes.POINTER(ctypes.c_ubyte)
        lib.rdvio_poisson_filter.argtypes = [
            ctypes.c_longlong, dptr, u8ptr, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_longlong, u8ptr,
        ]
        _lib = lib
        return lib


def preintegrate_batch(dts, ws, accs, bg, ba, cov_w, cov_a, cov_bg, cov_ba):
    """Batched sequential IMU preintegration on host (f64), returning a dict
    of NumPy arrays with leading axis F: t, q, p, v, cov, dq_dbg, dp_dbg,
    dp_dba, dv_dbg, dv_dba, sqrt_inv_cov. Shapes: dts (F, N); ws/accs (F, N, 3);
    bg/ba (F, 3); cov_* (3, 3)."""
    lib = load_library()
    F, N = dts.shape
    c = lambda a: np.ascontiguousarray(a, dtype=np.float64)
    dts, ws, accs, bg, ba = c(dts), c(ws), c(accs), c(bg), c(ba)
    cov_w, cov_a, cov_bg, cov_ba = c(cov_w), c(cov_a), c(cov_bg), c(cov_ba)
    out = {
        "t": np.zeros(F), "q": np.zeros((F, 4)), "p": np.zeros((F, 3)),
        "v": np.zeros((F, 3)), "cov": np.zeros((F, 15, 15)),
        "dq_dbg": np.zeros((F, 3, 3)), "dp_dbg": np.zeros((F, 3, 3)),
        "dp_dba": np.zeros((F, 3, 3)), "dv_dbg": np.zeros((F, 3, 3)),
        "dv_dba": np.zeros((F, 3, 3)), "sqrt_inv_cov": np.zeros((F, 15, 15)),
    }
    dp = ctypes.POINTER(ctypes.c_double)
    p_ = lambda a: a.ctypes.data_as(dp)
    lib.rdvio_preintegrate_batch(
        F, N, p_(dts), p_(ws), p_(accs), p_(bg), p_(ba),
        p_(cov_w), p_(cov_a), p_(cov_bg), p_(cov_ba),
        p_(out["t"]), p_(out["q"]), p_(out["p"]), p_(out["v"]), p_(out["cov"]),
        p_(out["dq_dbg"]), p_(out["dp_dbg"]), p_(out["dp_dba"]),
        p_(out["dv_dbg"]), p_(out["dv_dba"]), p_(out["sqrt_inv_cov"]),
    )
    return out


def predict_mean(q0, p0, v0, bg, ba, dts, ws, accs):
    """Mean-only IMU propagation of one interval (native f64); returns
    (q, p, v). Mirrors ops/preintegration_np.predict_frame_mean."""
    lib = load_library()
    c = lambda a: np.ascontiguousarray(a, dtype=np.float64)
    dts, ws, accs = c(dts), c(ws), c(accs)
    q0, p0, v0, bg, ba = c(q0), c(p0), c(v0), c(bg), c(ba)
    q = np.zeros(4)
    p = np.zeros(3)
    v = np.zeros(3)
    dp = ctypes.POINTER(ctypes.c_double)
    p_ = lambda a: a.ctypes.data_as(dp)
    lib.rdvio_predict_mean(
        len(dts), p_(dts), p_(ws), p_(accs), p_(bg), p_(ba),
        p_(q0), p_(p0), p_(v0), p_(q), p_(p), p_(v),
    )
    return q, p, v


def poisson_filter(points, valid, min_distance, width, height,
                   preset_count: int = 0):
    """Greedy Poisson-disk grid filter (native); returns accepted mask."""
    lib = load_library()
    pts = np.ascontiguousarray(points, dtype=np.float64)
    val = np.ascontiguousarray(valid, dtype=np.uint8)
    acc = np.zeros(len(pts), np.uint8)
    lib.rdvio_poisson_filter(
        len(pts), pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        val.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        float(min_distance), float(width), float(height), int(preset_count),
        acc.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return acc.astype(bool)


def available() -> bool:
    try:
        load_library()
        return True
    except Exception:
        return False


class NativeEurocDataset:
    """Fast EuRoC reader backed by the native loader (CSV + libpng decode with
    background prefetch)."""

    def __init__(self, mav0_dir: str, n_threads: int = 2):
        self.lib = load_library()
        self.handle = self.lib.rdvio_euroc_open(mav0_dir.encode(), n_threads)
        if not self.handle:
            raise IOError(f"failed to open EuRoC dir {mav0_dir}")
        n_imu = self.lib.rdvio_euroc_imu_count(self.handle)
        buf = np.zeros((n_imu, 7))
        self.lib.rdvio_euroc_imu_data(
            self.handle, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        )
        self.imu_t = buf[:, 0].copy()
        self.gyro = buf[:, 1:4].copy()
        self.accel = buf[:, 4:7].copy()
        n_f = self.lib.rdvio_euroc_frame_count(self.handle)
        ts = np.zeros(n_f)
        self.lib.rdvio_euroc_frame_times(
            self.handle, ts.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
        )
        self.frame_t = ts
        w = ctypes.c_int()
        h = ctypes.c_int()
        self.lib.rdvio_euroc_image_size(self.handle, ctypes.byref(w), ctypes.byref(h))
        self.width, self.height = w.value, h.value

    def load_image(self, idx: int, prefetch_ahead: int = 8) -> np.ndarray:
        out = np.zeros((self.height, self.width), np.float32)
        rc = self.lib.rdvio_euroc_load_image(
            self.handle, idx, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        if rc != 0:
            raise IOError(f"image decode failed for frame {idx} (rc={rc})")
        if prefetch_ahead:
            self.lib.rdvio_euroc_prefetch(self.handle, idx + 1, prefetch_ahead)
        return out

    def close(self):
        if self.handle:
            self.lib.rdvio_euroc_close(self.handle)
            self.handle = 0

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeSensorQueue:
    """Gyro/accel interleaving ring buffer (reference handler.cpp:56-152)."""

    def __init__(self, capacity: int = 8192):
        self.lib = load_library()
        self.handle = self.lib.rdvio_queue_create(capacity)

    def push_gyro(self, t: float, w):
        self.lib.rdvio_queue_push_gyro(self.handle, t, w[0], w[1], w[2])

    def push_accel(self, t: float, a):
        self.lib.rdvio_queue_push_accel(self.handle, t, a[0], a[1], a[2])

    def push_motion(self, t: float, w, a):
        w = np.ascontiguousarray(w, dtype=np.float64)
        a = np.ascontiguousarray(a, dtype=np.float64)
        self.lib.rdvio_queue_push_motion(
            self.handle, t,
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )

    def fused_count(self) -> int:
        return int(self.lib.rdvio_queue_fused_count(self.handle))

    def pop_interval(self, t_end: float, cap: int = 1024) -> np.ndarray:
        out = np.zeros((cap, 7))
        n = self.lib.rdvio_queue_pop_interval(
            self.handle, t_end,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), cap,
        )
        return out[: max(n, 0)]

    def destroy(self):
        if self.handle:
            self.lib.rdvio_queue_destroy(self.handle)
            self.handle = 0
