"""ctypes bindings for the native host runtime (runtime.cpp).

Auto-builds libdstpu_runtime.so on first import when a compiler is
available; consumers fall back to the pure-Python implementations in
systems/ when the native library cannot be loaded (`available()` tells
you which one you got).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libdstpu_runtime.so")
_lib: Optional[ctypes.CDLL] = None
_build_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=_DIR, check=True, capture_output=True, timeout=120
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    with _build_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.dstpu_monotonic_ms.restype = ctypes.c_int64
        lib.dstpu_system_ms.restype = ctypes.c_int64
        lib.dstpu_pose_buffer_new.restype = ctypes.c_void_p
        lib.dstpu_pose_buffer_new.argtypes = [ctypes.c_int]
        lib.dstpu_pose_buffer_free.argtypes = [ctypes.c_void_p]
        lib.dstpu_pose_buffer_register.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.dstpu_pose_buffer_size.restype = ctypes.c_int64
        lib.dstpu_pose_buffer_size.argtypes = [ctypes.c_void_p]
        lib.dstpu_pose_buffer_query.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.dstpu_frame_queue_new.restype = ctypes.c_void_p
        lib.dstpu_frame_queue_new.argtypes = [ctypes.c_int64]
        lib.dstpu_frame_queue_free.argtypes = [ctypes.c_void_p]
        lib.dstpu_frame_queue_push.restype = ctypes.c_int
        lib.dstpu_frame_queue_push.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
        ]
        lib.dstpu_frame_queue_depth.restype = ctypes.c_int64
        lib.dstpu_frame_queue_depth.argtypes = [ctypes.c_void_p]
        lib.dstpu_frame_queue_dropped.restype = ctypes.c_uint64
        lib.dstpu_frame_queue_dropped.argtypes = [ctypes.c_void_p]
        lib.dstpu_frame_queue_close.argtypes = [ctypes.c_void_p]
        lib.dstpu_frame_queue_pop.restype = ctypes.c_int64
        lib.dstpu_frame_queue_pop.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class NativePoseBuffer:
    """C++ pose buffer; same semantics as systems.pose_manager.PoseManager."""

    def __init__(self, interpolate: bool = True):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._h = lib.dstpu_pose_buffer_new(1 if interpolate else 0)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.dstpu_pose_buffer_free(self._h)
            self._h = None

    def register_valid_pose(self, timestamp_ms: int, pose: np.ndarray) -> None:
        m = np.ascontiguousarray(pose, np.float64)
        self._lib.dstpu_pose_buffer_register(
            self._h,
            int(timestamp_ms),
            m.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )

    def __len__(self) -> int:
        return int(self._lib.dstpu_pose_buffer_size(self._h))

    def query_pose(self, timestamp_ms: int) -> np.ndarray:
        out = np.empty((4, 4), np.float64)
        self._lib.dstpu_pose_buffer_query(
            self._h,
            int(timestamp_ms),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return out.astype(np.float32)


class NativeFrameQueue:
    """Bounded MPSC byte-blob queue with drop-oldest backpressure."""

    def __init__(self, capacity: int = 16):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._h = lib.dstpu_frame_queue_new(capacity)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.dstpu_frame_queue_free(self._h)
            self._h = None

    def push(self, timestamp_ms: int, blob: bytes) -> bool:
        buf = (ctypes.c_uint8 * len(blob)).from_buffer_copy(blob)
        return bool(
            self._lib.dstpu_frame_queue_push(self._h, int(timestamp_ms), buf, len(blob))
        )

    def pop(self, timeout_ms: int = 100, max_size: int = 1 << 24):
        out = (ctypes.c_uint8 * max_size)()
        ts = ctypes.c_int64()
        n = self._lib.dstpu_frame_queue_pop(
            self._h, int(timeout_ms), ctypes.byref(ts), out, max_size
        )
        if n <= 0:
            return None
        return int(ts.value), bytes(out[:n])

    def depth(self) -> int:
        return int(self._lib.dstpu_frame_queue_depth(self._h))

    def dropped(self) -> int:
        return int(self._lib.dstpu_frame_queue_dropped(self._h))

    def close(self) -> None:
        self._lib.dstpu_frame_queue_close(self._h)


def monotonic_ms() -> int:
    lib = _load()
    if lib is None:
        import time

        return time.monotonic_ns() // 1_000_000
    return int(lib.dstpu_monotonic_ms())
