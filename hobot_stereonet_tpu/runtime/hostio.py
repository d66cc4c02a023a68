"""ctypes bindings for the native host-IO runtime (native/hostio.cpp).

Builds ``libhostio.so`` on first use (g++ -O3; cached next to the source)
and exposes:

  * :class:`FrameRing` — lock-free SPSC frame ring buffer (the hbmem
    transport equivalent) for capture->feed pipelines;
  * :func:`nv12_split_sbs`, :func:`nv12_to_yuv444`, :func:`bgr_to_nv12` —
    native host colorspace/split ops.

Everything degrades gracefully: ``available()`` is False when no compiler
exists, and callers fall back to the numpy/jnp paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "hostio.cpp")
_LIB = os.path.join(_ROOT, "native", "libhostio.so")

_lib = None
_lock = threading.Lock()


def _build() -> Optional[str]:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120,
        )
        return _LIB
    except Exception:
        return None


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.ring_create.restype = ctypes.c_void_p
        lib.ring_create.argtypes = [ctypes.c_size_t, ctypes.c_size_t]
        lib.ring_destroy.argtypes = [ctypes.c_void_p]
        lib.ring_push.restype = ctypes.c_int
        lib.ring_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                  ctypes.c_double, ctypes.c_int64]
        lib.ring_pop.restype = ctypes.c_int
        lib.ring_pop.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                 ctypes.POINTER(ctypes.c_double),
                                 ctypes.POINTER(ctypes.c_int64)]
        lib.ring_size.restype = ctypes.c_size_t
        lib.ring_size.argtypes = [ctypes.c_void_p]
        lib.ring_dropped.restype = ctypes.c_uint64
        lib.ring_dropped.argtypes = [ctypes.c_void_p]
        for name in ("nv12_split_sbs", "nv12_to_yuv444", "bgr_to_nv12"):
            getattr(lib, name).restype = None
        lib.nv12_split_sbs.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                       ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.nv12_to_yuv444.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                       ctypes.c_int, ctypes.c_int]
        lib.bgr_to_nv12.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                    ctypes.c_int, ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _buf(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.c_char_p)


class FrameRing:
    """Lock-free SPSC ring of fixed-size frames (native storage)."""

    def __init__(self, frame_bytes: int, capacity: int = 8):
        lib = _load()
        if lib is None:
            raise RuntimeError("native hostio unavailable (no compiler?)")
        self._lib = lib
        self.frame_bytes = frame_bytes
        self.capacity = capacity
        self._handle = lib.ring_create(frame_bytes, capacity)

    def push(self, frame: np.ndarray, timestamp: float = 0.0, index: int = 0) -> bool:
        frame = np.ascontiguousarray(frame, dtype=np.uint8)
        assert frame.nbytes == self.frame_bytes
        return bool(self._lib.ring_push(self._handle, _buf(frame),
                                        float(timestamp), int(index)))

    def pop(self) -> Optional[Tuple[np.ndarray, float, int]]:
        out = np.empty(self.frame_bytes, np.uint8)
        ts = ctypes.c_double()
        idx = ctypes.c_int64()
        ok = self._lib.ring_pop(self._handle, _buf(out), ctypes.byref(ts),
                                ctypes.byref(idx))
        if not ok:
            return None
        return out, ts.value, idx.value

    def __len__(self) -> int:
        return int(self._lib.ring_size(self._handle))

    @property
    def dropped(self) -> int:
        return int(self._lib.ring_dropped(self._handle))

    def close(self):
        if self._handle:
            self._lib.ring_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def _require_lib():
    lib = _load()
    if lib is None:
        raise RuntimeError(
            "native hostio unavailable (no C++ compiler?) — use the jnp "
            "ops in hobot_stereonet_tpu.ops.colorspace instead"
        )
    return lib


def nv12_split_sbs(sbs: np.ndarray, height: int, full_width: int):
    lib = _require_lib()
    sbs = np.ascontiguousarray(sbs, np.uint8)
    half = full_width // 2
    n = height * half * 3 // 2
    left = np.empty(n, np.uint8)
    right = np.empty(n, np.uint8)
    lib.nv12_split_sbs(_buf(sbs), _buf(left), _buf(right), height, full_width)
    return left, right


def nv12_to_yuv444(nv12: np.ndarray, height: int, width: int) -> np.ndarray:
    lib = _require_lib()
    nv12 = np.ascontiguousarray(nv12, np.uint8)
    out = np.empty((height, width, 3), np.uint8)
    lib.nv12_to_yuv444(_buf(nv12), _buf(out), height, width)
    return out


def bgr_to_nv12(bgr: np.ndarray) -> np.ndarray:
    lib = _require_lib()
    bgr = np.ascontiguousarray(bgr, np.uint8)
    h, w = bgr.shape[:2]
    out = np.empty(h * w * 3 // 2, np.uint8)
    lib.bgr_to_nv12(_buf(bgr), _buf(out), h, w)
    return out
