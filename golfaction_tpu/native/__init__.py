"""ctypes loader for the native host runtime (golfer_host.cpp).

Builds the shared library lazily with g++ on first use (cached next to the
source); every entry point has a NumPy fallback in pipeline/video_io.py, so
the framework works without a toolchain — the native path is a host-side
performance unlock, not a hard dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "golfer_host.cpp")
_LIB = os.path.join(_DIR, "libgolfer_host.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
        _SRC, "-o", _LIB,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.motion_boxes.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.motion_boxes.restype = None
        lib.bgr_to_rgb.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.bgr_to_rgb.restype = None
        lib.golfer_host_version.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def motion_boxes(
    frames: np.ndarray, min_size: float = 0.15, smooth: int = 9
) -> Optional[np.ndarray]:
    """Native motion-energy boxes; None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    T, H, W, C = frames.shape
    assert C == 3
    out = np.empty((T, 4), np.float32)
    lib.motion_boxes(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        T, H, W, ctypes.c_float(min_size), smooth,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def bgr_to_rgb(frames: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    out = np.empty_like(frames)
    lib.bgr_to_rgb(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        frames.size // 3,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out
