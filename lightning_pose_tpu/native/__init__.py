"""Native (C++) host frame ops with build-on-first-use + Python fallback.

Replaces the reference's dependency on DALI's native preprocessing
(reference lightning_pose/data/dali.py) with an in-tree, dependency-free
C++ library (``frame_ops.cpp``). The library is compiled with g++ on first
import and cached next to the source; if the toolchain is unavailable the
callers transparently fall back to OpenCV.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["get_lib", "batch_resize_rgb", "batch_rgb_to_i420", "available", "num_worker_threads"]

_LIB = None
_LIB_LOCK = threading.Lock()
_SRC = os.path.join(os.path.dirname(__file__), "frame_ops.cpp")
_SO = os.path.join(os.path.dirname(__file__), "libframeops.so")


def num_worker_threads() -> int:
    return max(1, (os.cpu_count() or 1) - 1)


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-pthread", _SRC, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        logger.warning(f"native frame-ops build failed ({e}); using cv2 fallback")
        return False


def get_lib():
    """Return the loaded shared library, building it if needed; None if
    unavailable."""
    global _LIB
    with _LIB_LOCK:
        if _LIB is not None:
            return _LIB if _LIB is not False else None
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _LIB = False
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.batch_resize_rgb.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
            ]
            lib.batch_crop_resize_rgb.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
            ]
            lib.batch_rgb_to_i420.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int,
            ]
            _LIB = lib
            return lib
        except OSError as e:
            logger.warning(f"could not load native frame-ops ({e})")
            _LIB = False
            return None


def available() -> bool:
    return get_lib() is not None


def batch_resize_rgb(
    frames: np.ndarray,
    dst_h: int,
    dst_w: int,
    swap_rb: bool = False,
    num_threads: int | None = None,
) -> np.ndarray:
    """Fused (BGR->)RGB conversion + bilinear resize over a frame batch.

    Args:
        frames: (N, H, W, 3) uint8 contiguous.
    Returns:
        (N, dst_h, dst_w, 3) uint8.
    """
    lib = get_lib()
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, src_h, src_w, _ = frames.shape
    if lib is None:
        import cv2

        out = np.empty((n, dst_h, dst_w, 3), dtype=np.uint8)
        for i in range(n):
            f = frames[i]
            if swap_rb:
                f = cv2.cvtColor(f, cv2.COLOR_BGR2RGB)
            out[i] = cv2.resize(f, (dst_w, dst_h), interpolation=cv2.INTER_LINEAR)
        return out

    out = np.empty((n, dst_h, dst_w, 3), dtype=np.uint8)
    lib.batch_resize_rgb(
        frames.ctypes.data, n, src_h, src_w,
        out.ctypes.data, dst_h, dst_w,
        1 if swap_rb else 0,
        num_threads or num_worker_threads(),
    )
    return out


def batch_rgb_to_i420(
    frames: np.ndarray, num_threads: int | None = None
) -> np.ndarray:
    """RGB (N, H, W, 3) uint8 -> planar I420 (N, H*3/2, W) uint8, BT.601
    video range with cv2's top-left-of-2x2 chroma subsampling. Falls back
    to per-frame cv2.cvtColor when the native library is unavailable."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w, _ = frames.shape
    assert h % 2 == 0 and w % 2 == 0, "I420 requires even dims"
    lib = get_lib()
    if lib is None:
        import cv2

        return np.stack(
            [cv2.cvtColor(f, cv2.COLOR_RGB2YUV_I420) for f in frames]
        )
    out = np.empty((n, h * 3 // 2, w), dtype=np.uint8)
    lib.batch_rgb_to_i420(
        frames.ctypes.data, n, h, w, out.ctypes.data,
        num_threads or num_worker_threads(),
    )
    return out
