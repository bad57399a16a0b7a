"""ctypes bindings + on-demand build of the C++ batch-resize library.

Build is lazy and cached: first use compiles ``cc/batch_resize.cc`` with g++
into ``_build/libodtr_runtime.so`` next to this file; subsequent imports
dlopen the cached artifact (rebuilt when the source is newer).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

__all__ = ["batch_resize", "batch_decode_resize", "is_available", "load_library"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "cc", "batch_resize.cc")
_SRC_JPEG = os.path.join(_HERE, "cc", "jpeg_decode.cc")
_BUILD_DIR = os.path.join(_HERE, "_build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libodtr_runtime.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> None:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        _SRC, _SRC_JPEG, "-o", _LIB_PATH + ".tmp", "-ljpeg",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(_LIB_PATH + ".tmp", _LIB_PATH)


def load_library() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            src_mtime = max(os.path.getmtime(_SRC), os.path.getmtime(_SRC_JPEG))
            if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < src_mtime:
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.odtr_runtime_abi_version.restype = ctypes.c_int32
            assert lib.odtr_runtime_abi_version() == 1
            lib.odtr_batch_resize.argtypes = [
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32,
                ctypes.c_void_p,
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_int32,
            ]
            lib.odtr_batch_resize.restype = None
            lib.odtr_batch_decode_resize.argtypes = [
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int32,
                ctypes.c_void_p,
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.odtr_batch_decode_resize.restype = None
            _lib = lib
        except Exception:
            _load_failed = True
    return _lib


def is_available() -> bool:
    return load_library() is not None


def batch_resize(
    images: Sequence[np.ndarray],
    canvas: int,
    out: Optional[np.ndarray] = None,
    num_threads: int = 0,
) -> np.ndarray:
    """Resize a list of HWC uint8 images onto one (N, canvas, canvas, C) batch.

    Requires the native library (callers should check :func:`is_available`
    and fall back to cv2/PIL otherwise).
    """
    lib = load_library()
    if lib is None:
        raise RuntimeError("native runtime library unavailable")
    n = len(images)
    ch = images[0].shape[2] if images[0].ndim == 3 else 1
    if out is None:
        out = np.empty((n, canvas, canvas, ch), np.uint8)
    contiguous = [np.ascontiguousarray(im) for im in images]
    ptrs = (ctypes.c_void_p * n)(
        *[im.ctypes.data_as(ctypes.c_void_p).value for im in contiguous]
    )
    hs = (ctypes.c_int32 * n)(*[im.shape[0] for im in contiguous])
    ws = (ctypes.c_int32 * n)(*[im.shape[1] for im in contiguous])
    lib.odtr_batch_resize(
        ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)),
        hs,
        ws,
        n,
        out.ctypes.data_as(ctypes.c_void_p),
        canvas,
        ch,
        num_threads,
    )
    return out


def batch_decode_resize(
    jpeg_blobs: Sequence[bytes],
    canvas: int,
    out: Optional[np.ndarray] = None,
    num_threads: int = 0,
) -> np.ndarray:
    """Decode a list of JPEG byte blobs and resize onto one
    (N, canvas, canvas, 3) uint8 batch — fused, threaded, with libjpeg's
    DCT-domain downscale when the source is much larger than the canvas.

    Raises ValueError naming the first image whose decode failed.
    """
    lib = load_library()
    if lib is None:
        raise RuntimeError("native runtime library unavailable")
    n = len(jpeg_blobs)
    if out is None:
        out = np.empty((n, canvas, canvas, 3), np.uint8)
    bufs = [np.frombuffer(b, np.uint8) for b in jpeg_blobs]
    ptrs = (ctypes.c_void_p * n)(
        *[buf.ctypes.data_as(ctypes.c_void_p).value for buf in bufs]
    )
    lens = (ctypes.c_int64 * n)(*[len(b) for b in jpeg_blobs])
    status = (ctypes.c_int32 * n)()
    lib.odtr_batch_decode_resize(
        ctypes.cast(ptrs, ctypes.POINTER(ctypes.c_void_p)),
        lens,
        n,
        out.ctypes.data_as(ctypes.c_void_p),
        canvas,
        num_threads,
        status,
    )
    bad = [i for i in range(n) if status[i] != 0]
    if bad:
        raise ValueError(f"JPEG decode failed for image index {bad[0]} (of {len(bad)} failures)")
    return out
