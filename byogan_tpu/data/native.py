"""ctypes bridge to the native IO library (byogan_tpu/native/byogan_io.cpp).

Gracefully degrades: if the library can't be built (no toolchain), callers
fall back to the PIL path in data/pipeline.py.
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import List, Optional, Sequence

import numpy as np

_lib = None
_lib_lock = threading.Lock()
_UNAVAILABLE = object()


def load_library():
    """Load (building if needed) the native lib; None if unavailable."""
    global _lib
    with _lib_lock:
        if _lib is _UNAVAILABLE:
            return None
        if _lib is not None:
            return _lib
        try:
            from byogan_tpu.native.build import build

            lib = ctypes.CDLL(build(quiet=True))
            lib.byogan_decode.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            lib.byogan_decode.restype = ctypes.c_int
            lib.byogan_decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ]
            lib.byogan_decode_batch.restype = ctypes.c_int
            lib.byogan_normalize.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.byogan_normalize.restype = None
            lib.byogan_encode_png.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            lib.byogan_encode_png.restype = ctypes.c_int
            lib.byogan_encode_jpeg.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            lib.byogan_encode_jpeg.restype = ctypes.c_int
            assert lib.byogan_abi_version() == 2
            _lib = lib
            return lib
        except Exception:
            _lib = _UNAVAILABLE
            return None


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def decode_image(path: str) -> Optional[np.ndarray]:
    """Decode one PNG/JPEG to HWC RGB uint8; None if native unavailable."""
    lib = load_library()
    if lib is None:
        return None
    h, w = ctypes.c_int(), ctypes.c_int()
    # size probe (no output buffer)
    rc = lib.byogan_decode(path.encode(), None, ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise OSError(f"native decode failed ({rc}): {path}")
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.byogan_decode(
        path.encode(), _u8ptr(out), ctypes.byref(h), ctypes.byref(w)
    )
    if rc != 0:
        raise OSError(f"native decode failed ({rc}): {path}")
    return out


def decode_batch(
    paths: Sequence[str], h: int, w: int, threads: int = 4
) -> Optional[np.ndarray]:
    """Decode a batch to (N,h,w,3) uint8; None if native unavailable."""
    lib = load_library()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, h, w, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.byogan_decode_batch(arr, n, h, w, _u8ptr(out), threads)
    if rc != 0:
        raise OSError(f"native batch decode failed ({rc})")
    return out


def encode_png(path: str, image: np.ndarray, compression: int = 6) -> bool:
    """Write an HWC RGB uint8 PNG natively; False if lib unavailable."""
    lib = load_library()
    if lib is None:
        return False
    image = np.ascontiguousarray(image)
    assert image.dtype == np.uint8 and image.ndim == 3 and image.shape[2] == 3
    rc = lib.byogan_encode_png(
        path.encode(), _u8ptr(image), image.shape[0], image.shape[1], compression
    )
    if rc != 0:
        raise OSError(f"native png encode failed ({rc}): {path}")
    return True


def encode_jpeg(path: str, image: np.ndarray, quality: int = 92) -> bool:
    """Write an HWC RGB uint8 JPEG natively; False if lib unavailable."""
    lib = load_library()
    if lib is None:
        return False
    image = np.ascontiguousarray(image)
    assert image.dtype == np.uint8 and image.ndim == 3 and image.shape[2] == 3
    rc = lib.byogan_encode_jpeg(
        path.encode(), _u8ptr(image), image.shape[0], image.shape[1], quality
    )
    if rc != 0:
        raise OSError(f"native jpeg encode failed ({rc}): {path}")
    return True


def normalize_batch(
    batch_u8: np.ndarray, flips: np.ndarray
) -> Optional[np.ndarray]:
    """uint8 NHWC -> float32 [-1,1] with per-sample flips; None if no lib."""
    lib = load_library()
    if lib is None:
        return None
    n, h, w, c = batch_u8.shape
    assert c == 3
    batch_u8 = np.ascontiguousarray(batch_u8)
    out = np.empty((n, h, w, 3), np.float32)
    flips_u8 = np.ascontiguousarray(flips.astype(np.uint8))
    lib.byogan_normalize(
        _u8ptr(batch_u8), n, h, w, _u8ptr(flips_u8),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
