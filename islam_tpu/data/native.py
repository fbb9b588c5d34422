"""ctypes binding for the native preprocessing library (native/preproc.cpp).

Builds libpreproc.so on first use (cached); every entry point has a numpy
fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libpreproc.so"))
    if not os.path.isfile(so):
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
        lib.preproc_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
        lib.resize_bilinear_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def preproc_batch(images: np.ndarray, crop_hw: Tuple[int, int],
                  mean, std, num_threads: int = 4,
                  want_norm: bool = True):
    """Fused center-crop + /255 (+ normalize) for a uint8 NHWC batch.

    Returns (raw, norm) float32 NHWC arrays (norm is None if not requested).
    Falls back to numpy when the native library is unavailable.
    """
    images = np.ascontiguousarray(images, dtype=np.uint8)
    n, sh, sw, c = images.shape
    assert c == 3
    th, tw = crop_hw
    lib = _load()
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)

    if lib is not None:
        raw = np.empty((n, th, tw, 3), np.float32)
        norm = np.empty((n, th, tw, 3), np.float32) if want_norm else None
        lib.preproc_batch(
            images.ctypes.data, n, sh, sw, th, tw,
            mean.ctypes.data, std.ctypes.data,
            raw.ctypes.data,
            norm.ctypes.data if norm is not None else None,
            num_threads)
        return raw, norm

    # numpy fallback (reference semantics, Datasets/utils.py:88-101,206-228)
    y0 = (sh - th) // 2
    x0 = (sw - tw) // 2
    crop = images[:, y0:y0 + th, x0:x0 + tw].astype(np.float32) / 255.0
    norm = ((crop - mean) / std).astype(np.float32) if want_norm else None
    return crop, norm
