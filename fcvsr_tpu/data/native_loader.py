"""ctypes bindings for the native C++ PNG loader (native/loader.cpp).

The native path replaces per-frame PIL decoding on the hot dataset-ingest
path (the reference preloads whole datasets of PNGs at startup,
data_LD_LR.py:43-75) with a threaded C++ decoder.  Falls back to PIL
transparently if the shared library is missing and cannot be built.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libfcvsr_loader.so")

_lib = None
_load_failed = False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            _load_failed = True
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        _load_failed = True
        return None
    lib.fcvsr_png_info.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_int)] * 1 + [
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.fcvsr_png_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.fcvsr_png_info.restype = ctypes.c_int
    lib.fcvsr_png_decode.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.fcvsr_png_decode.restype = ctypes.c_int
    lib.fcvsr_png_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int]
    lib.fcvsr_png_decode_batch.restype = ctypes.c_int
    lib.fcvsr_u8_to_f32.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def load_image_native(path: str, grayscale: bool = False) -> np.ndarray:
    """Decode one PNG -> uint8 (H, W, C); PIL fallback on failure."""
    lib = _get_lib()
    if lib is not None:
        w = ctypes.c_int()
        h = ctypes.c_int()
        c = ctypes.c_int()
        if lib.fcvsr_png_info(path.encode(), ctypes.byref(w), ctypes.byref(h),
                              ctypes.byref(c)) == 0:
            oc = 1 if grayscale else 3
            out = np.empty((h.value, w.value, oc), np.uint8)
            rc = lib.fcvsr_png_decode(
                path.encode(),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), oc,
                ctypes.byref(w), ctypes.byref(h))
            if rc == 0:
                return out
    from .datasets import load_image

    return load_image(path, grayscale)


def load_batch_native(paths: List[str], height: int, width: int,
                      grayscale: bool = False,
                      num_threads: int = 8) -> np.ndarray:
    """Threaded decode of equally-sized PNGs -> uint8 (N, H, W, C)."""
    lib = _get_lib()
    oc = 1 if grayscale else 3
    if lib is None:
        return np.stack([load_image_native(p, grayscale) for p in paths])
    n = len(paths)
    out = np.empty((n, height, width, oc), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.fcvsr_png_decode_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), oc,
        height, width, num_threads)
    if rc != 0:
        return np.stack([load_image_native(p, grayscale) for p in paths])
    return out


def u8_to_f32_native(arr: np.ndarray) -> np.ndarray:
    """uint8 -> float32/255 through the native kernel (PIL-free fast path)."""
    lib = _get_lib()
    flat = np.ascontiguousarray(arr, np.uint8)
    if lib is None:
        return flat.astype(np.float32) / 255.0
    out = np.empty(flat.shape, np.float32)
    lib.fcvsr_u8_to_f32(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), flat.size)
    return out
