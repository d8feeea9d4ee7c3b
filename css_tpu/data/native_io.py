"""ctypes binding for the native decode runtime (native/css_io.cpp).

Python threads + GIL-releasing C decode = true parallel decode without the
reference's DataLoader worker processes.  Falls back to PIL transparently
when the shared library hasn't been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

__all__ = ["native_available", "decode_jpeg_canvas", "decode_png_label_canvas",
           "decode_png_rgb_canvas"]

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                        "libcss_io.so")
    path = os.path.abspath(path)
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.css_decode_jpeg_canvas.restype = ctypes.c_int
    lib.css_decode_jpeg_canvas.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.css_decode_png_canvas.restype = ctypes.c_int
    lib.css_decode_png_canvas.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    if hasattr(lib, "css_decode_png_rgb_canvas"):
        lib.css_decode_png_rgb_canvas.restype = ctypes.c_int
        lib.css_decode_png_rgb_canvas.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _lib() is not None


def decode_jpeg_canvas(path: str, canvas: np.ndarray) -> Optional[Tuple[int, int]]:
    """Decode JPEG into a pre-filled uint8 [H, W, 3] canvas (in place).
    Returns (h, w) or None if native decode is unavailable/failed."""
    lib = _lib()
    if lib is None:
        return None
    assert canvas.dtype == np.uint8 and canvas.flags["C_CONTIGUOUS"]
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.css_decode_jpeg_canvas(
        path.encode(), canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        canvas.shape[0], canvas.shape[1], ctypes.byref(h), ctypes.byref(w),
    )
    return (h.value, w.value) if rc == 0 else None


def decode_png_rgb_canvas(path: str, canvas: np.ndarray) -> Optional[Tuple[int, int]]:
    """Decode an RGB PNG image into a pre-filled uint8 [H, W, 3] canvas
    (in place) — the Cityscapes leftImg8bit path.  Returns (h, w) or None."""
    lib = _lib()
    if lib is None or not hasattr(lib, "css_decode_png_rgb_canvas"):
        return None
    assert canvas.dtype == np.uint8 and canvas.flags["C_CONTIGUOUS"]
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.css_decode_png_rgb_canvas(
        path.encode(), canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        canvas.shape[0], canvas.shape[1], ctypes.byref(h), ctypes.byref(w),
    )
    return (h.value, w.value) if rc == 0 else None


def decode_png_label_canvas(path: str, canvas: np.ndarray) -> Optional[Tuple[int, int]]:
    """Decode a label PNG into a pre-filled int32 [H, W] canvas (in place)."""
    lib = _lib()
    if lib is None:
        return None
    assert canvas.dtype == np.int32 and canvas.flags["C_CONTIGUOUS"]
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.css_decode_png_canvas(
        path.encode(), canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        canvas.shape[0], canvas.shape[1], ctypes.byref(h), ctypes.byref(w),
    )
    return (h.value, w.value) if rc == 0 else None
