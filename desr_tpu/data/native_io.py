"""ctypes bindings for the native C++ data-IO fast path (native/dataio.cpp).

Builds the shared library lazily on first use (g++ must be available) and
falls back to PIL/cv2 transparently if the build or decode fails, so the
framework never hard-depends on the native path. Interface:

- ``decode_png(path)`` -> numpy array (uint16, HxW or HxWxC; 8-bit sources
  come back with values 0..255 in uint16)
- ``load_depth_normalized(path, max_mm)`` -> float32 [-1, 1] HxW
- ``load_image_normalized(path)`` -> float32 [-1, 1] HxWx3
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdesr_dataio.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.decode_png_info.argtypes = [ctypes.c_char_p] + [ctypes.POINTER(ctypes.c_int)] * 4
            lib.decode_png_info.restype = ctypes.c_int
            lib.decode_png.argtypes = [ctypes.c_char_p,
                                       np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS"),
                                       ctypes.c_int]
            lib.decode_png.restype = ctypes.c_int
            lib.depth_to_norm.argtypes = [
                np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                ctypes.c_int64, ctypes.c_float]
            lib.image_to_norm.argtypes = [
                np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS"),
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                ctypes.c_int64]
            lib.resize_area_f32.argtypes = [
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
                ctypes.c_int, ctypes.c_int]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def decode_png(path):
    """Decode a PNG via the native lib; returns uint16 array or None on failure."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    bd = ctypes.c_int()
    if lib.decode_png_info(str(path).encode(), ctypes.byref(w), ctypes.byref(h),
                           ctypes.byref(c), ctypes.byref(bd)) != 0:
        return None
    out = np.empty(h.value * w.value * c.value, dtype=np.uint16)
    if lib.decode_png(str(path).encode(), out, out.size) != 0:
        return None
    arr = out.reshape(h.value, w.value, c.value)
    return arr[:, :, 0] if c.value == 1 else arr


def load_depth_normalized(path, max_mm=5100.0):
    lib = _load()
    raw = decode_png(path)
    if raw is None:
        return None
    if raw.ndim == 3:
        raw = raw[..., 0]
    shape = raw.shape
    flat = np.ascontiguousarray(raw.reshape(-1))
    out = np.empty(flat.size, dtype=np.float32)
    lib.depth_to_norm(flat, out, flat.size, float(max_mm))
    return out.reshape(shape)


def load_image_normalized(path):
    lib = _load()
    raw = decode_png(path)
    if raw is None or raw.ndim != 3:
        return None
    raw3 = np.ascontiguousarray(raw[..., :3])
    flat = raw3.reshape(-1)
    out = np.empty(flat.size, dtype=np.float32)
    lib.image_to_norm(flat, out, flat.size)
    return out.reshape(raw3.shape)


def resize_area(img_f32, out_h, out_w):
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img_f32, dtype=np.float32)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w, c = img.shape
    out = np.empty((out_h, out_w, c), dtype=np.float32)
    lib.resize_area_f32(img.reshape(-1), h, w, c, out.reshape(-1), out_h, out_w)
    return out[..., 0] if squeeze else out
