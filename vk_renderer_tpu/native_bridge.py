"""ctypes bridge to the native C++ runtime (native/libtexops.so).

Builds the library on first use if the toolchain is available; every entry
point has a NumPy fallback with identical outputs (tests assert parity),
so the package works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtexops.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("VKR_NO_NATIVE"):
        return None
    try:
        if not os.path.exists(_LIB_PATH) or (
                os.path.getmtime(_LIB_PATH)
                < os.path.getmtime(os.path.join(_NATIVE_DIR, "texops.cpp"))):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.decode_rgba8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int]
        lib.blit_resize_bilinear.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]
        lib.generate_mips.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int]
        lib.generate_mips.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def decode_rgba8(rgba_u8: np.ndarray, srgb: bool) -> np.ndarray | None:
    """u8[H, W, 4] -> f32[H, W, 4] (sRGB decode on RGB when requested)."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(rgba_u8, dtype=np.uint8)
    dst = np.empty(src.shape, dtype=np.float32)
    lib.decode_rgba8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        src.shape[0] * src.shape[1], int(srgb))
    return dst


def blit_resize_bilinear(img: np.ndarray, dst_w: int, dst_h: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(img, dtype=np.float32)
    h, w = src.shape[:2]
    dst = np.empty((dst_h, dst_w, 4), dtype=np.float32)
    lib.blit_resize_bilinear(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), w, h,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), dst_w, dst_h)
    return dst


def generate_mips(level0: np.ndarray) -> list[np.ndarray] | None:
    """f32[H, W, 4] -> list of mip levels (blit-chain semantics)."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(level0, dtype=np.float32)
    h, w = src.shape[:2]
    n_levels = int(np.floor(np.log2(max(w, h)))) + 1
    total = 0
    pw, ph = w, h
    sizes = []
    for _ in range(n_levels):
        sizes.append((pw, ph))
        total += pw * ph
        pw, ph = max(pw // 2, 1), max(ph // 2, 1)
    out = np.empty((total * 4,), dtype=np.float32)
    offsets = np.empty((n_levels,), dtype=np.int64)
    got = lib.generate_mips(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), w, h,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n_levels)
    mips = []
    for m in range(got):
        mw, mh = sizes[m]
        start = int(offsets[m]) * 4
        mips.append(out[start: start + mw * mh * 4].reshape(mh, mw, 4).copy())
    return mips
