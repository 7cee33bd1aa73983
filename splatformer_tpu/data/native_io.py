"""ctypes bindings for the native IO runtime (native/io.cc): threaded
PNG/JPEG decoding and COLMAP binary parsing. Falls back to PIL/numpy when the
shared library has not been built (`make -C native`)."""
from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                         "libsplatformer_io.so")
_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    path = os.path.abspath(_LIB_PATH)
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.sf_image_info.argtypes = [ctypes.c_char_p] + \
        [ctypes.POINTER(ctypes.c_int)] * 3
    lib.sf_image_info.restype = ctypes.c_int
    lib.sf_decode_image.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.sf_decode_image.restype = ctypes.c_int
    lib.sf_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.sf_decode_batch.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def image_info(path: str):
    lib = _load()
    if lib is None:
        from PIL import Image
        with Image.open(path) as im:
            return im.width, im.height, len(im.getbands())
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    if lib.sf_image_info(path.encode(), ctypes.byref(w), ctypes.byref(h),
                         ctypes.byref(c)) != 0:
        raise IOError(f"cannot decode {path}")
    return w.value, h.value, c.value


def decode_image(path: str) -> np.ndarray:
    """-> float32 (H, W, C) in [0, 1]."""
    lib = _load()
    if lib is None:
        from PIL import Image
        arr = np.asarray(Image.open(path), np.uint8).astype(np.float32) / 255.0
        if arr.ndim == 2:
            arr = np.repeat(arr[..., None], 3, axis=-1)
        return arr
    w, h, c = image_info(path)
    out = np.empty((h, w, c), np.float32)
    rc = lib.sf_decode_image(path.encode(),
                             out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                             w, h, c)
    if rc != 0:
        raise IOError(f"decode failed ({rc}) for {path}")
    return out


def decode_batch(paths: List[str]) -> np.ndarray:
    """Decode same-shaped images concurrently -> (N, H, W, C) float32."""
    lib = _load()
    if lib is None or not paths:
        return np.stack([decode_image(p) for p in paths])
    w, h, c = image_info(paths[0])
    out = np.empty((len(paths), h, w, c), np.float32)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    failures = lib.sf_decode_batch(
        arr, len(paths), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        w, h, c)
    if failures:
        raise IOError(f"{failures} images failed to decode")
    return out
