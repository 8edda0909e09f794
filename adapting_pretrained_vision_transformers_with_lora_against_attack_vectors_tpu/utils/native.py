"""ctypes binding for the C++ host-side image-ops library (``native/``).

The compute path is JAX/XLA/Pallas; this native layer serves the *host*
data path — batched resize/crop/normalize in C++ threads (the role OpenCV's
C++ plays under the reference's Python, SURVEY.md §2 "native-adjacent").

Loading order: prebuilt ``libapvt_native.so`` next to ``native/`` → build it
on first use with ``make`` (g++ is in the image) → graceful ``None`` so
callers fall back to PIL. Set ``APVT_NATIVE=0`` to disable entirely.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def _configure(lib: ctypes.CDLL) -> ctypes.CDLL:
    u8 = ctypes.POINTER(ctypes.c_uint8)
    f32 = ctypes.POINTER(ctypes.c_float)
    i = ctypes.c_int
    lib.apvt_resize_center_crop.argtypes = [u8, i, i, i, i, u8]
    lib.apvt_batch_resize_center_crop.argtypes = [u8, i, i, i, i, i, u8, i]
    lib.apvt_resize_with_padding.argtypes = [u8, i, i, i, u8]
    lib.apvt_batch_u8_to_f32_normalize.argtypes = [u8, i, i, i, f32, f32, f32, i]
    ip = ctypes.POINTER(ctypes.c_int)
    lib.apvt_png_info.argtypes = [u8, ctypes.c_long, ip, ip]
    lib.apvt_png_info.restype = i
    lib.apvt_png_decode_rgb.argtypes = [u8, ctypes.c_long, u8]
    lib.apvt_png_decode_rgb.restype = i
    lib.apvt_png_decode_resize_center_crop.argtypes = [u8, ctypes.c_long, i, i, u8]
    lib.apvt_png_decode_resize_center_crop.restype = i
    lib.apvt_png_encode_rgb.argtypes = [u8, i, i, i, u8, ctypes.c_long]
    lib.apvt_png_encode_rgb.restype = ctypes.c_long
    lib.apvt_png_encode_bound.argtypes = [i, i]
    lib.apvt_png_encode_bound.restype = ctypes.c_long
    return lib


# Upper bound on PNG dimensions the native decoders will allocate for: a
# corrupt-but-well-formed IHDR can claim 2^30 x 2^30 and the blind
# np.empty/C++ resize would OOM (or std::terminate through the extern "C"
# boundary). Anything larger falls back to PIL, which validates properly.
_MAX_PNG_DIM = 16384


def load(*, build: bool = True) -> Optional[ctypes.CDLL]:
    """The library handle, building it on first use; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None:
        # lock-free fast path: _LIB is assigned exactly once under _LOCK and
        # never reset — the 8 decode threads must not convoy on the lock for
        # every image
        return _LIB
    if os.environ.get("APVT_NATIVE", "1") == "0":
        return None
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        d = _native_dir()
        so = os.path.join(d, "libapvt_native.so")
        try:
            if not os.path.exists(so) and build and os.path.isdir(d):
                subprocess.run(["make", "-C", d], check=True,
                               capture_output=True, timeout=120)
            if os.path.exists(so):
                _LIB = _configure(ctypes.CDLL(so))
        except (OSError, subprocess.SubprocessError):
            _LIB = None
        return _LIB


def available() -> bool:
    return load() is not None


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def resize_center_crop(img: np.ndarray, resize: int, crop: int) -> np.ndarray:
    """(H, W, 3) uint8 -> (crop, crop, 3): shorter-side bilinear resize +
    center crop (torchvision eval-pipeline geometry)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    if crop > resize:
        # the C++ kernel computes only min(crop, new_w) columns; a larger
        # crop would leave uninitialized bytes in the np.empty output
        raise ValueError(f"crop ({crop}) must be <= resize ({resize})")
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((crop, crop, 3), np.uint8)
    lib.apvt_resize_center_crop(_u8ptr(img), img.shape[0], img.shape[1],
                                resize, crop, _u8ptr(out))
    return out


def batch_resize_center_crop(imgs: np.ndarray, resize: int, crop: int,
                             *, max_threads: int = 8) -> np.ndarray:
    """(N, H, W, 3) uint8 -> (N, crop, crop, 3), thread-pooled."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    if crop > resize:
        raise ValueError(f"crop ({crop}) must be <= resize ({resize})")
    imgs = np.ascontiguousarray(imgs, np.uint8)
    n, h, w, _ = imgs.shape
    out = np.empty((n, crop, crop, 3), np.uint8)
    lib.apvt_batch_resize_center_crop(_u8ptr(imgs), n, h, w, resize, crop,
                                      _u8ptr(out), max_threads)
    return out


def resize_with_padding(img: np.ndarray, size: int) -> np.ndarray:
    """(H, W, 3) uint8 -> (size, size, 3): aspect-preserving + centered zero
    pad (the ETL geometry, Process.py:13-26)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((size, size, 3), np.uint8)
    lib.apvt_resize_with_padding(_u8ptr(img), img.shape[0], img.shape[1],
                                 size, _u8ptr(out))
    return out


def decode_png_rgb(data: bytes) -> Optional[np.ndarray]:
    """PNG bytes -> (H, W, 3) uint8 RGB via the native decoder (libdeflate
    inflate + C++ unfilter; PIL convert("RGB") alpha/palette semantics).
    None when the file needs PIL (16-bit, interlaced, sub-byte palette)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    buf = np.frombuffer(data, np.uint8)
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.apvt_png_info(_u8ptr(buf), len(data), ctypes.byref(h),
                         ctypes.byref(w)) != 0:
        return None
    if h.value > _MAX_PNG_DIM or w.value > _MAX_PNG_DIM:
        return None  # untrusted IHDR claims absurd dims -> PIL validates
    out = np.empty((h.value, w.value, 3), np.uint8)
    if lib.apvt_png_decode_rgb(_u8ptr(buf), len(data), _u8ptr(out)) != 0:
        return None
    return out


def decode_png_resize_center_crop(data: bytes, resize: int,
                                  crop: int) -> Optional[np.ndarray]:
    """The loader hot path in one native call: PNG bytes -> shorter-side
    resize + center crop -> (crop, crop, 3) uint8. None -> caller falls
    back to PIL."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    if crop > resize:
        raise ValueError(f"crop ({crop}) must be <= resize ({resize})")
    buf = np.frombuffer(data, np.uint8)
    # gate the fused C++ decode on a header parse: its internal row buffer
    # is sized from the untrusted IHDR dims, and a bad_alloc would escape
    # the extern "C" boundary as std::terminate
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.apvt_png_info(_u8ptr(buf), len(data), ctypes.byref(h),
                         ctypes.byref(w)) != 0:
        return None
    if h.value > _MAX_PNG_DIM or w.value > _MAX_PNG_DIM:
        return None
    out = np.empty((crop, crop, 3), np.uint8)
    if lib.apvt_png_decode_resize_center_crop(
            _u8ptr(buf), len(data), resize, crop, _u8ptr(out)) != 0:
        return None
    return out


def encode_png_rgb(img: np.ndarray, *, level: int = 6) -> bytes:
    """(H, W, 3) uint8 -> PNG bytes (native encoder: fixed up-filter +
    libdeflate compression; pixel-lossless like any valid PNG encoding)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_png_rgb expects (H, W, 3)")
    cap = lib.apvt_png_encode_bound(h, w)
    out = np.empty(cap, np.uint8)
    n = lib.apvt_png_encode_rgb(_u8ptr(img), h, w, level, _u8ptr(out), cap)
    if n <= 0:
        raise RuntimeError("native PNG encode failed")
    return out[:n].tobytes()


def batch_normalize(imgs: np.ndarray, mean, std,
                    *, max_threads: int = 8) -> np.ndarray:
    """(N, H, W, 3) uint8 -> float32 ``(x/255 - mean)/std`` in C++ threads."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    imgs = np.ascontiguousarray(imgs, np.uint8)
    n, h, w, _ = imgs.shape
    mean_a = np.ascontiguousarray(mean, np.float32)
    std_a = np.ascontiguousarray(std, np.float32)
    out = np.empty((n, h, w, 3), np.float32)
    lib.apvt_batch_u8_to_f32_normalize(
        _u8ptr(imgs), n, h, w,
        mean_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_threads)
    return out
