"""ctypes bindings for the native host-ops library (native/margipose_host_ops.cpp).

The library fuses the per-example host transform (affine warp + colour
jitter + normalisation) into one C++ pass, replacing PIL's multi-pass
pipeline in loader workers. All entry points degrade gracefully: if the
shared library is missing it is built with g++ on first use, and if that
fails ``available()`` returns False and callers fall back to PIL
(margipose_tpu/geometry/transforms.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from os import path

import numpy as np

_REPO = path.dirname(path.dirname(path.abspath(__file__)))
_SRC = path.join(_REPO, "native", "margipose_host_ops.cpp")
_LIB = path.join(_REPO, "native", "libmargipose_host_ops.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    # Build to a unique temp path and os.replace() into place: forked loader
    # workers (and run.sh / Dockerfile builds) may race on the same output
    # file, and CDLL-ing a half-written .so crashes the process instead of
    # falling back to PIL. rename is atomic within the directory.
    tmp = f"{_LIB}.build.{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", tmp, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, _LIB)
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("MARGIPOSE_DISABLE_NATIVE"):
            return None
        stale = (not path.isfile(_LIB)
                 or (path.isfile(_SRC)
                     and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)))
        if stale and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        c_int, c_float = ctypes.c_int, ctypes.c_float
        lib.mp_warp_rgb_u8.argtypes = [u8p, c_int, c_int, f32p, u8p, c_int, c_int]
        lib.mp_warp_rgb_u8.restype = c_int
        lib.mp_warp_colour_norm.argtypes = [
            u8p, c_int, c_int, f32p, c_float, c_float, c_float, c_float,
            ctypes.c_void_p, ctypes.c_void_p, f32p, c_int, c_int,
        ]
        lib.mp_warp_colour_norm.restype = c_int
        lib.mp_composite_u8.argtypes = [u8p, u8p, u8p, u8p, c_int, c_int]
        lib.mp_composite_u8.restype = c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _inv_coeffs(affine: np.ndarray) -> np.ndarray:
    """output<-input 3x3 affine -> PIL-order input<-output 6 coeffs."""
    inv = np.linalg.inv(np.asarray(affine, np.float64))
    return np.ascontiguousarray(inv[:2].reshape(-1), np.float32)


def warp_rgb(image: np.ndarray, affine: np.ndarray, out_size) -> np.ndarray:
    """Warp an HWC uint8 RGB array with an output<-input affine.
    ``out_size`` is (width, height) like PIL.

    This is the numeric-contract surface for the shared C++ bilinear
    sampler: tests/test_native.py pins it against PIL, and the production
    ``warp_colour_norm`` fuses the same sampler with colour/normalise."""
    lib = _load()
    assert lib is not None
    ow, oh = out_size
    src = np.ascontiguousarray(image, np.uint8)
    dst = np.empty((oh, ow, 3), np.uint8)
    rc = lib.mp_warp_rgb_u8(src, src.shape[0], src.shape[1],
                            _inv_coeffs(affine), dst, oh, ow)
    assert rc == 0
    return dst


def warp_colour_norm(image: np.ndarray, affine: np.ndarray, out_size,
                     brightness=1.0, contrast=1.0, saturation=1.0, hue=0.0,
                     mean=None, std=None) -> np.ndarray:
    """Fused warp + colour jitter (+ normalise) to float32 HWC."""
    lib = _load()
    assert lib is not None
    ow, oh = out_size
    src = np.ascontiguousarray(image, np.uint8)
    dst = np.empty((oh, ow, 3), np.float32)
    if mean is not None:
        mean = np.ascontiguousarray(mean, np.float32)
        std = np.ascontiguousarray(std, np.float32)
        mean_p = mean.ctypes.data_as(ctypes.c_void_p)
        std_p = std.ctypes.data_as(ctypes.c_void_p)
    else:
        mean_p = std_p = None
    rc = lib.mp_warp_colour_norm(
        src, src.shape[0], src.shape[1], _inv_coeffs(affine),
        float(brightness), float(contrast), float(saturation), float(hue),
        mean_p, std_p, dst, oh, ow)
    assert rc == 0
    return dst


def composite(fg: np.ndarray, bg: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """PIL Image.composite(fg, bg, mask) for HWC uint8 RGB + L-mode mask."""
    lib = _load()
    assert lib is not None
    fg = np.ascontiguousarray(fg, np.uint8)
    bg = np.ascontiguousarray(bg, np.uint8)
    mask = np.ascontiguousarray(mask, np.uint8)
    dst = np.empty_like(fg)
    rc = lib.mp_composite_u8(fg, bg, mask, dst, fg.shape[0], fg.shape[1])
    assert rc == 0
    return dst
