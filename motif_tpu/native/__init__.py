"""Native (C++) host-runtime bindings via ctypes.

Builds motif_tpu/native/preprocess.cpp on first use (g++ -O3 -fopenmp) and
exposes: matlab_resize_batch, u8bgr_to_f32rgb, y_psnr_batch. Falls back to
numpy implementations when no toolchain is available (`available()` tells).
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "preprocess.cpp")
_SO = os.path.join(_HERE, f"_preprocess_{sys.implementation.cache_tag}.so")

_lib = None
_tried = False


def _build() -> str | None:
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-fopenmp",
           _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _SO
    except (subprocess.CalledProcessError, FileNotFoundError):
        # retry without OpenMP
        try:
            subprocess.run(["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
                            _SRC, "-o", _SO], check=True, capture_output=True)
            return _SO
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    so = _SO if os.path.exists(_SO) and \
        os.path.getmtime(_SO) > os.path.getmtime(_SRC) else _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.matlab_resize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_double, ctypes.c_int]
    lib.u8bgr_to_f32rgb.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64]
    lib.y_psnr_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.c_int64, ctypes.POINTER(ctypes.c_double)]
    lib.native_num_threads.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def matlab_resize_batch(imgs: np.ndarray, scale: float,
                        antialias: bool = True) -> np.ndarray:
    """(N, H, W, C) float32 → (N, ceil(H*s), ceil(W*s), C), MATLAB bicubic.
    Native when available; numpy (ops/resize matrices) otherwise."""
    imgs = np.ascontiguousarray(imgs, np.float32)
    n, h, w, c = imgs.shape
    oh, ow = math.ceil(h * scale), math.ceil(w * scale)
    lib = _load()
    if lib is None:
        from motif_tpu.ops.resize import imresize_matlab_np

        return np.stack([imresize_matlab_np(im, scale, antialias) for im in imgs], 0)
    out = np.empty((n, oh, ow, c), np.float32)
    lib.matlab_resize_batch(_fptr(imgs), _fptr(out), n, h, w, c, oh, ow,
                            float(scale), int(antialias))
    return out


def u8bgr_to_f32rgb(img: np.ndarray) -> np.ndarray:
    """(..., 3) uint8 BGR → float32 RGB [0,1]."""
    img = np.ascontiguousarray(img, np.uint8)
    lib = _load()
    if lib is None:
        return img[..., ::-1].astype(np.float32) / 255.0
    out = np.empty(img.shape, np.float32)
    lib.u8bgr_to_f32rgb(img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                        _fptr(out), img.size // 3)
    return out


def y_psnr_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N, H, W, 3) RGB [0,1] pairs → (N,) Y-channel PSNRs."""
    a = np.ascontiguousarray(a, np.float32)
    b = np.ascontiguousarray(b, np.float32)
    n = a.shape[0]
    hw = int(np.prod(a.shape[1:-1]))
    lib = _load()
    if lib is None:
        from motif_tpu.utils.metrics import rgb_to_y

        ya, yb = rgb_to_y(a), rgb_to_y(b)
        mse = np.mean((ya - yb) ** 2, axis=tuple(range(1, ya.ndim)))
        return 10 * np.log10(1.0 / mse)
    out = np.empty(n, np.float64)
    lib.y_psnr_batch(_fptr(a), _fptr(b), n, hw,
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out
