"""Resampling ops as separable matrix multiplies (MXU-friendly).

All resizes used by the reference are separable with *static* shapes, so
instead of gather-based interpolation we precompute (out, in) interpolation
matrices on the host and apply them as two einsums — these run on the MXU
and fuse with neighbouring ops under XLA.

Parity targets:
 * torch.nn.functional.interpolate(mode='bilinear', align_corners=False)
   — used throughout the reference hot path (e.g. Ours.py:540,548,595).
 * torch interpolate bilinear align_corners=True (RAFT upflow8,
   models/core/utils/utils.py:80-83).
 * MATLAB-equivalent antialiased bicubic imresize (reference
   data/util.py:261-392) — used for LR generation in the arbitrary-scale
   collate fns (data/__init__.py:113,192); PSNR parity depends on it.
 * torch.nn.functional.avg_pool2d(2, stride=2) — RAFT corr pyramids.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# torch bilinear interpolate
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def resize_matrix_linear(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) matrix reproducing torch 1-D linear interpolation."""
    m = np.zeros((out_size, in_size), dtype=np.float64)
    if out_size == in_size:
        np.fill_diagonal(m, 1.0)
        return m
    for i in range(out_size):
        if align_corners:
            src = i * (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        else:
            src = (i + 0.5) * in_size / out_size - 0.5
            if src < 0:
                src = 0.0  # torch clamps the source index at 0
        x0 = int(math.floor(src))
        x0 = min(x0, in_size - 1)
        x1 = min(x0 + 1, in_size - 1)
        lam = src - x0
        m[i, x0] += 1.0 - lam
        m[i, x1] += lam
    return m


def _apply_separable(img: jax.Array, mh: np.ndarray, mw: np.ndarray) -> jax.Array:
    """Apply (OH, H) and (OW, W) matrices to an NHWC image.

    precision=HIGHEST: resize feeds PSNR-sensitive paths; the default bf16
    MXU passes introduce ~1e-2 errors on image values (observed on v5e),
    and these matmuls are tiny relative to the conv trunk.
    """
    mh_j = jnp.asarray(mh, dtype=img.dtype)
    mw_j = jnp.asarray(mw, dtype=img.dtype)
    out = jnp.einsum("oh,bhwc->bowc", mh_j, img, precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("ow,bhwc->bhoc", mw_j, out, precision=jax.lax.Precision.HIGHEST)
    return out


def interpolate_bilinear(img: jax.Array, out_hw, align_corners: bool = False) -> jax.Array:
    """torch F.interpolate(..., mode='bilinear') parity for NHWC images."""
    B, H, W, C = img.shape
    OH, OW = int(out_hw[0]), int(out_hw[1])
    if (OH, OW) == (H, W):
        return img
    return _apply_separable(
        img,
        resize_matrix_linear(H, OH, align_corners),
        resize_matrix_linear(W, OW, align_corners),
    )


# ---------------------------------------------------------------------------
# MATLAB antialiased bicubic (imresize) — reference data/util.py:261-392
# ---------------------------------------------------------------------------

def _cubic(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    return ((1.5 * ax3 - 2.5 * ax2 + 1.0) * (ax <= 1)
            + (-0.5 * ax3 + 2.5 * ax2 - 4.0 * ax + 2.0) * ((ax > 1) & (ax <= 2)))


@functools.lru_cache(maxsize=None)
def matlab_resize_matrix(in_size: int, out_size: int, scale: float,
                         antialiasing: bool = True) -> np.ndarray:
    """(out_size, in_size) MATLAB bicubic matrix with symmetric padding.

    Reproduces calculate_weights_indices + the symmetric edge copying of
    the reference imresize_np, folded into a single dense matrix.
    """
    kernel_width = 4.0
    if scale < 1 and antialiasing:
        kernel_width = kernel_width / scale
    x = np.arange(1, out_size + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1 - 1 / scale)
    left = np.floor(u - kernel_width / 2)
    P = int(math.ceil(kernel_width)) + 2
    indices = left[:, None] + np.arange(P)[None, :]  # 1-based-ish positions
    dist = u[:, None] - indices
    if scale < 1 and antialiasing:
        weights = scale * _cubic(dist * scale)
    else:
        weights = _cubic(dist)
    weights = weights / np.sum(weights, axis=1, keepdims=True)
    # trim all-zero first/last columns (same rule as the reference)
    zero_cols = np.sum(weights == 0, axis=0)
    if not math.isclose(zero_cols[0], 0, rel_tol=1e-6):
        indices = indices[:, 1:P - 1]
        weights = weights[:, 1:P - 1]
    elif not math.isclose(zero_cols[-1], 0, rel_tol=1e-6):
        indices = indices[:, 0:P - 2]
        weights = weights[:, 0:P - 2]

    m = np.zeros((out_size, in_size), dtype=np.float64)
    # indices are 1-based input positions possibly out of range; fold the
    # symmetric (mirror-with-edge) padding into the source index.
    idx0 = indices.astype(np.int64) - 1  # 0-based
    for i in range(out_size):
        for k in range(indices.shape[1]):
            j = idx0[i, k]
            if j < 0:
                j = -1 - j
            if j >= in_size:
                j = in_size - 1 - (j - in_size)
            j = min(max(j, 0), in_size - 1)
            m[i, j] += weights[i, k]
    return m  # float64; _apply_separable casts to the image dtype


def imresize_matlab(img: jax.Array, scale: float, antialiasing: bool = True) -> jax.Array:
    """MATLAB-equivalent imresize for NHWC images (out = ceil(in * scale))."""
    B, H, W, C = img.shape
    OH, OW = int(math.ceil(H * scale)), int(math.ceil(W * scale))
    return _apply_separable(
        img,
        matlab_resize_matrix(H, OH, scale, antialiasing),
        matlab_resize_matrix(W, OW, scale, antialiasing),
    )


def imresize_matlab_np(img: np.ndarray, scale: float, antialiasing: bool = True) -> np.ndarray:
    """Host-side (numpy) MATLAB imresize for HWC images — data-pipeline use."""
    H, W = img.shape[:2]
    OH, OW = int(math.ceil(H * scale)), int(math.ceil(W * scale))
    mh = matlab_resize_matrix(H, OH, scale, antialiasing)
    mw = matlab_resize_matrix(W, OW, scale, antialiasing)
    out = np.tensordot(mh, img.astype(np.float32), axes=(1, 0))       # (OH, W, C)
    out = np.moveaxis(np.tensordot(mw, out, axes=(1, 1)), 0, 1)       # (OH, OW, C)
    return out


# ---------------------------------------------------------------------------
# avg pool (RAFT correlation pyramids)
# ---------------------------------------------------------------------------

def avg_pool2d(x: jax.Array, window: int = 2, stride: int = 2) -> jax.Array:
    """torch F.avg_pool2d parity for NHWC (floor output size, no padding)."""
    B, H, W, C = x.shape
    OH = (H - window) // stride + 1
    OW = (W - window) // stride + 1
    x = x[:, : OH * stride + (window - stride), : OW * stride + (window - stride), :]
    if window == stride:
        out = x[:, : OH * window, : OW * window, :].reshape(B, OH, window, OW, window, C)
        return out.mean(axis=(2, 4))
    out = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )
    return out / float(window * window)
