"""Evaluation metrics with reference-exact formulations:
Y-channel PSNR (test.py:212-235) and MATLAB-style SSIM
(utils/util.py:140-195)."""

from __future__ import annotations

import math

import numpy as np


def rgb_to_y(img: np.ndarray) -> np.ndarray:
    """BT.601 Y channel from RGB in [0,1] → [0,1]-ish, exactly as
    test.py:212-217: Y = ((R*65.481 + G*128.553 + B*24.966)/255 + 16)/255
    applied to [0,255]-scaled inputs. img: (..., 3) channel-last."""
    x = img * 255.0
    y = (x[..., 0] * 65.481 + x[..., 1] * 128.553 + x[..., 2] * 24.966) / 255.0 + 16.0
    return y / 255.0


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 1.0) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * math.log10(peak ** 2 / mse)


def psnr_255(img1: np.ndarray, img2: np.ndarray) -> float:
    """utils/util.py:140-151 (range [0,255])."""
    return psnr(img1, img2, peak=255.0)


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """cv2.getGaussianKernel(11, 1.5) outer product."""
    ax = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    k = np.exp(-(ax ** 2) / (2.0 * sigma ** 2))
    k /= k.sum()
    return np.outer(k, k)


def ssim_single(img1: np.ndarray, img2: np.ndarray) -> float:
    """MATLAB-style SSIM on a 2-D (or 2-D-per-channel averaged) image in
    [0, 255] (utils/util.py:154-174). Uses reflect-101 padding then valid
    crop, matching cv2.filter2D + [5:-5] cropping."""
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    C1 = (0.01 * 255) ** 2
    C2 = (0.03 * 255) ** 2
    window = _gaussian_window()

    def filt(x):
        # cv2.filter2D default BORDER_REFLECT_101; crop [5:-5] afterwards
        # means padding never influences the result.
        from scipy.signal import convolve2d

        return convolve2d(x, window, mode="valid")

    mu1 = filt(img1)
    mu2 = filt(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = filt(img1 ** 2) - mu1_sq
    s2 = filt(img2 ** 2) - mu2_sq
    s12 = filt(img1 * img2) - mu1_mu2
    m = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return float(m.mean())


def calculate_ssim(img1: np.ndarray, img2: np.ndarray) -> float:
    """utils/util.py:177-195 (NB the reference averages ssim(img1, img2)
    three times for 3-channel inputs — i.e. it computes the same value on
    the full array; we keep 2-D / per-channel-mean semantics)."""
    if img1.shape != img2.shape:
        raise ValueError("Input images must have the same dimensions.")
    if img1.ndim == 2:
        return ssim_single(img1, img2)
    if img1.ndim == 3:
        if img1.shape[2] == 1:
            return ssim_single(img1[..., 0], img2[..., 0])
        return float(np.mean([ssim_single(img1[..., i], img2[..., i])
                              for i in range(img1.shape[2])]))
    raise ValueError("Wrong input image dimensions.")


def eval_psnr_split(real: np.ndarray, fake: np.ndarray):
    """The test.py:223-235 per-batch PSNR split on Y-channel images of
    shape (n, H, W): returns (anchor, inter, center, weighted, per_frame)."""
    n = real.shape[0]
    mse = np.mean((real.astype(np.float64) - fake.astype(np.float64)) ** 2,
                  axis=tuple(range(1, real.ndim)))
    per = 10 * np.log10(1.0 / mse)
    p_anchor = float(per[0])
    p_inter = float(np.mean(per[1:-1])) if n > 2 else float(np.mean(per[1:]))
    p_center = float(per[len(per) // 2])
    p = (p_anchor + p_inter * (n - 2)) / (n - 1)
    return p_anchor, p_inter, p_center, float(p), per
