"""Training losses (reference models/modules/loss.py +
VideoSR_base_model.py:48-59,127-158)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def charbonnier(x: jax.Array, y: jax.Array, eps: float = 1e-6) -> jax.Array:
    """CharbonnierLoss (loss.py:7-17): sum(sqrt(diff^2 + eps)) — note the
    reference adds eps (not eps^2) inside the sqrt, sum-reduced."""
    diff = x - y
    return jnp.sum(jnp.sqrt(diff * diff + eps))


def l1_sum(x, y):
    return jnp.sum(jnp.abs(x - y))


def l2_sum(x, y):
    return jnp.sum((x - y) ** 2)


def _gauss_kernel5(sigma: float = 2.0) -> jax.Array:
    """LapLoss gaussian (loss.py:19-33). NB the reference's `gaussian`
    lambda squares exp((x-c)^2 / (-2 s^2)) and sums the two coordinate
    kernels (a quirk we reproduce): k = sum_axis exp(...)^2, normalized."""
    import numpy as np

    size = 5
    grid = np.float32(np.mgrid[0:size, 0:size].T)
    gaussian = lambda x: np.exp((x - size // 2) ** 2 / (-2 * sigma ** 2)) ** 2
    kernel = np.sum(gaussian(grid), axis=2)
    kernel /= np.sum(kernel)
    return jnp.asarray(kernel, jnp.float32)


def lap_loss(x: jax.Array, y: jax.Array, max_levels: int = 5) -> jax.Array:
    """LapLoss (loss.py:56-77): L1 across laplacian pyramid levels.
    x, y: (..., H, W, C) NHWC; leading dims flattened."""
    k = _gauss_kernel5()
    kern = k[:, :, None, None]

    def blur(img):
        C = img.shape[-1]
        kc = jnp.tile(kern, (1, 1, 1, C))
        pad = 2
        img_p = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
        return jax.lax.conv_general_dilated(
            img_p, kc, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)

    def pool(img):
        B, H, W, C = img.shape
        return img[:, : H // 2 * 2, : W // 2 * 2].reshape(
            B, H // 2, 2, W // 2, 2, C).mean((2, 4))

    xf = x.reshape((-1,) + x.shape[-3:])
    yf = y.reshape((-1,) + y.shape[-3:])
    loss = 0.0
    for _ in range(max_levels):
        bx, by = blur(xf), blur(yf)
        loss = loss + jnp.mean(jnp.abs((xf - bx) - (yf - by)))
        xf, yf = pool(bx), pool(by)
    return loss + jnp.mean(jnp.abs(xf - yf))


PIXEL_CRITERIA = {
    "l1": l1_sum,
    "l2": l2_sum,
    "cb": charbonnier,
    "lp": lap_loss,
}
