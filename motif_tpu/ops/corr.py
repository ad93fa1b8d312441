"""Correlation / cost-volume ops.

TPU-native replacements for the reference's two native correlation kernels:

* RAFT correlation (models/core/corr.py): all-pairs feature correlation
  (one big MXU matmul), a 4-level average-pooled pyramid, and windowed
  bilinear lookup around the current flow estimate. The prebuilt
  `alt_cuda_corr` extension (AlternateCorrBlock, corr.py:59-87) computes
  identical values to the pure CorrBlock, so we implement the CorrBlock
  semantics (corr.py:8-56) directly — at the LR resolutions RAFT runs at,
  the all-pairs volume is small and the matmul rides the MXU.

* PWC-Net 9×9 local cost volume (OpticalFlow/correlation.py): correlation
  of feature maps over displacements (dy, dx) ∈ [-4, 4]², zero-padded,
  channel-MEAN normalised, output channel index (dy+4)*9 + (dx+4)
  (correlation.py:44-110). Implemented as a shift-multiply-reduce, which
  XLA fuses into a few vectorised passes; gradients are free via autodiff.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from motif_tpu.ops.resize import avg_pool2d
from motif_tpu.ops.warp import bilinear_sampler


def all_pairs_corr(fmap1: jax.Array, fmap2: jax.Array) -> jax.Array:
    """RAFT all-pairs correlation (corr.py:48-56).

    fmap1/fmap2: (B, H, W, C). Returns (B*H*W, H, W, 1) scaled by 1/sqrt(C).
    """
    B, H, W, C = fmap1.shape
    a = fmap1.reshape(B, H * W, C)
    b = fmap2.reshape(B, H * W, C)
    corr = jnp.einsum("bpc,bqc->bpq", a, b, preferred_element_type=jnp.float32)
    corr = corr / math.sqrt(C)
    return corr.reshape(B * H * W, H, W, 1)


def corr_pyramid(corr: jax.Array, num_levels: int = 4) -> list[jax.Array]:
    """Average-pool pyramid over the target dims (corr.py:20-23)."""
    min_dim = min(corr.shape[1], corr.shape[2])
    assert min_dim >= 2 ** (num_levels - 1), (
        f"correlation map {corr.shape[1]}x{corr.shape[2]} too small for a "
        f"{num_levels}-level pyramid (the reference errors here too); "
        f"use inputs of at least {8 * 2 ** (num_levels - 1)} px per side")
    pyr = [corr]
    for _ in range(num_levels - 1):
        corr = avg_pool2d(corr, 2, 2)
        pyr.append(corr)
    return pyr


def corr_lookup(pyramid: list[jax.Array], coords: jax.Array, radius: int) -> jax.Array:
    """Windowed lookup in the correlation pyramid (corr.py:25-46).

    pyramid[i]: (B*H*W, H/2^i, W/2^i, 1); coords: (B, H, W, 2) pixel (x, y).
    Returns (B, H, W, num_levels*(2r+1)^2), level-major then (dy, dx)-major
    ordering to match torch's view(batch, h1, w1, -1) flattening.
    """
    B, H, W, _ = coords.shape
    r = radius
    dx = jnp.linspace(-r, r, 2 * r + 1)
    dy = jnp.linspace(-r, r, 2 * r + 1)
    # torch meshgrid(dy, dx) stacked (dy, dx) then used as (x=..,y=..)?
    # Reference: delta = stack(meshgrid(dy, dx), -1) → delta[..., 0] = dy,
    # [..., 1] = dx; coords_lvl = centroid + delta with the LAST dim being
    # (x, y) coordinate order from coords.permute — so dy indexes the X
    # displacement slot. We reproduce that exact (quirky) pairing.
    dgrid_x = jnp.broadcast_to(dy[:, None], (2 * r + 1, 2 * r + 1))
    dgrid_y = jnp.broadcast_to(dx[None, :], (2 * r + 1, 2 * r + 1))
    delta = jnp.stack([dgrid_x, dgrid_y], axis=-1)                      # (2r+1,2r+1,2)

    out = []
    for i, corr in enumerate(pyramid):
        centroid = coords.reshape(B * H * W, 1, 1, 2) / (2 ** i)
        coords_lvl = centroid + delta[None]
        sampled = bilinear_sampler(corr, coords_lvl)                    # (BHW,2r+1,2r+1,1)
        out.append(sampled.reshape(B, H, W, -1))
    return jnp.concatenate(out, axis=-1)


def local_corr(f1: jax.Array, f2: jax.Array, max_disp: int = 4) -> jax.Array:
    """PWC-Net local cost volume (OpticalFlow/correlation.py).

    f1/f2: (B, H, W, C). Returns (B, H, W, (2d+1)^2) with channel
    (dy+d)*(2d+1) + (dx+d) = mean_c f1[y,x,c] * f2[y+dy, x+dx, c],
    zero-padded outside.
    """
    B, H, W, C = f1.shape
    d = max_disp
    f2p = jnp.pad(f2, ((0, 0), (d, d), (d, d), (0, 0)))
    outs = []
    for dy in range(-d, d + 1):
        for dx in range(-d, d + 1):
            shifted = jax.lax.dynamic_slice(
                f2p, (0, dy + d, dx + d, 0), (B, H, W, C))
            outs.append(jnp.mean(f1 * shifted, axis=-1))
    return jnp.stack(outs, axis=-1)
