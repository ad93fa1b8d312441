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


def all_pairs_corr(fmap1: jax.Array, fmap2: jax.Array) -> jax.Array:
    """RAFT all-pairs correlation (corr.py:48-56).

    fmap1/fmap2: (B, H, W, C). Returns (B*H*W, H, W, 1) scaled by 1/sqrt(C).
    """
    B, H, W, C = fmap1.shape
    a = fmap1.reshape(B, H * W, C)
    b = fmap2.reshape(B, H * W, C)
    # accumulate at (at least) f32; fp64 inputs keep fp64 accumulation.
    # precision=HIGHEST: the TPU MXU's default bf16 passes put ~4e-3 error
    # on the cost volume, which feeds every GRU update — measured
    # TPU-vs-CPU diff drops from 3.7e-3 to ~1e-6 with fp32 passes.
    acc = jnp.promote_types(fmap1.dtype, jnp.float32)
    corr = jnp.einsum("bpc,bqc->bpq", a, b, preferred_element_type=acc,
                      precision=jax.lax.Precision.HIGHEST)
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


def _hat_weights(center: jax.Array, size: int, offsets: jax.Array) -> jax.Array:
    """Bilinear one-hot weights: w[p, s, o] = hat(center[p] + offsets[o] - s)
    for source index s in [0, size). Exactly reproduces per-corner bilinear
    sampling with zeros padding (OOB corners contribute nothing because only
    valid s are enumerated)."""
    s = jnp.arange(size, dtype=jnp.float32)
    pos = center[:, None] + offsets[None, :]            # (P, O)
    d = jnp.abs(pos[:, None, :] - s[None, :, None])     # (P, size, O)
    return jnp.maximum(0.0, 1.0 - d)


def corr_lookup(pyramid: list[jax.Array], coords: jax.Array, radius: int) -> jax.Array:
    """Windowed lookup in the correlation pyramid (corr.py:25-46).

    pyramid[i]: (B*H*W, H/2^i, W/2^i, 1); coords: (B, H, W, 2) pixel (x, y).
    Returns (B, H, W, num_levels*(2r+1)^2), level-major then window-major
    ordering matching torch's view(batch, h1, w1, -1) flattening — including
    the reference's quirky delta pairing (meshgrid(dy, dx) added onto (x, y)
    coords): window dim0 displaces X, dim1 displaces Y.

    TPU note: implemented as two tiny batched one-hot matmuls per level
    (separable bilinear weights contracted against the corr rows/cols)
    instead of a gather — XLA gathers move ~1e8 rows/s on v5e while this
    formulation is pure VPU/MXU work, worth ~8x on the RAFT hot loop.
    """
    B, H, W, _ = coords.shape
    r = radius
    n = 2 * r + 1
    offs = jnp.linspace(-r, r, n)
    P = B * H * W
    cx = coords[..., 0].reshape(P)
    cy = coords[..., 1].reshape(P)

    out = []
    for i, corr in enumerate(pyramid):
        h2, w2 = corr.shape[1], corr.shape[2]
        c = corr.reshape(P, h2, w2)
        sc = 1.0 / (2 ** i)
        vx = _hat_weights(cx * sc, w2, offs)            # (P, w2, n)
        vy = _hat_weights(cy * sc, h2, offs)            # (P, h2, n)
        t1 = jnp.einsum("pyx,pxa->pya", c, vx)          # contract cols → X-disp a
        lvl = jnp.einsum("pya,pyb->pab", t1, vy)        # contract rows → Y-disp b
        out.append(lvl.reshape(B, H, W, n * n))
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
