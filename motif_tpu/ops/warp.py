"""Backward warping / grid sampling with exact torch.nn.functional.grid_sample
semantics.

The reference model mixes several grid_sample configurations and PSNR parity
hinges on matching each one exactly (reference: models/modules/Ours.py:704
nearest+align_corners=False; Ours.py:892-923 BackWarp bilinear+
align_corners=True+border; models/core/utils/utils.py:57 RAFT
bilinear_sampler bilinear+align_corners=True+zeros;
models/modules/module_util.py:55 flow_warp).

Layout: images are NHWC, grids are (B, Hg, Wg, 2) with grid[..., 0] = x
(width axis) and grid[..., 1] = y, normalized to [-1, 1] — the torch
convention.

Implementation notes (TPU): sampling is a flat gather over H*W via
jnp.take_along_axis, which XLA lowers to a single gather per corner. For
regular/separable grids prefer the dedicated helpers in ops/resize.py and
models/liif.py which use matmuls / separable takes instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord: jax.Array, size: int, align_corners: bool) -> jax.Array:
    """Map normalized [-1, 1] coords to pixel coords, torch convention."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _reflect(x: jax.Array, lo: float, hi: float) -> jax.Array:
    """Reflect coordinates into [lo, hi] (torch reflection padding math)."""
    span = hi - lo
    x = jnp.abs(x - lo)
    frac = jnp.mod(x, 2.0 * span)
    return lo + jnp.where(frac > span, 2.0 * span - frac, frac)


def _gather2d(img: jax.Array, iy: jax.Array, ix: jax.Array) -> jax.Array:
    """Gather img[b, iy, ix, :] for integer index maps.

    img: (B, H, W, C); iy/ix: (B, ...) int32 already clipped in-bounds.
    Returns (B, ..., C).
    """
    B, H, W, C = img.shape
    flat = img.reshape(B, H * W, C)
    idx = (iy * W + ix).reshape(B, -1, 1)
    out = jnp.take_along_axis(flat, idx, axis=1)
    return out.reshape((B,) + iy.shape[1:] + (C,))


def grid_sample(
    img: jax.Array,
    grid: jax.Array,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jax.Array:
    """torch.nn.functional.grid_sample parity (NHWC images).

    img: (B, H, W, C); grid: (B, Hg, Wg, 2) normalized (x, y).
    Returns (B, Hg, Wg, C).
    """
    B, H, W, C = img.shape
    # keep the grid's own float dtype (fp64 parity tests run end-to-end
    # double; production is f32 either way)
    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)

    # torch's corner-wise bounds check silently skips non-finite coords
    # (they arise e.g. in RAFT's 1x1 pyramid level where bilinear_sampler
    # divides by size-1 = 0); with mask-by-multiply, inf would poison the
    # output as NaN*0 — route non-finite coords far out of bounds instead.
    finite = jnp.isfinite(x) & jnp.isfinite(y)
    x = jnp.where(finite, x, -1e9)
    y = jnp.where(finite, y, -1e9)

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)
    elif padding_mode == "reflection":
        if align_corners:
            x = _reflect(x, 0.0, float(W - 1))
            y = _reflect(y, 0.0, float(H - 1))
        else:
            x = jnp.clip(_reflect(x, -0.5, W - 0.5), 0.0, W - 1)
            y = jnp.clip(_reflect(y, -0.5, H - 0.5), 0.0, H - 1)
    elif padding_mode != "zeros":
        raise ValueError(f"unknown padding_mode {padding_mode!r}")

    if mode == "nearest":
        # torch rounds with nearbyint (round-half-to-even) == jnp.round.
        ix = jnp.round(x).astype(jnp.int32)
        iy = jnp.round(y).astype(jnp.int32)
        if padding_mode == "zeros":
            valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
            out = _gather2d(img, jnp.clip(iy, 0, H - 1), jnp.clip(ix, 0, W - 1))
            return out * valid[..., None].astype(img.dtype)
        return _gather2d(img, jnp.clip(iy, 0, H - 1), jnp.clip(ix, 0, W - 1))

    if mode != "bilinear":
        raise ValueError(f"unknown mode {mode!r}")

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    ix1 = ix0 + 1
    iy1 = iy0 + 1

    out = None
    for iy_c, ix_c, w in (
        (iy0, ix0, wy0 * wx0),
        (iy0, ix1, wy0 * wx1),
        (iy1, ix0, wy1 * wx0),
        (iy1, ix1, wy1 * wx1),
    ):
        if padding_mode == "zeros":
            # torch checks each corner's in-bounds status independently.
            valid = (ix_c >= 0) & (ix_c < W) & (iy_c >= 0) & (iy_c < H)
            w = w * valid.astype(w.dtype)
        v = _gather2d(img, jnp.clip(iy_c, 0, H - 1), jnp.clip(ix_c, 0, W - 1))
        term = v * w[..., None].astype(img.dtype)
        out = term if out is None else out + term
    return out


def backwarp(img: jax.Array, flow: jax.Array, clip: bool = True, mode: str = "bilinear"):
    """BackWarp module parity (reference Ours.py:892-923).

    img: (B, H, W, C); flow: (B, H, W, 2) pixel displacements (u, v).
    Grid normalization uses x/W (not W-1) then align_corners=True sampling;
    clip=True → padding_mode='border'.

    Returns (warped, grid) like the reference module.
    """
    B, H, W, _ = flow.shape
    gx = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    x = gx + flow[..., 0]
    y = gy + flow[..., 1]
    x = (x / W) * 2.0 - 1.0
    y = (y / H) * 2.0 - 1.0
    grid = jnp.stack([x, y], axis=-1)
    pad = "border" if clip else "zeros"
    out = grid_sample(img, grid, mode=mode, padding_mode=pad, align_corners=True)
    return out, grid


def bilinear_sampler(img: jax.Array, coords: jax.Array, mask: bool = False):
    """RAFT bilinear_sampler parity (reference models/core/utils/utils.py:57).

    img: (B, H, W, C); coords: (B, Hg, Wg, 2) in *pixel* units (x, y).
    Normalizes by (size-1), samples bilinear + align_corners=True + zeros.
    """
    B, H, W, C = img.shape
    xgrid = 2.0 * coords[..., 0] / (W - 1) - 1.0
    ygrid = 2.0 * coords[..., 1] / (H - 1) - 1.0
    grid = jnp.stack([xgrid, ygrid], axis=-1)
    out = grid_sample(img, grid, mode="bilinear", padding_mode="zeros", align_corners=True)
    if mask:
        m = (xgrid > -1) & (ygrid > -1) & (xgrid < 1) & (ygrid < 1)
        return out, m.astype(img.dtype)
    return out


def flow_warp(
    x: jax.Array,
    flow: jax.Array,
    interp_mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jax.Array:
    """module_util.flow_warp parity (reference models/modules/module_util.py:55).

    x: (B, H, W, C); flow: (B, H, W, 2) pixel displacements (u, v) — note the
    reference takes flow as (N, H, W, 2) channel-last already.
    Normalizes by max(size-1, 1).
    """
    B, H, W, C = x.shape
    gx = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    vx = gx + flow[..., 0]
    vy = gy + flow[..., 1]
    vx = 2.0 * vx / max(W - 1, 1) - 1.0
    vy = 2.0 * vy / max(H - 1, 1) - 1.0
    grid = jnp.stack([vx, vy], axis=-1)
    return grid_sample(x, grid, mode=interp_mode, padding_mode=padding_mode,
                       align_corners=align_corners)
