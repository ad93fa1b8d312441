"""Tests for ops/corr.py vs torch transcriptions of the reference
CorrBlock (models/core/corr.py) and the PWC 9x9 correlation kernel."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from motif_tpu.ops import corr as corr_ops


def _torch_corrblock(fmap1, fmap2, coords, num_levels, radius):
    """Transcription of CorrBlock semantics (corr.py:8-46), NCHW torch."""
    batch, dim, ht, wd = fmap1.shape
    f1 = fmap1.view(batch, dim, ht * wd)
    f2 = fmap2.view(batch, dim, ht * wd)
    corr = torch.matmul(f1.transpose(1, 2), f2).view(batch, ht, wd, 1, ht, wd)
    corr = corr / torch.sqrt(torch.tensor(dim).float())
    corr = corr.reshape(batch * ht * wd, 1, ht, wd)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = F.avg_pool2d(corr, 2, stride=2)
        pyramid.append(corr)

    r = radius
    coords = coords.permute(0, 2, 3, 1)  # (B,H,W,2)
    out_pyramid = []
    for i in range(num_levels):
        c = pyramid[i]
        dx = torch.linspace(-r, r, 2 * r + 1)
        dy = torch.linspace(-r, r, 2 * r + 1)
        delta = torch.stack(torch.meshgrid(dy, dx, indexing="ij"), axis=-1)
        centroid = coords.reshape(batch * ht * wd, 1, 1, 2) / 2 ** i
        coords_lvl = centroid + delta.view(1, 2 * r + 1, 2 * r + 1, 2)
        # bilinear_sampler (utils.py:57)
        H2, W2 = c.shape[-2:]
        xg = 2 * coords_lvl[..., 0] / (W2 - 1) - 1
        yg = 2 * coords_lvl[..., 1] / (H2 - 1) - 1
        grid = torch.stack([xg, yg], dim=-1)
        sampled = F.grid_sample(c, grid, align_corners=True)
        out_pyramid.append(sampled.view(batch, ht, wd, -1))
    return torch.cat(out_pyramid, dim=-1).permute(0, 3, 1, 2).contiguous()


def test_raft_corr_pipeline_parity(rng):
    B, H, W, C = 2, 8, 12, 16
    num_levels, radius = 3, 3
    f1 = rng.standard_normal((B, H, W, C)).astype(np.float32)
    f2 = rng.standard_normal((B, H, W, C)).astype(np.float32)
    coords = (rng.random((B, H, W, 2)) * np.array([W, H])).astype(np.float32)

    vol = corr_ops.all_pairs_corr(jnp.asarray(f1), jnp.asarray(f2))
    pyr = corr_ops.corr_pyramid(vol, num_levels)
    got = np.asarray(corr_ops.corr_lookup(pyr, jnp.asarray(coords), radius))

    want = _torch_corrblock(
        torch.from_numpy(f1).permute(0, 3, 1, 2),
        torch.from_numpy(f2).permute(0, 3, 1, 2),
        torch.from_numpy(coords).permute(0, 3, 1, 2),
        num_levels, radius,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_local_corr_matches_pwc_kernel(rng):
    """PWC 9x9: channel (dy+4)*9+(dx+4), channel-mean, zero pad
    (OpticalFlow/correlation.py:44-110)."""
    B, H, W, C = 2, 6, 7, 8
    d = 2
    f1 = rng.standard_normal((B, H, W, C)).astype(np.float32)
    f2 = rng.standard_normal((B, H, W, C)).astype(np.float32)
    got = np.asarray(corr_ops.local_corr(jnp.asarray(f1), jnp.asarray(f2), max_disp=d))

    f2p = np.pad(f2, ((0, 0), (d, d), (d, d), (0, 0)))
    want = np.zeros((B, H, W, (2 * d + 1) ** 2), np.float32)
    for dy in range(-d, d + 1):
        for dx in range(-d, d + 1):
            ch = (dy + d) * (2 * d + 1) + (dx + d)
            shifted = f2p[:, dy + d:dy + d + H, dx + d:dx + d + W]
            want[..., ch] = (f1 * shifted).mean(-1)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
