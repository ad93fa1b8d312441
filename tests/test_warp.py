"""Golden tests: ops/warp.py vs torch.nn.functional.grid_sample."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from motif_tpu.ops import warp


def _torch_grid_sample(img, grid, mode, padding_mode, align_corners):
    t = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode=mode,
        padding_mode=padding_mode,
        align_corners=align_corners,
    )
    return t.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("padding_mode", ["zeros", "border", "reflection"])
@pytest.mark.parametrize("align_corners", [True, False])
def test_grid_sample_parity(rng, mode, padding_mode, align_corners):
    img = rng.standard_normal((2, 7, 9, 3), dtype=np.float32)
    # grid spanning beyond [-1, 1] to exercise padding
    grid = (rng.random((2, 5, 6, 2), dtype=np.float32) * 3.0 - 1.5)
    want = _torch_grid_sample(img, grid, mode, padding_mode, align_corners)
    got = np.asarray(warp.grid_sample(jnp.asarray(img), jnp.asarray(grid),
                                      mode=mode, padding_mode=padding_mode,
                                      align_corners=align_corners))
    atol = 1e-5
    if mode == "nearest":
        # half-integer rounding ties can differ; exclude exact .5 coords
        np.testing.assert_allclose(got, want, atol=atol)
    else:
        np.testing.assert_allclose(got, want, atol=atol, rtol=1e-5)


def test_backwarp_matches_reference_formula(rng):
    """BackWarp: grid normalized by size (not size-1), align_corners=True,
    border padding (reference Ours.py:899-923)."""
    B, H, W, C = 2, 8, 10, 4
    img = rng.standard_normal((B, H, W, C), dtype=np.float32)
    flow = rng.standard_normal((B, H, W, 2), dtype=np.float32) * 3.0

    got, grid = warp.backwarp(jnp.asarray(img), jnp.asarray(flow), clip=True)

    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    x = gx[None] + flow[..., 0]
    y = gy[None] + flow[..., 1]
    tgrid = np.stack([(x / W) * 2 - 1, (y / H) * 2 - 1], axis=-1).astype(np.float32)
    want = _torch_grid_sample(img, tgrid, "bilinear", "border", True)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grid), tgrid, atol=1e-6)


def test_bilinear_sampler_matches_raft(rng):
    """RAFT bilinear_sampler: pixel coords normalized by (size-1),
    align_corners=True, zeros padding (models/core/utils/utils.py:57-71)."""
    B, H, W, C = 3, 6, 5, 2
    img = rng.standard_normal((B, H, W, C), dtype=np.float32)
    coords = rng.random((B, 4, 4, 2), dtype=np.float32) * np.array([W + 2, H + 2], np.float32) - 1.5

    got = warp.bilinear_sampler(jnp.asarray(img), jnp.asarray(coords))

    xg = 2 * coords[..., 0] / (W - 1) - 1
    yg = 2 * coords[..., 1] / (H - 1) - 1
    tgrid = np.stack([xg, yg], axis=-1).astype(np.float32)
    want = _torch_grid_sample(img, tgrid, "bilinear", "zeros", True)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


def test_flow_warp_matches_reference(rng):
    B, H, W, C = 2, 6, 7, 3
    img = rng.standard_normal((B, H, W, C), dtype=np.float32)
    flow = rng.standard_normal((B, H, W, 2), dtype=np.float32) * 2

    got = warp.flow_warp(jnp.asarray(img), jnp.asarray(flow))

    gy, gx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    vx = 2.0 * (gx[None] + flow[..., 0]) / max(W - 1, 1) - 1.0
    vy = 2.0 * (gy[None] + flow[..., 1]) / max(H - 1, 1) - 1.0
    tgrid = np.stack([vx, vy], axis=-1).astype(np.float32)
    want = _torch_grid_sample(img, tgrid, "bilinear", "zeros", False)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)
