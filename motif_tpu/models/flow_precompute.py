"""Ours_flow (models/modules/Ours_flow.py:496-560) — despite living in the
model zoo, this "network" is the authors' offline flow/psies precomputer:
given 4 LR frames it runs RAFT over 12 directed pairs, keeps the 8 middle
pairs (anchors 1 and 2 → all four frames), and emits those flows plus the
reliability metrics (psi_photo / psi_flow / psi_var) that the Adobe_flow
dataset (Adobe_dataset_flow.py:194-196) later loads from npy files.

Returns (flow, 0, psies) exactly like the reference forward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from motif_tpu.models.motif import _gauss_blur_reflect
from motif_tpu.models.raft import RAFT
from motif_tpu.ops.resize import interpolate_bilinear
from motif_tpu.ops.warp import backwarp

# 12 directed pairs (src, dst), Ours_flow.py:512-515; rows 3 (1→1) and
# 8 (2→2) are zeroed self-pairs
PAIR_SRC = [0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3]
PAIR_DST = [1, 2, 0, 1, 2, 3, 0, 1, 2, 3, 1, 2]
ZERO_ROWS = (3, 8)
# reverse-pair rows for the 8 kept middle pairs (Ours_flow.py:536-541):
# kept rows 2..9 = [1→0, 1→1, 1→2, 1→3, 2→0, 2→1, 2→2, 2→3]; the reverse
# of (a→b) is (b→a), looked up in the full 12-row table
REVERSE_OF_KEPT = [0, 3, 7, 10, 1, 4, 8, 11]


class FlowPrecompute(nn.Module):
    """x: (B, 4, H, W, 3) LR frames → (flow (8B, H, W, 2), 0, psies
    (8B, H, W, 3)); flows are computed at (HH, WW) = scale*(H, W) and
    downsampled like the live MoTIF path."""
    scale: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, iters: int = 12):
        B, N_in, H, W, _ = x.shape
        assert N_in == 4
        HH, WW = H * self.scale, W * self.scale
        raft = RAFT(name="flow_predictor")

        frames = [x[:, i] for i in range(4)]
        hr = [interpolate_bilinear(f, (HH, WW)) for f in frames]
        src = jnp.concatenate([hr[i] for i in PAIR_SRC], 0)
        dst = jnp.concatenate([hr[j] for j in PAIR_DST], 0)
        flow = raft(src * 255.0, dst * 255.0, iters=iters)
        flow = interpolate_bilinear(flow, (H, W)) * (H / HH)
        flow = flow.reshape(12, B, H, W, 2)
        for r in ZERO_ROWS:
            flow = flow.at[r].set(0.0)

        kept = flow[2:-2]                                     # (8, B, H, W, 2)
        kept_flat = kept.reshape(8 * B, H, W, 2)

        # psi_photo (Ours_flow.py:526-532): backwarp each dst frame with the
        # pair's flow, compare against the pair's src frame (anchors 1, 2).
        # NB: unlike Ours, this fork constructs BackWarp(clip=False)
        # (Ours_flow.py:414) — zeros padding, not border.
        dsts = jnp.concatenate([frames[j] for j in PAIR_DST[2:-2]], 0)
        srcs = jnp.concatenate(
            [frames[1]] * 4 + [frames[2]] * 4, 0)
        warped, _ = backwarp(dsts, kept_flat, clip=False)
        psi_photo = jnp.abs(srcs - warped).mean(-1)

        # psi_flow (Ours_flow.py:536-547): warp each reverse flow back
        rev = jnp.concatenate([flow[r] for r in REVERSE_OF_KEPT], 0)
        warped_f, _ = backwarp(-rev, kept_flat, clip=False)
        psi_flow = jnp.abs(kept_flat - warped_f).mean(-1)

        # psi_var (Ours_flow.py:548-556)
        sq_mean = _gauss_blur_reflect(kept_flat ** 2)
        mean_sq = _gauss_blur_reflect(kept_flat)
        psi_var = jnp.sqrt(jnp.clip(sq_mean - mean_sq ** 2, 1e-9)).mean(-1)

        psies = jnp.stack([psi_photo, psi_flow / 10.0, psi_var], -1)
        return kept_flat, 0, psies
