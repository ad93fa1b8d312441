"""ZSM feature encoder (reference models/modules/Ours.py:349-409):
conv_first → 5 residual blocks → L2/L3 downsampled pyramid → pairwise
PCD alignment + fusion → bidirectional deformable ConvLSTM → 40-block
reconstruction trunk."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from motif_tpu.models.layers import Conv2d, ResidualBlockNoBN, lrelu
from motif_tpu.models.pcd import BiDeformableConvLSTM, PCDAlign


class ZSMEncoder(nn.Module):
    channel: int = 64

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, N, H, W, 3) input frames → (B, 2N-1, H, W, channel)."""
        B, N, H, W, C = x.shape
        nf = self.channel
        flat = x.reshape(B * N, H, W, C)

        l1 = lrelu(Conv2d(nf, 3, 1, 1, name="conv_first")(flat))
        for i in range(5):
            l1 = ResidualBlockNoBN(nf, name=f"feature_extraction_{i}")(l1)
        l2 = lrelu(Conv2d(nf, 3, 2, 1, name="fea_L2_conv1")(l1))
        l2 = lrelu(Conv2d(nf, 3, 1, 1, name="fea_L2_conv2")(l2))
        l3 = lrelu(Conv2d(nf, 3, 2, 1, name="fea_L3_conv1")(l2))
        l3 = lrelu(Conv2d(nf, 3, 1, 1, name="fea_L3_conv2")(l3))

        l1 = l1.reshape(B, N, H, W, nf)
        l2 = l2.reshape(B, N, H // 2, W // 2, nf)
        l3 = l3.reshape(B, N, H // 4, W // 4, nf)

        # remat: the PCD stages' one-hot DCN im2col buffers dominate the
        # encoder's backward memory (dozens of (B,H,W,9,8,8) saves); their
        # recompute is cheap relative to the HR stages downstream.
        pcd_align = nn.remat(PCDAlign)(nf, groups=8, name="pcd_align")
        fusion = Conv2d(nf, 1, 1, 0, name="fusion")

        to_lstm = []
        for idx in range(N - 1):
            fea1 = [l1[:, idx], l2[:, idx], l3[:, idx]]
            fea2 = [l1[:, idx + 1], l2[:, idx + 1], l3[:, idx + 1]]
            aligned = pcd_align(fea1, fea2, None, None)
            fused = fusion(aligned)
            if idx == 0:
                to_lstm.append(fea1[0])
            to_lstm.append(fused)
            to_lstm.append(fea2[0])
        feats = jnp.stack(to_lstm, axis=1)  # (B, 2N-1, H, W, nf)

        feats = nn.remat(BiDeformableConvLSTM)(nf, groups=8,
                                               name="ConvBLSTM")(feats)
        B2, T, H2, W2, C2 = feats.shape
        out = feats.reshape(B2 * T, H2, W2, C2)
        for i in range(40):
            out = ResidualBlockNoBN(nf, name=f"recon_trunk_{i}")(out)
        return out.reshape(B2, T, H2, W2, nf)
