"""ZSM feature encoder (reference models/modules/Ours.py:349-409):
conv_first → 5 residual blocks → L2/L3 downsampled pyramid → pairwise
PCD alignment + fusion → bidirectional deformable ConvLSTM → 40-block
reconstruction trunk."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from motif_tpu.models.layers import Conv2d, ResBlocks, lrelu
from motif_tpu.models.pcd import BiDeformableConvLSTM, PCDAlign


class ZSMEncoder(nn.Module):
    channel: int = 64
    # Reference depths (Ours.py:351,357: front_RBs=5, back_RBs=40); the
    # multichip dryrun and tiny tests shrink these to bound 1-core CPU
    # execution time without changing the op set or sharding semantics.
    front_rbs: int = 5
    back_rbs: int = 40

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, N, H, W, 3) input frames → (B, 2N-1, H, W, channel)."""
        B, N, H, W, C = x.shape
        assert N >= 2, "ZSMEncoder needs >= 2 input frames (pairwise PCD)"
        nf = self.channel
        flat = x.reshape(B * N, H, W, C)

        l1 = lrelu(Conv2d(nf, 3, 1, 1, name="conv_first")(flat))
        l1 = ResBlocks(nf, self.front_rbs, name="feature_extraction")(l1)
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

        # The reference aligns the N-1 adjacent pairs one at a time
        # (Ours.py:392-402); the pairs share parameters and are data
        # independent, so they ride ONE PCDAlign call with the pair axis
        # folded into batch — bigger convs for the MXU, one DCN dispatch.
        def pairs(l):
            _, _, h, w, c = l.shape
            return (l[:, :-1].reshape(B * (N - 1), h, w, c),
                    l[:, 1:].reshape(B * (N - 1), h, w, c))
        (a1, b1), (a2, b2), (a3, b3) = pairs(l1), pairs(l2), pairs(l3)
        aligned = pcd_align([a1, a2, a3], [b1, b2, b3], None, None)
        fused = fusion(aligned).reshape(B, N - 1, H, W, nf)
        # Interleave: frame0, fused01, frame1, fused12, ..., frameN-1.
        inter = jnp.stack([l1[:, :-1], fused], axis=2)
        feats = jnp.concatenate(
            [inter.reshape(B, 2 * (N - 1), H, W, nf), l1[:, -1:]], axis=1)

        feats = nn.remat(BiDeformableConvLSTM)(nf, groups=8,
                                               name="ConvBLSTM")(feats)
        B2, T, H2, W2, C2 = feats.shape
        out = feats.reshape(B2 * T, H2, W2, C2)
        out = ResBlocks(nf, self.back_rbs, name="recon_trunk")(out)
        return out.reshape(B2, T, H2, W2, nf)
