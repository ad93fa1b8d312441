"""VideoINR baseline (the reference's `LIIF` model, Sakuya_arch.py:267-610):
ZSM encoder trunk + three SIRENs — feat_imnet (HR feature INF), flow_imnet
(motion INF, 4 channels = two backward flows) and encode_imnet (RGB
synthesis from double-warped samples)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from motif_tpu.models.layers import Conv2d, ResBlocks, lrelu
from motif_tpu.models.motif import liif_nearest_axis, make_coord_1d
from motif_tpu.models.pcd import BiDeformableConvLSTM, PCDAlign
from motif_tpu.models.siren import Siren
from motif_tpu.ops.warp import grid_sample


def _warpgrid(flow: jax.Array) -> jax.Array:
    """warplayer.warpgrid (warplayer.py:8-22): normalized backward grid
    base + flow/((size-1)/2), channels (x, y). flow (B, HH, WW, 2)."""
    B, H, W, _ = flow.shape
    gx = jnp.broadcast_to(jnp.linspace(-1.0, 1.0, W)[None, None, :], (B, H, W))
    gy = jnp.broadcast_to(jnp.linspace(-1.0, 1.0, H)[None, :, None], (B, H, W))
    u = flow[..., 0] / ((W - 1.0) / 2.0)
    v = flow[..., 1] / ((H - 1.0) / 2.0)
    return jnp.stack([gx + u, gy + v], axis=-1)


class VideoINR(nn.Module):
    """Sakuya_arch LunaTokis. __call__(x, times, out_hw) → list of
    (B, HH, WW, 3) frames, one per time (the reference returns a list too,
    test.py:189-197 stacks it)."""
    nf: int = 64
    front_rbs: int = 5
    back_rbs: int = 40
    groups: int = 8

    @nn.compact
    def __call__(self, x: jax.Array, times: jax.Array, out_hw):
        B, N, H, W, C = x.shape
        nf = self.nf
        HH, WW = out_hw

        # ---- gen_feat (Sakuya_arch.py:320-372): ZSM trunk ----
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

        pcd = PCDAlign(nf, groups=self.groups, name="pcd_align")
        fusion = Conv2d(nf, 1, 1, 0, name="fusion")
        feats = []
        for idx in range(N - 1):
            fea1 = [l1[:, idx], l2[:, idx], l3[:, idx]]
            fea2 = [l1[:, idx + 1], l2[:, idx + 1], l3[:, idx + 1]]
            if idx == 0:
                feats.append(fea1[0])
            feats.append(fusion(pcd(fea1, fea2)))
            feats.append(fea2[0])
        feats = jnp.stack(feats, axis=1)
        feats = BiDeformableConvLSTM(nf, self.groups, name="ConvBLSTM")(feats)
        B2, T, _, _, _ = feats.shape
        out = feats.reshape(B2 * T, H, W, nf)
        out = ResBlocks(nf, self.back_rbs, name="recon_trunk")(out)
        feat_t = out.reshape(B, T, H, W, nf)

        # unused-but-checkpointed upsampling head (Sakuya_arch.py:302-306)
        dummy = jnp.zeros((1, 2, 2, nf), x.dtype)
        _ = Conv2d(nf * 4, 3, 1, 1, name="upconv1")(dummy)
        _ = Conv2d(64 * 4, 3, 1, 1, name="upconv2")(jnp.zeros((1, 2, 2, nf), x.dtype))
        _ = Conv2d(64, 3, 1, 1, name="HRconv")(jnp.zeros((1, 2, 2, 64), x.dtype))
        _ = Conv2d(3, 3, 1, 1, name="conv_last")(jnp.zeros((1, 2, 2, 64), x.dtype))

        feat = jnp.concatenate([feat_t[:, i] for i in range(T)], axis=-1)  # (B,H,W,3nf)
        inp = x.reshape(B, H, W, N * C)  # frames stacked channelwise

        feat_imnet = Siren([64, 64, 256], 2, 64, name="feat_imnet")
        flow_imnet = Siren([64, 64, 256], 2, 4, name="flow_imnet")
        encode_imnet = Siren([64, 64, 256, 256], 3, 3, name="encode_imnet")

        # LIIF nearest indices + rel coords (coord_highres clamped in place,
        # Sakuya_arch.py:385; no extra eps shift)
        iy, _ = liif_nearest_axis(H, HH, 0.0)
        ix, _ = liif_nearest_axis(W, WW, 0.0)
        hy = np.clip(make_coord_1d(HH), -1 + 1e-6, 1 - 1e-6)
        hx = np.clip(make_coord_1d(WW), -1 + 1e-6, 1 - 1e-6)
        rel_y = ((hy - make_coord_1d(H)[iy]) * H).astype(np.float32)
        rel_x = ((hx - make_coord_1d(W)[ix]) * W).astype(np.float32)
        rel = jnp.asarray(np.stack(np.meshgrid(rel_y, rel_x, indexing="ij"), -1))
        rel = jnp.broadcast_to(rel[None], (B, HH, WW, 2)).astype(x.dtype)

        def up_nearest(img):
            return jnp.take(jnp.take(img, iy, axis=1), ix, axis=2)

        # bilinear sampling of an LR map at the (clamped) HR cell centers,
        # align_corners=False zeros padding — grid identical for all pixels
        ggrid = jnp.broadcast_to(
            jnp.asarray(np.stack(np.meshgrid(hx, hy, indexing="xy"), -1),
                        jnp.float32)[None], (B, HH, WW, 2))

        def up_bilinear(img):
            return grid_sample(img, ggrid, "bilinear", "zeros", False)

        q_feat = up_nearest(feat)
        q_inp = up_nearest(inp)

        preds = []
        for c in range(times.shape[1]):
            pe = jnp.broadcast_to(times[:, c].reshape(B, 1, 1, 1), (B, HH, WW, 1)).astype(x.dtype)
            fi = jnp.concatenate([q_feat, q_inp, rel, pe], -1)
            hr_feat = feat_imnet(fi.reshape(B, HH * WW, -1)).reshape(B, HH, WW, 64)

            q_feat0 = up_bilinear(feat)
            q_inp_b = up_bilinear(inp)
            flow_in = jnp.concatenate([hr_feat, q_feat0, q_inp_b, pe], -1)
            flow_pred = flow_imnet(flow_in.reshape(B, HH * WW, -1)).reshape(B, HH, WW, 4)

            g1 = jnp.clip(_warpgrid(flow_pred[..., :2]), -1 + 1e-6, 1 - 1e-6)
            g2 = jnp.clip(_warpgrid(flow_pred[..., 2:]), -1 + 1e-6, 1 - 1e-6)
            q_feat1 = grid_sample(hr_feat, g1, "bilinear", "zeros", False)
            q_img1 = grid_sample(inp, g1, "bilinear", "zeros", False)
            q_feat3 = grid_sample(feat, g1, "bilinear", "zeros", False)
            q_feat2 = grid_sample(hr_feat, g2, "bilinear", "zeros", False)
            q_img2 = grid_sample(inp, g2, "bilinear", "zeros", False)
            q_feat4 = grid_sample(feat, g2, "bilinear", "zeros", False)

            enc_in = jnp.concatenate(
                [q_feat1, q_feat2, q_feat3, q_feat4, q_img1, q_img2, pe], -1)
            pred = encode_imnet(enc_in.reshape(B, HH * WW, -1)).reshape(B, HH, WW, 3)
            preds.append(pred)
        return preds
