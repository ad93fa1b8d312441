"""Baseline architectures from the reference model zoo (SURVEY.md §2.3):
ZSM (Zooming-Slow-Mo), TMNet, EDVR and Super-SloMo — NHWC flax with
torch-mirroring module names for checkpoint porting.

All are fixed 4x-spatial models; ZSM/TMNet interpolate time via the
deformable ConvLSTM (2N-1 output frames), TMNet additionally modulates the
PCD offsets with a continuous time code (TMB)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from motif_tpu.models.layers import (Conv2d, ResBlocks, lrelu,
                                     pixel_shuffle, max_pool2d,
                                     avg_pool2d_padded)
from motif_tpu.models.pcd import BiDeformableConvLSTM, DCNSep, PCDAlign
from motif_tpu.ops.resize import interpolate_bilinear
from motif_tpu.ops.warp import grid_sample


def _zsm_trunk(x: jax.Array, nf: int, front_rbs: int, use_time: bool = False,
               t: jax.Array | None = None, t_back: jax.Array | None = None):
    """Shared ZSM/TMNet trunk: features → pairwise PCD fusion → lstm feats
    (ZSM.py:335-378 / TMNet.py:372-420). Plain helper so the layers attach
    to the CALLER's compact scope with the torch top-level names."""
    B, N, H, W, C = x.shape
    flat = x.reshape(B * N, H, W, C)
    l1 = lrelu(Conv2d(nf, 3, 1, 1, name="conv_first")(flat))
    l1 = ResBlocks(nf, front_rbs, name="feature_extraction")(l1)
    l2 = lrelu(Conv2d(nf, 3, 2, 1, name="fea_L2_conv1")(l1))
    l2 = lrelu(Conv2d(nf, 3, 1, 1, name="fea_L2_conv2")(l2))
    l3 = lrelu(Conv2d(nf, 3, 2, 1, name="fea_L3_conv1")(l2))
    l3 = lrelu(Conv2d(nf, 3, 1, 1, name="fea_L3_conv2")(l3))
    l1 = l1.reshape(B, N, H, W, nf)
    l2 = l2.reshape(B, N, H // 2, W // 2, nf)
    l3 = l3.reshape(B, N, H // 4, W // 4, nf)

    pcd = PCDAlign(nf, groups=8, use_time=use_time, name="pcd_align")
    fusion = Conv2d(nf, 1, 1, 0, name="fusion")
    feats = []
    for idx in range(N - 1):
        fea1 = [l1[:, idx], l2[:, idx], l3[:, idx]]
        fea2 = [l1[:, idx + 1], l2[:, idx + 1], l3[:, idx + 1]]
        if idx == 0:
            feats.append(fea1[0])
        if t is not None:
            # TMNet: one PCD-fused frame per intermediate time
            for i in range(t.shape[1]):
                feats.append(fusion(pcd(fea1, fea2, t[:, i], t_back[:, i])))
        else:
            feats.append(fusion(pcd(fea1, fea2)))
        feats.append(fea2[0])
    return jnp.stack(feats, axis=1)  # (B, T, H, W, nf)


def _upsample_head(out, nf, prefix_hr="HRconv"):
    """pixelshuffle x4 head (ZSM.py:326-331 forward :381-386)."""
    out = lrelu(pixel_shuffle(Conv2d(nf * 4, 3, 1, 1, name="upconv1")(out), 2))
    out = lrelu(pixel_shuffle(Conv2d(64 * 4, 3, 1, 1, name="upconv2")(out), 2))
    out = lrelu(Conv2d(64, 3, 1, 1, name=prefix_hr)(out))
    return Conv2d(3, 3, 1, 1, name="conv_last")(out)


class ZSM(nn.Module):
    """Zooming Slow-Mo (ZSM.py LunaTokis): fixed 4x / 2x-time VSR+VFI.
    x (B, N, H, W, 3) → (B, 2N-1, 4H, 4W, 3)."""
    nf: int = 64
    front_rbs: int = 5
    back_rbs: int = 40
    groups: int = 8

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B = x.shape[0]
        feats = _zsm_trunk(x, self.nf, self.front_rbs)
        feats = BiDeformableConvLSTM(self.nf, self.groups, name="ConvBLSTM")(feats)
        B2, T, H, W, C = feats.shape
        out = feats.reshape(B2 * T, H, W, C)
        out = ResBlocks(self.nf, self.back_rbs, name="recon_trunk")(out)
        out = _upsample_head(out, self.nf)
        return out.reshape(B, T, 4 * H, 4 * W, 3)


class TMNet(nn.Module):
    """TMNet (TMNet.py:299-460): temporal-modulation PCD + non-linear
    comparison DCN stage + ConvBLSTM + pixelshuffle.

    x (B, N, H, W, 3), times (B, Nt) in [0,1] → (B, T, 4H, 4W, 3)."""
    nf: int = 64
    front_rbs: int = 5
    back_rbs: int = 40
    groups: int = 8

    @nn.compact
    def __call__(self, x: jax.Array, times: jax.Array | None = None) -> jax.Array:
        B = x.shape[0]
        if times is not None:
            t = ((times / 0.5) - 1.0).reshape(B, -1, 1, 1, 1)      # TMNet.py:360-366
            t_back = (((1.0 - times) / 0.5) - 1.0).reshape(B, -1, 1, 1, 1)
        else:
            t = t_back = None
        dnc = _zsm_trunk(x, self.nf, self.front_rbs,
                         use_time=times is not None, t=t, t_back=t_back)
        B2, T, H, W, C = dnc.shape

        # non-linear comparison stage (TMNet.py:424-443; the reference
        # hardcodes 64 channels == nf)
        nf = self.nf
        atb_off_0 = Conv2d(nf, 3, 1, 1, name="layersAtBOffset_0")
        atb_off_2 = Conv2d(nf, 3, 1, 1, name="layersAtBOffset_2")
        ctb_off_0 = Conv2d(nf, 3, 1, 1, name="layersCtBOffset_0")
        ctb_off_2 = Conv2d(nf, 3, 1, 1, name="layersCtBOffset_2")
        atb_off = lambda y: atb_off_2(lrelu(atb_off_0(y)))
        ctb_off = lambda y: ctb_off_2(lrelu(ctb_off_0(y)))
        atb = DCNSep(nf, deformable_groups=8, name="layersAtB")
        ctb = DCNSep(nf, deformable_groups=8, name="layersCtB")

        fusion_convs = [Conv2d(c, 1, 1, 0, name=f"layersFusion_{i}")
                        for i, c in zip((0, 2, 4, 6), (3 * nf, 3 * nf, 3 * nf, nf))]

        def fuse(y):
            for conv in fusion_convs[:-1]:
                y = lrelu(conv(y))
            return fusion_convs[-1](y)

        comp = []
        for i in range(T):
            idx = [max(i - 1, 0), i, min(i + 1, T - 1)]
            f0, f1, f2 = dnc[:, idx[0]], dnc[:, idx[1]], dnc[:, idx[2]]
            f0a = lrelu(atb(f0, atb_off(jnp.concatenate([f0, f1], -1))))
            f2a = lrelu(ctb(f2, ctb_off(jnp.concatenate([f2, f1], -1))))
            comp.append(fuse(jnp.concatenate([f0a, f1, f2a], -1)))
        lstm_feats = dnc + jnp.stack(comp, 1)

        feats = BiDeformableConvLSTM(self.nf, self.groups, name="ConvBLSTM")(lstm_feats)
        out = feats.reshape(B2 * feats.shape[1], H, W, C)
        back = lstm_feats  # TMNet adds the pre-LSTM feats as residual
        res = dnc.reshape(B2 * T, H, W, C)
        out = ResBlocks(self.nf, self.back_rbs, name="recon_trunk")(out)
        out = out + res  # TMNet.py:452: out + back_feats (the dnc stack)
        out = _upsample_head(out, self.nf)
        return out.reshape(B, T, 4 * H, 4 * W, 3)


class EDVRPCDAlignment(nn.Module):
    """EDVR PCD alignment (EDVR.py:10-98) — single direction with cascading
    refinement DCN. nbr/ref are [L1, L2, L3] pyramids."""
    nf: int = 64
    groups: int = 8

    @nn.compact
    def __call__(self, nbr, ref):
        up = lambda v: interpolate_bilinear(v, (v.shape[1] * 2, v.shape[2] * 2))
        feat, up_off, up_feat = None, None, None
        for i in (3, 2, 1):
            lv = f"l{i}"
            off = jnp.concatenate([nbr[i - 1], ref[i - 1]], -1)
            off = lrelu(Conv2d(self.nf, 3, 1, 1, name=f"offset_conv1_{lv}")(off))
            if i == 3:
                off = lrelu(Conv2d(self.nf, 3, 1, 1, name=f"offset_conv2_{lv}")(off))
            else:
                off = lrelu(Conv2d(self.nf, 3, 1, 1, name=f"offset_conv2_{lv}")(
                    jnp.concatenate([off, up_off], -1)))
                off = lrelu(Conv2d(self.nf, 3, 1, 1, name=f"offset_conv3_{lv}")(off))
            feat = DCNSep(self.nf, deformable_groups=self.groups,
                          name=f"dcn_pack_{lv}")(nbr[i - 1], off)
            if i < 3:
                feat = Conv2d(self.nf, 3, 1, 1, name=f"feat_conv_{lv}")(
                    jnp.concatenate([feat, up_feat], -1))
            if i > 1:
                feat = lrelu(feat)
                up_off = up(off) * 2.0
                up_feat = up(feat)
        off = jnp.concatenate([feat, ref[0]], -1)
        off = lrelu(Conv2d(self.nf, 3, 1, 1, name="cas_offset_conv2")(
            lrelu(Conv2d(self.nf, 3, 1, 1, name="cas_offset_conv1")(off))))
        return lrelu(DCNSep(self.nf, deformable_groups=self.groups,
                            name="cas_dcnpack")(feat, off))


class TSAFusion(nn.Module):
    """EDVR temporal-spatial attention fusion (EDVR.py:101-190)."""
    nf: int = 64
    num_frame: int = 7
    center: int = 3

    @nn.compact
    def __call__(self, aligned: jax.Array) -> jax.Array:
        B, T, H, W, C = aligned.shape
        emb_ref = Conv2d(self.nf, 3, 1, 1, name="temporal_attn1")(aligned[:, self.center])
        emb = Conv2d(self.nf, 3, 1, 1, name="temporal_attn2")(
            aligned.reshape(B * T, H, W, C)).reshape(B, T, H, W, -1)
        corr = jax.nn.sigmoid(jnp.sum(emb * emb_ref[:, None], -1))      # (B,T,H,W)
        weighted = (aligned * corr[..., None]).transpose(0, 2, 3, 1, 4).reshape(B, H, W, T * C)

        feat = lrelu(Conv2d(self.nf, 1, 1, 0, name="feat_fusion")(weighted))

        attn = lrelu(Conv2d(self.nf, 1, 1, 0, name="spatial_attn1")(weighted))
        attn = lrelu(Conv2d(self.nf, 1, 1, 0, name="spatial_attn2")(
            jnp.concatenate([max_pool2d(attn), avg_pool2d_padded(attn)], -1)))
        attn_lv = lrelu(Conv2d(self.nf, 1, 1, 0, name="spatial_attn_l1")(attn))
        attn_lv = lrelu(Conv2d(self.nf, 3, 1, 1, name="spatial_attn_l2")(
            jnp.concatenate([max_pool2d(attn_lv), avg_pool2d_padded(attn_lv)], -1)))
        attn_lv = lrelu(Conv2d(self.nf, 3, 1, 1, name="spatial_attn_l3")(attn_lv))
        attn_lv = interpolate_bilinear(attn_lv, (attn.shape[1], attn.shape[2]))

        attn = lrelu(Conv2d(self.nf, 3, 1, 1, name="spatial_attn3")(attn)) + attn_lv
        attn = lrelu(Conv2d(self.nf, 1, 1, 0, name="spatial_attn4")(attn))
        attn = interpolate_bilinear(attn, (H, W))
        attn = Conv2d(self.nf, 3, 1, 1, name="spatial_attn5")(attn)
        attn_add = Conv2d(self.nf, 1, 1, 0, name="spatial_attn_add2")(
            lrelu(Conv2d(self.nf, 1, 1, 0, name="spatial_attn_add1")(attn)))
        attn = jax.nn.sigmoid(attn)
        return feat * attn * 2.0 + attn_add


class EDVR(nn.Module):
    """EDVR VSR (EDVR.py:246-382; reference instantiates num_feat=128,
    num_frame=7, 40 recon blocks). x (B,T,H,W,3) → (B, 4H, 4W, 3)."""
    nf: int = 128
    num_frame: int = 7
    groups: int = 8
    extract_blocks: int = 5
    recon_blocks: int = 40
    with_tsa: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, T, H, W, C = x.shape
        center = self.num_frame // 2
        x_center = x[:, center]

        l1 = lrelu(Conv2d(self.nf, 3, 1, 1, name="conv_first")(x.reshape(B * T, H, W, C)))
        l1 = ResBlocks(self.nf, self.extract_blocks, name="feature_extraction")(l1)
        l2 = lrelu(Conv2d(self.nf, 3, 2, 1, name="conv_l2_1")(l1))
        l2 = lrelu(Conv2d(self.nf, 3, 1, 1, name="conv_l2_2")(l2))
        l3 = lrelu(Conv2d(self.nf, 3, 2, 1, name="conv_l3_1")(l2))
        l3 = lrelu(Conv2d(self.nf, 3, 1, 1, name="conv_l3_2")(l3))
        l1 = l1.reshape(B, T, H, W, -1)
        l2 = l2.reshape(B, T, H // 2, W // 2, -1)
        l3 = l3.reshape(B, T, H // 4, W // 4, -1)

        pcd = EDVRPCDAlignment(self.nf, self.groups, name="pcd_align")
        ref = [l1[:, center], l2[:, center], l3[:, center]]
        aligned = jnp.stack([pcd([l1[:, i], l2[:, i], l3[:, i]], ref)
                             for i in range(T)], axis=1)

        if self.with_tsa:
            feat = TSAFusion(self.nf, self.num_frame, center, name="fusion")(aligned)
        else:
            feat = Conv2d(self.nf, 1, 1, 0, name="fusion")(
                aligned.transpose(0, 2, 3, 1, 4).reshape(B, H, W, -1))

        out = feat
        out = ResBlocks(self.nf, self.recon_blocks, name="reconstruction")(out)
        out = lrelu(pixel_shuffle(Conv2d(self.nf * 4, 3, 1, 1, name="upconv1")(out), 2))
        out = lrelu(pixel_shuffle(Conv2d(64 * 4, 3, 1, 1, name="upconv2")(out), 2))
        out = lrelu(Conv2d(64, 3, 1, 1, name="conv_hr")(out))
        out = Conv2d(3, 3, 1, 1, name="conv_last")(out)
        base = interpolate_bilinear(x_center, (4 * H, 4 * W))
        return out + base


# ---------------------------------------------------------------------------
# Super-SloMo (Super_SloMo.py)
# ---------------------------------------------------------------------------

class _Down(nn.Module):
    out_ch: int
    k: int

    @nn.compact
    def __call__(self, x):
        x = avg_pool2d_padded(x, 2, 2, 0)
        x = lrelu(Conv2d(self.out_ch, self.k, 1, (self.k - 1) // 2, name="conv1")(x))
        return lrelu(Conv2d(self.out_ch, self.k, 1, (self.k - 1) // 2, name="conv2")(x))


class _Up(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x, skip):
        x = interpolate_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))
        x = lrelu(Conv2d(self.out_ch, 3, 1, 1, name="conv1")(x))
        return lrelu(Conv2d(self.out_ch, 3, 1, 1, name="conv2")(
            jnp.concatenate([x, skip], -1)))


class UNet(nn.Module):
    """Super-SloMo UNet (Super_SloMo.py:140-212)."""
    out_ch: int

    @nn.compact
    def __call__(self, x):
        x = lrelu(Conv2d(32, 7, 1, 3, name="conv1")(x))
        s1 = lrelu(Conv2d(32, 7, 1, 3, name="conv2")(x))
        s2 = _Down(64, 5, name="down1")(s1)
        s3 = _Down(128, 3, name="down2")(s2)
        s4 = _Down(256, 3, name="down3")(s3)
        s5 = _Down(512, 3, name="down4")(s4)
        x = _Down(512, 3, name="down5")(s5)
        x = _Up(512, name="up1")(x, s5)
        x = _Up(256, name="up2")(x, s4)
        x = _Up(128, name="up3")(x, s3)
        x = _Up(64, name="up4")(x, s2)
        x = _Up(32, name="up5")(x, s1)
        return lrelu(Conv2d(self.out_ch, 3, 1, 1, name="conv3")(x))


def _sslomo_backwarp(img, flow):
    """Super_SloMo backWarp (Super_SloMo.py:254-286): x normalized by W (not
    W-1), grid_sample defaults (bilinear, zeros, align_corners=False)."""
    B, H, W, _ = img.shape
    gx = jnp.arange(W, dtype=jnp.float32)[None, None, :] + flow[..., 0]
    gy = jnp.arange(H, dtype=jnp.float32)[None, :, None] + flow[..., 1]
    grid = jnp.stack([2 * (gx / W - 0.5), 2 * (gy / H - 0.5)], -1)
    return grid_sample(img, grid, "bilinear", "zeros", False)


class SuperSloMo(nn.Module):
    """Super-SloMo VFI (Super_SloMo.py:364-436): flow UNet + arbitrary-time
    interpolation UNet with visibility maps. frames (B, 2, H, W, 3),
    factor → (B, factor+1, h0, w0, 3)."""
    h0: int = 360
    w0: int = 624

    @nn.compact
    def __call__(self, frames: jax.Array, factor: int) -> jax.Array:
        norm = jnp.asarray([0.429, 0.431, 0.397], frames.dtype)
        h = (self.h0 // 32) * 32
        w = (self.w0 // 32) * 32
        i0 = interpolate_bilinear(frames[:, 0] - norm, (h, w))
        i1 = interpolate_bilinear(frames[:, 1] - norm, (h, w))

        flow_net = UNet(4, name="flow")
        interp_net = UNet(5, name="interp")

        flow_out = flow_net(jnp.concatenate([i0, i1], -1))
        f01, f10 = flow_out[..., :2], flow_out[..., 2:]

        outs = [interpolate_bilinear(i0 + norm, (self.h0, self.w0))]
        for i in range(1, factor):
            t = i / factor
            temp = -t * (1 - t)
            ft0 = temp * f01 + (t * t) * f10
            ft1 = ((1 - t) * (1 - t)) * f01 + temp * f10
            g0 = _sslomo_backwarp(i0, ft0)
            g1 = _sslomo_backwarp(i1, ft1)
            io = interp_net(jnp.concatenate([i0, i1, f01, f10, ft1, ft0, g1, g0], -1))
            ft0f = io[..., :2] + ft0
            ft1f = io[..., 2:4] + ft1
            vt0 = jax.nn.sigmoid(io[..., 4:5])
            vt1 = 1.0 - vt0
            g0f = _sslomo_backwarp(i0, ft0f)
            g1f = _sslomo_backwarp(i1, ft1f)
            ft_p = ((1 - t) * vt0 * g0f + t * vt1 * g1f) / ((1 - t) * vt0 + t * vt1)
            outs.append(interpolate_bilinear(ft_p + norm, (self.h0, self.w0)))
        outs.append(interpolate_bilinear(i1 + norm, (self.h0, self.w0)))
        return jnp.stack(outs, axis=1)
