"""PWC-Net optical flow (reference OpticalFlow/PWCNet.py — the QVI
implementation used by the VideoINR lineage; kept for component parity,
MoTIF itself uses RAFT).

6-level feature pyramid, per-level decoder with a 9x9 local cost volume
(ops/corr.py local_corr — the TPU replacement of the CuPy correlation
kernel), backward warping with a validity mask, dense feature
concatenation, and a dilated context refiner.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from motif_tpu.models.layers import Conv2d, ConvTranspose2d, lrelu
from motif_tpu.ops.corr import local_corr
from motif_tpu.ops.resize import interpolate_bilinear
from motif_tpu.ops.warp import grid_sample

_LEVEL_CHANNELS = [None, None, 81 + 32 + 4, 81 + 64 + 4, 81 + 96 + 4, 81 + 128 + 4, 81, None]
_BACKWARD_SCALE = [None, None, None, 5.0, 2.5, 1.25, 0.625, None]


class Extractor(nn.Module):
    """6-level conv pyramid (PWCNet.py:20-88)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        names = ["moduleOne", "moduleTwo", "moduleThr", "moduleFou", "moduleFiv", "moduleSix"]
        chans = [16, 32, 64, 96, 128, 196]
        feats = []
        y = x
        for name, c in zip(names, chans):
            y = lrelu(Conv2d(c, 3, 2, 1, name=f"{name}_0")(y))
            y = lrelu(Conv2d(c, 3, 1, 1, name=f"{name}_2")(y))
            y = lrelu(Conv2d(c, 3, 1, 1, name=f"{name}_4")(y))
            feats.append(y)
        return feats


def _masked_backwarp(img: jax.Array, flow: jax.Array) -> jax.Array:
    """Decoder.Backward (PWCNet.py:146-178): grid built from linspace(-1,1)
    (align_corners=True-style) but sampled with grid_sample's default
    align_corners=False; a warped ones-channel thresholded at 0.999 masks
    out-of-frame samples."""
    B, H, W, C = img.shape
    gx = jnp.linspace(-1.0, 1.0, W)[None, None, :]
    gy = jnp.linspace(-1.0, 1.0, H)[None, :, None]
    u = flow[..., 0] / ((W - 1.0) / 2.0)
    v = flow[..., 1] / ((H - 1.0) / 2.0)
    grid = jnp.stack([gx + u, gy + v], axis=-1)
    ones = jnp.ones((B, H, W, 1), img.dtype)
    out = grid_sample(jnp.concatenate([img, ones], -1), grid,
                      mode="bilinear", padding_mode="zeros", align_corners=False)
    mask = (out[..., -1:] > 0.999).astype(img.dtype)
    return out[..., :-1] * mask


class Decoder(nn.Module):
    """Per-level flow decoder (PWCNet.py:93-225)."""
    level: int

    @nn.compact
    def __call__(self, f1: jax.Array, f2: jax.Array, prev: dict | None):
        if prev is None:
            vol = lrelu(local_corr(f1, f2, 4))
            feat = vol
            flow_up = None
        else:
            flow_up = ConvTranspose2d(2, 4, 2, 1, name="moduleUpflow")(prev["flow"])
            feat_up = ConvTranspose2d(2, 4, 2, 1, name="moduleUpfeat")(prev["feat"])
            warped = _masked_backwarp(f2, flow_up * _BACKWARD_SCALE[self.level + 1])
            vol = lrelu(local_corr(f1, warped, 4))
            feat = jnp.concatenate([vol, f1, flow_up, feat_up], -1)

        feat = jnp.concatenate([lrelu(Conv2d(128, 3, 1, 1, name="moduleOne_0")(feat)), feat], -1)
        feat = jnp.concatenate([lrelu(Conv2d(128, 3, 1, 1, name="moduleTwo_0")(feat)), feat], -1)
        feat = jnp.concatenate([lrelu(Conv2d(96, 3, 1, 1, name="moduleThr_0")(feat)), feat], -1)
        feat = jnp.concatenate([lrelu(Conv2d(64, 3, 1, 1, name="moduleFou_0")(feat)), feat], -1)
        feat = jnp.concatenate([lrelu(Conv2d(32, 3, 1, 1, name="moduleFiv_0")(feat)), feat], -1)
        flow = Conv2d(2, 3, 1, 1, name="moduleSix_0")(feat)
        return {"flow": flow, "feat": feat}


class Refiner(nn.Module):
    """Dilated context network (PWCNet.py:226-252)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = [(128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1)]
        for i, (c, d) in enumerate(cfg):
            x = lrelu(Conv2d(c, 3, 1, d, dilation=d, name=f"moduleMain_{2 * i}")(x))
        return Conv2d(2, 3, 1, 1, name="moduleMain_12")(x)


class PWCNet(nn.Module):
    """PWCNet.forward (PWCNet.py:266-302): resize to /64 multiples, pyramid
    decode coarse→fine, refine, x20 rescale, resize flow to 1/4 input."""

    @nn.compact
    def __call__(self, first: jax.Array, second: jax.Array) -> jax.Array:
        B, H, W, _ = first.shape
        ph = int(math.floor(math.ceil(H / 64.0) * 64.0))
        pw = int(math.floor(math.ceil(W / 64.0) * 64.0))
        f = interpolate_bilinear(first, (ph, pw))
        s = interpolate_bilinear(second, (ph, pw))

        flow_q = self.forward_pre(f, s)
        oh, ow = H // 4, W // 4
        flow = 20.0 * interpolate_bilinear(flow_q, (oh, ow))
        flow = flow * jnp.asarray([ow / pw, oh / ph], flow.dtype)
        return flow

    def forward_pre(self, first: jax.Array, second: jax.Array) -> jax.Array:
        ext = Extractor(name="moduleExtractor")
        p1 = ext(first)
        p2 = ext(second)
        est = Decoder(6, name="moduleSix")(p1[-1], p2[-1], None)
        est = Decoder(5, name="moduleFiv")(p1[-2], p2[-2], est)
        est = Decoder(4, name="moduleFou")(p1[-3], p2[-3], est)
        est = Decoder(3, name="moduleThr")(p1[-4], p2[-4], est)
        est = Decoder(2, name="moduleTwo")(p1[-5], p2[-5], est)
        return est["flow"] + Refiner(name="moduleRefiner")(est["feat"])


# ---------------------------------------------------------------------------
# PWCNet_light (reference OpticalFlow/PWCNet_light.py) — slimmer variant:
# learned InstanceNorm input normalization, 2-conv pyramid levels (192-ch
# top), non-dense decoders without the upsampled-feature skip, no refiner.
# ---------------------------------------------------------------------------

_LIGHT_LEVEL_CHANNELS = [None, None, 81 + 32 + 2, 81 + 64 + 2, 81 + 96 + 2,
                         81 + 128 + 2, 81, None]


class _InstanceNorm2d(nn.Module):
    """torch.nn.InstanceNorm2d(C, affine=True) parity: per-sample,
    per-channel normalization over (H, W) with learned scale/shift."""
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        # named 'kernel' because the port bridge maps torch 'weight'→'kernel'
        w = self.param("kernel", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return (x - mean) / jnp.sqrt(var + self.eps) * w + b


class ExtractorLight(nn.Module):
    """2-conv pyramid levels (PWCNet_light.py:23-78)."""

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        names = ["moduleOne", "moduleTwo", "moduleThr", "moduleFou",
                 "moduleFiv", "moduleSix"]
        chans = [16, 32, 64, 96, 128, 192]
        feats = []
        y = x
        for name, c in zip(names, chans):
            y = lrelu(Conv2d(c, 3, 2, 1, name=f"{name}_0")(y))
            y = lrelu(Conv2d(c, 3, 1, 1, name=f"{name}_2")(y))
            feats.append(y)
        return feats


class DecoderLight(nn.Module):
    """Non-dense decoder (PWCNet_light.py:80-220): feat = [volume | f1 |
    upsampled flow], sequential 128-128-96-64-32 convs, no upfeat skip."""
    level: int

    @nn.compact
    def __call__(self, f1: jax.Array, f2: jax.Array, prev: dict | None):
        if prev is None:
            feat = lrelu(local_corr(f1, f2, 4))
            flow_up = None
        else:
            flow_up = ConvTranspose2d(2, 4, 2, 1, name="moduleUpflow")(prev["flow"])
            warped = _masked_backwarp(f2, flow_up * _BACKWARD_SCALE[self.level + 1])
            vol = lrelu(local_corr(f1, warped, 4))
            feat = jnp.concatenate([vol, f1, flow_up], -1)

        feat = lrelu(Conv2d(128, 3, 1, 1, name="moduleOne_0")(feat))
        feat = lrelu(Conv2d(128, 3, 1, 1, name="moduleTwo_0")(feat))
        feat = lrelu(Conv2d(96, 3, 1, 1, name="moduleThr_0")(feat))
        feat = lrelu(Conv2d(64, 3, 1, 1, name="moduleFou_0")(feat))
        feat = lrelu(Conv2d(32, 3, 1, 1, name="moduleFiv_0")(feat))
        flow = Conv2d(2, 3, 1, 1, name="moduleSix_0")(feat)
        return {"flow": flow, "feat": feat}


class PWCNetLight(nn.Module):
    """PWCNet_light.forward: InstanceNorm inputs, /64 resize, pyramid decode
    (no refiner), x20 rescale, flow at 1/4 input resolution."""

    @nn.compact
    def __call__(self, first: jax.Array, second: jax.Array) -> jax.Array:
        B, H, W, _ = first.shape
        # normalization happens BEFORE the /64 resize (PWCNet_light.py:245-247)
        norm = _InstanceNorm2d(3, name="in_normalize")
        first = norm(first)
        second = norm(second)

        ph = int(math.floor(math.ceil(H / 64.0) * 64.0))
        pw = int(math.floor(math.ceil(W / 64.0) * 64.0))
        f = interpolate_bilinear(first, (ph, pw))
        s = interpolate_bilinear(second, (ph, pw))

        if self.is_initializing():
            # constructed-but-unused Refiner (PWCNet_light.py:238) so light
            # checkpoints port cleanly
            _ = Refiner(name="moduleRefiner")(
                jnp.zeros((1, 1, 1, 81 + 32 + 2), first.dtype))

        ext = ExtractorLight(name="moduleExtractor")
        p1 = ext(f)
        p2 = ext(s)
        est = DecoderLight(6, name="moduleSix")(p1[-1], p2[-1], None)
        est = DecoderLight(5, name="moduleFiv")(p1[-2], p2[-2], est)
        est = DecoderLight(4, name="moduleFou")(p1[-3], p2[-3], est)
        est = DecoderLight(3, name="moduleThr")(p1[-4], p2[-4], est)
        est = DecoderLight(2, name="moduleTwo")(p1[-5], p2[-5], est)
        flow_q = est["flow"]

        oh, ow = H // 4, W // 4
        flow = 20.0 * interpolate_bilinear(flow_q, (oh, ow))
        return flow * jnp.asarray([ow / pw, oh / ph], flow.dtype)
