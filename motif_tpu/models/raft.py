"""RAFT-small optical flow (reference models/core/: raft.py, extractor.py,
update.py, corr.py), NHWC flax with a lax.scan update loop.

Configuration fixed to MoTIF's usage (Ours.py:417-421): small=True,
mixed_precision=False → hidden=96, context=64, corr_levels=4, corr_radius=3.
The reference's AlternateCorrBlock (prebuilt alt_cuda_corr .so) computes the
same values as the pure CorrBlock; we use the all-pairs einsum + pyramid
lookup from ops/corr.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from motif_tpu.models.layers import Conv2d, instance_norm, kaiming_normal_fan_out
from motif_tpu.ops.corr import all_pairs_corr, corr_lookup, corr_pyramid
from motif_tpu.ops.resize import interpolate_bilinear


def _conv(features, k, stride=1, pad=0, name=None):
    return Conv2d(features, k, stride, pad, kernel_init=kaiming_normal_fan_out(),
                  name=name)


class BottleneckBlock(nn.Module):
    """extractor.py:60-116 — 1x1 → 3x3(stride) → 1x1 with residual."""
    planes: int
    norm_fn: str = "instance"
    stride: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        def norm(v):
            return instance_norm(v) if self.norm_fn == "instance" else v

        y = jax.nn.relu(norm(_conv(self.planes // 4, 1, name="conv1")(x)))
        y = jax.nn.relu(norm(_conv(self.planes // 4, 3, self.stride, 1, name="conv2")(y)))
        y = jax.nn.relu(norm(_conv(self.planes, 1, name="conv3")(y)))
        if self.stride != 1:
            x = norm(_conv(self.planes, 1, self.stride, name="downsample_0")(x))
        return jax.nn.relu(x + y)


class BatchNormEval(nn.Module):
    """torch nn.BatchNorm2d in eval mode: normalize by the checkpointed
    running stats (the reference RAFT never trains BN here — weights come
    from a ckpt and MoTIF wraps the whole flow net in no_grad). Param names
    match the ported torch keys (weight→kernel)."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        C = x.shape[-1]
        scale = self.param("kernel", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        mean = self.param("running_mean", nn.initializers.zeros, (C,))
        var = self.param("running_var", nn.initializers.ones, (C,))
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return ((x - mean) * inv + bias).astype(x.dtype)


class GroupNorm(nn.Module):
    """torch nn.GroupNorm (affine)."""
    num_groups: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, C = x.shape
        g = self.num_groups
        scale = self.param("kernel", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        acc = jnp.promote_types(x.dtype, jnp.float32)
        xg = x.reshape(B, H, W, g, C // g).astype(acc)
        mean = xg.mean(axis=(1, 2, 4), keepdims=True)
        var = xg.var(axis=(1, 2, 4), keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.eps)
        return (xg.reshape(B, H, W, C) * scale + bias).astype(x.dtype)


def _norm(kind: str, planes: int, name: str):
    """ResidualBlock/BasicEncoder norm dispatch (extractor.py:14-46)."""
    if kind == "instance":
        return lambda v: instance_norm(v)
    if kind == "batch":
        bn = BatchNormEval(name=name)
        return bn
    if kind == "group":
        return GroupNorm(planes // 8, name=name)
    return lambda v: v


class ResidualBlock(nn.Module):
    """extractor.py:6-57 — 3x3/3x3 residual block with norm + optional
    strided 1x1 downsample (norm3 inside the Sequential → 'downsample_1')."""
    planes: int
    norm_fn: str = "instance"
    stride: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = jax.nn.relu(_norm(self.norm_fn, self.planes, "norm1")(
            _conv(self.planes, 3, self.stride, 1, name="conv1")(x)))
        y = jax.nn.relu(_norm(self.norm_fn, self.planes, "norm2")(
            _conv(self.planes, 3, 1, 1, name="conv2")(y)))
        if self.stride != 1:
            x = _norm(self.norm_fn, self.planes, "downsample_1")(
                _conv(self.planes, 1, self.stride, name="downsample_0")(x))
        return jax.nn.relu(x + y)


class BasicEncoder(nn.Module):
    """extractor.py:118-193 — the non-small RAFT encoder (64→96→128)."""
    output_dim: int = 128
    norm_fn: str = "batch"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = _conv(64, 7, 2, 3, name="conv1")(x)
        y = jax.nn.relu(_norm(self.norm_fn, 64, "norm1")(y))
        for i, (dim, stride) in enumerate([(64, 1), (96, 2), (128, 2)], start=1):
            y = ResidualBlock(dim, self.norm_fn, stride, name=f"layer{i}_0")(y)
            y = ResidualBlock(dim, self.norm_fn, 1, name=f"layer{i}_1")(y)
        return _conv(self.output_dim, 1, name="conv2")(y)


class SmallEncoder(nn.Module):
    """extractor.py:195-267 — 1/8-resolution feature encoder."""
    output_dim: int = 128
    norm_fn: str = "instance"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = _conv(32, 7, 2, 3, name="conv1")(x)
        if self.norm_fn == "instance":
            y = instance_norm(y)
        y = jax.nn.relu(y)
        for i, (dim, stride) in enumerate([(32, 1), (64, 2), (96, 2)], start=1):
            y = BottleneckBlock(dim, self.norm_fn, stride, name=f"layer{i}_0")(y)
            y = BottleneckBlock(dim, self.norm_fn, 1, name=f"layer{i}_1")(y)
        return _conv(self.output_dim, 1, name="conv2")(y)


class ConvGRU(nn.Module):
    """update.py:16-31."""
    hidden_dim: int = 96

    @nn.compact
    def __call__(self, h: jax.Array, x: jax.Array) -> jax.Array:
        hx = jnp.concatenate([h, x], axis=-1)
        z = jax.nn.sigmoid(Conv2d(self.hidden_dim, 3, 1, 1, name="convz")(hx))
        r = jax.nn.sigmoid(Conv2d(self.hidden_dim, 3, 1, 1, name="convr")(hx))
        q = jnp.tanh(Conv2d(self.hidden_dim, 3, 1, 1, name="convq")(
            jnp.concatenate([r * h, x], axis=-1)))
        return (1 - z) * h + z * q


class SmallMotionEncoder(nn.Module):
    """update.py:62-77 (cor_planes = 4 * 7^2 = 196)."""

    @nn.compact
    def __call__(self, flow: jax.Array, corr: jax.Array) -> jax.Array:
        cor = jax.nn.relu(Conv2d(96, 1, 1, 0, name="convc1")(corr))
        flo = jax.nn.relu(Conv2d(64, 7, 1, 3, name="convf1")(flow))
        flo = jax.nn.relu(Conv2d(32, 3, 1, 1, name="convf2")(flo))
        out = jax.nn.relu(Conv2d(80, 3, 1, 1, name="conv")(
            jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class FlowHead(nn.Module):
    """update.py:6-14."""
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = jax.nn.relu(Conv2d(self.hidden_dim, 3, 1, 1, name="conv1")(x))
        return Conv2d(2, 3, 1, 1, name="conv2")(y)


class SepConvGRU(nn.Module):
    """update.py:33-59 — separable (1,5)/(5,1) two-pass ConvGRU."""
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, h: jax.Array, x: jax.Array) -> jax.Array:
        for ax in ("1", "2"):
            k = (1, 5) if ax == "1" else (5, 1)
            p = (0, 2) if ax == "1" else (2, 0)
            hx = jnp.concatenate([h, x], axis=-1)
            z = jax.nn.sigmoid(Conv2d(self.hidden_dim, k, 1, p, name=f"convz{ax}")(hx))
            r = jax.nn.sigmoid(Conv2d(self.hidden_dim, k, 1, p, name=f"convr{ax}")(hx))
            q = jnp.tanh(Conv2d(self.hidden_dim, k, 1, p, name=f"convq{ax}")(
                jnp.concatenate([r * h, x], axis=-1)))
            h = (1 - z) * h + z * q
        return h


class BasicMotionEncoder(nn.Module):
    """update.py:79-97 (cor_planes = 4 * 9^2 = 324 at radius 4)."""

    @nn.compact
    def __call__(self, flow: jax.Array, corr: jax.Array) -> jax.Array:
        cor = jax.nn.relu(Conv2d(256, 1, 1, 0, name="convc1")(corr))
        cor = jax.nn.relu(Conv2d(192, 3, 1, 1, name="convc2")(cor))
        flo = jax.nn.relu(Conv2d(128, 7, 1, 3, name="convf1")(flow))
        flo = jax.nn.relu(Conv2d(64, 3, 1, 1, name="convf2")(flo))
        out = jax.nn.relu(Conv2d(126, 3, 1, 1, name="conv")(
            jnp.concatenate([cor, flo], axis=-1)))
        return jnp.concatenate([out, flow], axis=-1)


class BasicUpdateBlock(nn.Module):
    """update.py:114-135 — returns (net, up_mask, delta); the mask drives
    convex-combination upsampling (raft.py:72-83)."""
    hidden_dim: int = 128

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = BasicMotionEncoder(name="encoder")(flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.hidden_dim, name="gru")(net, x)
        delta = FlowHead(256, name="flow_head")(net)
        m = jax.nn.relu(Conv2d(256, 3, 1, 1, name="mask_0")(net))
        mask = 0.25 * Conv2d(64 * 9, 1, 1, 0, name="mask_2")(m)
        return net, mask, delta


class SmallUpdateBlock(nn.Module):
    """update.py:99-112."""
    hidden_dim: int = 96

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = SmallMotionEncoder(name="encoder")(flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = ConvGRU(self.hidden_dim, name="gru")(net, x)
        delta = FlowHead(128, name="flow_head")(net)
        return net, delta


def coords_grid(B: int, H: int, W: int) -> jax.Array:
    """(B, H, W, 2) pixel coordinate grid, channels (x, y)
    (models/core/utils/utils.py:74-77)."""
    gx = jnp.broadcast_to(jnp.arange(W, dtype=jnp.float32)[None, :], (H, W))
    gy = jnp.broadcast_to(jnp.arange(H, dtype=jnp.float32)[:, None], (H, W))
    g = jnp.stack([gx, gy], axis=-1)
    return jnp.broadcast_to(g[None], (B, H, W, 2))


def upflow8(flow: jax.Array) -> jax.Array:
    """8x bilinear upsample (align_corners=True) and scale values by 8
    (utils.py:80-83)."""
    B, H, W, _ = flow.shape
    return 8.0 * interpolate_bilinear(flow, (8 * H, 8 * W), align_corners=True)


def upsample_flow_convex(flow: jax.Array, mask: jax.Array) -> jax.Array:
    """Convex-combination 8x upsampling (raft.py:72-83, non-small path).

    flow (B, H, W, 2) coarse; mask (B, H, W, 64*9) with torch channel layout
    c = k*64 + ry*8 + rx over the 3x3 neighborhood k=(dy+1)*3+(dx+1).
    """
    B, H, W, _ = flow.shape
    m = mask.reshape(B, H, W, 9, 8, 8)
    m = jax.nn.softmax(m, axis=3)
    fp = jnp.pad(8.0 * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    nb = jnp.stack([fp[:, 1 + dy: 1 + dy + H, 1 + dx: 1 + dx + W]
                    for dy in (-1, 0, 1) for dx in (-1, 0, 1)], axis=3)
    out = jnp.einsum("bhwkyx,bhwkc->bhwyxc", m, nb)      # (B,H,W,8,8,2)
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(B, 8 * H, 8 * W, 2)


class RAFT(nn.Module):
    """RAFT (raft.py:24-144). __call__ takes images in [0, 255] (the
    reference rescales internally, raft.py:89-90) and returns the final
    1/1-resolution flow (the [-1] entry of the reference's prediction list).

    small=True (MoTIF's configuration, Ours.py:417-421): hidden 96 /
    context 64 / radius 3, SmallEncoder + SmallUpdateBlock, upflow8.
    small=False (raft.py:35-39,55-56): hidden=context=128, radius 4,
    BasicEncoder + BasicUpdateBlock with convex-combination upsampling.
    """
    small: bool = True
    corr_levels: int = 4

    def setup(self):
        hdim = 96 if self.small else 128
        cdim = 64 if self.small else 128
        self._hdim, self._cdim = hdim, cdim
        if self.small:
            self.fnet = SmallEncoder(128, "instance")
            self.cnet = SmallEncoder(hdim + cdim, "none")
            self.update_block = SmallUpdateBlock(hdim)
        else:
            self.fnet = BasicEncoder(256, "instance")
            self.cnet = BasicEncoder(hdim + cdim, "batch")
            self.update_block = BasicUpdateBlock(hdim)

    def __call__(self, image1: jax.Array, image2: jax.Array, iters: int = 12,
                 return_all: bool = False):
        img1 = 2.0 * (image1 / 255.0) - 1.0
        img2 = 2.0 * (image2 / 255.0) - 1.0
        hdim = self._hdim
        radius = 3 if self.small else 4

        B = img1.shape[0]
        fmaps = self.fnet(jnp.concatenate([img1, img2], axis=0))
        fmap1, fmap2 = fmaps[:B], fmaps[B:]

        pyramid = corr_pyramid(all_pairs_corr(fmap1, fmap2), self.corr_levels)

        c = self.cnet(img1)
        net = jnp.tanh(c[..., :hdim])
        inp = jax.nn.relu(c[..., hdim:])

        H8, W8 = fmap1.shape[1], fmap1.shape[2]
        coords0 = coords_grid(B, H8, W8)
        # coords accumulate at >= fp32 regardless of compute dtype: the
        # reference creates the grid f32 (utils.py:74-77) and torch's
        # `coords1 + delta_flow` promotes to the model dtype, so under the
        # fp64 parity harness coords ride f64 while under bf16 serving they
        # stay f32. result_type(f32, img) reproduces exactly that.
        acc_dtype = jnp.result_type(jnp.float32, img1.dtype)
        coords_init = coords0.astype(acc_dtype)

        # All GRU iterations share the update block's params, so the iter
        # loop runs as ONE nn.scan body — compile time O(1) in iters (the
        # reference unrolls in torch where tracing is free; each unrolled
        # iteration here replays the corr-lookup + GRU conv graph).
        def step(mod, carry, _):
            net_c, coords1 = carry
            coords1 = jax.lax.stop_gradient(coords1)  # raft.py:123 detach
            # coords/flow positions accumulate in fp32 even under bf16
            # compute; the update-block inputs follow the image dtype so
            # the GRU convs stay in the compute dtype.
            corr = corr_lookup(pyramid, coords1, radius).astype(img1.dtype)
            flow = (coords1 - coords0).astype(img1.dtype)
            if mod.small:
                net_c, delta = mod.update_block(net_c, inp, corr, flow)
                up_mask = jnp.zeros((), img1.dtype)  # unused on the small path
            else:
                net_c, up_mask, delta = mod.update_block(net_c, inp, corr, flow)
            coords1 = coords1 + delta.astype(coords1.dtype)
            return (net_c, coords1), (coords1 - coords0, up_mask)

        from motif_tpu.models.layers import scan_unroll
        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False}, length=iters,
                       unroll=scan_unroll(iters))
        (_, coords1), (lowres, up_masks) = scan(self, (net, coords_init), None)

        if self.small:
            flow_up = upflow8(coords1 - coords0)
        else:
            flow_up = upsample_flow_convex(coords1 - coords0, up_masks[-1])
        if return_all:
            return flow_up, lowres
        return flow_up
