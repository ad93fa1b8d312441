"""Pyramid-Cascading-Deformable alignment stack (reference
models/modules/Ours.py:27-346 + DCNv2/dcn_v2.py:110-140), NHWC flax.

Contains: DCNSep (DCN_sep — offsets/mask predicted from a *different*
feature than the deformed input), TMB temporal modulation, PCD_Align
(3-level bidirectional alignment), Easy_PCD, DeformableConvLSTM and
BiDeformableConvLSTM.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from motif_tpu.models.layers import Conv2d, ConvLSTMCell, lrelu
from motif_tpu.ops.dcn import dcn_v2
from motif_tpu.ops.resize import interpolate_bilinear


def _dcn_weight_init(key, shape, dtype=jnp.float32):
    """DCNv2.reset_parameters (dcn_v2.py:69-75): U(-s, s), s=1/sqrt(Cin*k*k).
    flax kernel shape (kh, kw, Cin, Cout)."""
    n = int(np.prod(shape[:-1]))
    stdv = 1.0 / np.sqrt(n)
    return jax.random.uniform(key, shape, dtype, -stdv, stdv)


class DCNSep(nn.Module):
    """DCN_sep (dcn_v2.py:110-140): conv_offset_mask(fea) → (o1,o2,mask)
    chunks; offset = concat(o1,o2) interpreted per-group interleaved (y,x);
    mask sigmoided; then modulated deformable conv of `input`."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    deformable_groups: int = 8

    @nn.compact
    def __call__(self, x: jax.Array, fea: jax.Array) -> jax.Array:
        K, G = self.kernel_size, self.deformable_groups
        com = Conv2d(G * 3 * K * K, K, self.stride, self.padding,
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     name="conv_offset_mask")(fea)
        o1 = com[..., : G * K * K]
        o2 = com[..., G * K * K: 2 * G * K * K]
        mask = jax.nn.sigmoid(com[..., 2 * G * K * K:])
        # concat(o1, o2) channel c is read by the CUDA kernel as
        # c = g*2KK + 2k + {0:y, 1:x} — identical to ops.dcn's
        # (g, k, [y, x]) fastest-last layout.
        offset = jnp.concatenate([o1, o2], axis=-1)

        cin = x.shape[-1]
        weight = self.param("kernel", _dcn_weight_init,
                            (K, K, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return dcn_v2(x, offset, mask, weight, bias,
                      kernel_size=K, stride=self.stride, padding=self.padding,
                      dilation=self.dilation, deformable_groups=G)


class TMB(nn.Module):
    """Temporal modulation block (Ours.py:27-50; the reference hardcodes
    64 == nf channels)."""
    nf: int = 64

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array) -> jax.Array:
        f = Conv2d(self.nf, 3, 1, 1, name="f_process_0")(x)
        f = lrelu(f)
        f = Conv2d(self.nf, 3, 1, 1, name="f_process_2")(f)
        f = lrelu(f)
        m = Conv2d(self.nf, 1, 1, 0, use_bias=False, name="t_process_0")(t)
        m = lrelu(m)
        m = Conv2d(self.nf, 1, 1, 0, use_bias=False, name="t_process_2")(m)
        m = lrelu(m)
        m = Conv2d(self.nf, 1, 1, 0, use_bias=False, name="t_process_4")(m)
        m = lrelu(m)
        return f * m


class PCDAlign(nn.Module):
    """PCD_Align (Ours.py:53-172): bidirectional 3-level deformable
    alignment. fea1/fea2 are [L1, L2, L3] NHWC pyramids. Optional temporal
    modulation via t/t_back (TMNet-style; unused by the MoTIF encoder)."""
    nf: int = 64
    groups: int = 8
    use_time: bool = True

    @nn.compact
    def __call__(self, fea1: Sequence[jax.Array], fea2: Sequence[jax.Array],
                 t: jax.Array | None = None, t_back: jax.Array | None = None) -> jax.Array:
        nf, g = self.nf, self.groups

        def up2(x):
            return interpolate_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2), False)

        def branch(a, b, sfx, tt):
            # L3
            l3_off = jnp.concatenate([a[2], b[2]], -1)
            l3_off = lrelu(Conv2d(nf, 3, 1, 1, name=f"L3_offset_conv1_{sfx}")(l3_off))
            l3_off_c = lrelu(Conv2d(nf, 3, 1, 1, name=f"L3_offset_conv2_{sfx}")(l3_off))
            if tt is not None:
                l3_off_c = l3_off_c + TMB(nf, name=f"TMB_{'A' if sfx == '1' else 'B'}_l3")(l3_off, tt)
            l3_fea = lrelu(DCNSep(nf, deformable_groups=g, name=f"L3_dcnpack_{sfx}")(a[2], l3_off_c))
            # L2
            l2_off = jnp.concatenate([a[1], b[1]], -1)
            l2_off = lrelu(Conv2d(nf, 3, 1, 1, name=f"L2_offset_conv1_{sfx}")(l2_off))
            l3_up = up2(l3_off_c)
            l2_off = lrelu(Conv2d(nf, 3, 1, 1, name=f"L2_offset_conv2_{sfx}")(
                jnp.concatenate([l2_off, l3_up * 2.0], -1)))
            l2_off_c = lrelu(Conv2d(nf, 3, 1, 1, name=f"L2_offset_conv3_{sfx}")(l2_off))
            if tt is not None:
                l2_off_c = l2_off_c + TMB(nf, name=f"TMB_{'A' if sfx == '1' else 'B'}_l2")(l2_off, tt)
            l2_fea = DCNSep(nf, deformable_groups=g, name=f"L2_dcnpack_{sfx}")(a[1], l2_off_c)
            l3_fea_up = up2(l3_fea)
            l2_fea = lrelu(Conv2d(nf, 3, 1, 1, name=f"L2_fea_conv_{sfx}")(
                jnp.concatenate([l2_fea, l3_fea_up], -1)))
            # L1
            l1_off = jnp.concatenate([a[0], b[0]], -1)
            l1_off = lrelu(Conv2d(nf, 3, 1, 1, name=f"L1_offset_conv1_{sfx}")(l1_off))
            l2_up = up2(l2_off_c)
            l1_off = lrelu(Conv2d(nf, 3, 1, 1, name=f"L1_offset_conv2_{sfx}")(
                jnp.concatenate([l1_off, l2_up * 2.0], -1)))
            l1_off_c = lrelu(Conv2d(nf, 3, 1, 1, name=f"L1_offset_conv3_{sfx}")(l1_off))
            if tt is not None:
                l1_off_c = l1_off_c + TMB(nf, name=f"TMB_{'A' if sfx == '1' else 'B'}_l1")(l1_off, tt)
            l1_fea = DCNSep(nf, deformable_groups=g, name=f"L1_dcnpack_{sfx}")(a[0], l1_off_c)
            l2_fea_up = up2(l2_fea)
            l1_fea = Conv2d(nf, 3, 1, 1, name=f"L1_fea_conv_{sfx}")(
                jnp.concatenate([l1_fea, l2_fea_up], -1))
            return l1_fea

        y1 = branch(fea1, fea2, "1", t)
        y2 = branch(fea2, fea1, "2", t_back)
        return jnp.concatenate([y1, y2], axis=-1)


class EasyPCD(nn.Module):
    """Easy_PCD (Ours.py:175-210): build 3-level pyramids of two features,
    PCD-align, fuse with a 1x1 conv."""
    nf: int = 64
    groups: int = 8

    @nn.compact
    def __call__(self, f1: jax.Array, f2: jax.Array) -> jax.Array:
        B, H, W, C = f1.shape
        l1 = jnp.concatenate([f1, f2], axis=0)  # stack both frames in batch
        l2 = lrelu(Conv2d(self.nf, 3, 2, 1, name="fea_L2_conv1")(l1))
        l2 = lrelu(Conv2d(self.nf, 3, 1, 1, name="fea_L2_conv2")(l2))
        l3 = lrelu(Conv2d(self.nf, 3, 2, 1, name="fea_L3_conv1")(l2))
        l3 = lrelu(Conv2d(self.nf, 3, 1, 1, name="fea_L3_conv2")(l3))
        fea1 = [l1[:B], l2[:B], l3[:B]]
        fea2 = [l1[B:], l2[B:], l3[B:]]
        aligned = PCDAlign(self.nf, self.groups, name="pcd_align")(fea1, fea2)
        return Conv2d(self.nf, 1, 1, 0, name="fusion")(aligned)


class DeformableConvLSTM(nn.Module):
    """DeformableConvLSTM (Ours.py:213-307), single layer: at each step the
    hidden/cell states are PCD-aligned to the current input before the
    ConvLSTM cell update.

    The T recurrent steps share all parameters, so the time loop runs as ONE
    nn.scan body (compile time O(1) in T — a 7-step unroll of the full
    EasyPCD graph dominated cold XLA compile) with carry (h, c).
    """
    nf: int
    groups: int
    kernel_size: tuple[int, int] = (3, 3)

    def setup(self):
        # The reference's pcd_h and pcd_c (Ours.py:230-231) are two
        # independent EasyPCD stacks applied to (xt, h) and (xt, c) at every
        # recurrent step. Kept as SEPARATE modules (same param tree as the
        # torch side): an nn.vmap'd fold with a leading [h, c] param axis
        # measured 26% SLOWER on v5e (per-entry conv weights defeat XLA's
        # conv batching — 65.7 vs 52.2 ms for the T=3 BiLSTM), and a shared
        # batch-fold is throughput-bound too at these sizes.
        self.pcd_h = EasyPCD(self.nf, self.groups)
        self.pcd_c = EasyPCD(self.nf, self.groups)
        self.cell_list_0 = ConvLSTMCell(self.nf, self.kernel_size)

    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, T, H, W, C) → outputs (B, T, H, W, C)."""
        B, T, H, W, C = x.shape
        h0 = jnp.zeros((B, H, W, self.nf), x.dtype)
        c0 = jnp.zeros((B, H, W, self.nf), x.dtype)

        def step(mod, carry, xt):
            h, c = carry
            h2, c2 = mod.cell_list_0(xt, (mod.pcd_h(xt, h), mod.pcd_c(xt, c)))
            return (h2, c2), h2

        from motif_tpu.models.layers import scan_unroll
        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1, out_axes=1,
                       unroll=scan_unroll(T))
        _, outs = scan(self, (h0, c0), x)
        return outs


class BiDeformableConvLSTM(nn.Module):
    """BiDeformableConvLSTM (Ours.py:310-346): the SAME forward_net runs the
    sequence forwards and backwards; outputs concatenated and fused 1x1."""
    nf: int
    groups: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        net = DeformableConvLSTM(self.nf, self.groups, name="forward_net")
        # The reference runs the SAME forward_net over the sequence twice
        # (forwards, then reversed). The two passes share parameters and are
        # independent, so they ride ONE pass as batch entries — TPU executes
        # ops serially, and the recurrent chain is the encoder's critical
        # path, so this halves the sequential step count exactly.
        B = x.shape[0]
        both_dirs = net(jnp.concatenate([x, x[:, ::-1]], axis=0))
        out_fwd = both_dirs[:B]
        out_rev = both_dirs[B:][:, ::-1]
        both = jnp.concatenate([out_fwd, out_rev], axis=-1)
        B, T, H, W, C2 = both.shape
        fused = Conv2d(self.nf, 1, 1, 0, name="conv_1x1")(both.reshape(B * T, H, W, C2))
        return fused.reshape(B, T, H, W, self.nf)
