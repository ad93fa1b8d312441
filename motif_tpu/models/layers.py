"""Shared building blocks (reference models/modules/module_util.py and
friends), as flax.linen modules in NHWC.

Naming contract for checkpoint porting: every submodule is named exactly
after its torch attribute path with numeric Sequential/ModuleList indices
merged via underscore ("feature_extraction.0.conv1" → "feature_extraction_0"
/ "conv1"), so motif_tpu/checkpoint.py can map reference state dicts
mechanically.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def lrelu(x: jax.Array, negative_slope: float = 0.1) -> jax.Array:
    """nn.LeakyReLU(negative_slope=0.1) — the reference's default."""
    return jnp.where(x >= 0, x, x * negative_slope)


def kaiming_normal_fan_in(scale: float = 1.0):
    """torch init.kaiming_normal_(a=0, mode='fan_in') (+ optional rescale),
    matching module_util.initialize_weights (module_util.py:7-24).

    torch fan_in for conv = Cin * kh * kw; gain for a=0 is sqrt(2).
    flax kernel shape (kh, kw, Cin, Cout).
    """
    def init(key, shape, dtype=jnp.float32):
        fan_in = int(np.prod(shape[:-1]))
        std = np.sqrt(2.0 / fan_in) * scale
        return jax.random.normal(key, shape, dtype) * std
    return init


def kaiming_normal_fan_out():
    """torch init.kaiming_normal_(mode='fan_out', nonlinearity='relu') —
    used by the RAFT encoders (models/core/extractor.py:150-157)."""
    def init(key, shape, dtype=jnp.float32):
        fan_out = int(np.prod(shape[:2])) * shape[-1]
        std = np.sqrt(2.0 / fan_out)
        return jax.random.normal(key, shape, dtype) * std
    return init


def conv_default_init():
    """torch nn.Conv2d default init: kaiming_uniform(a=sqrt(5)) on weight
    → U(-1/sqrt(fan_in), 1/sqrt(fan_in)) effectively (gain sqrt(2/(1+5))
    = 1/sqrt(3), bound = gain*sqrt(3/fan_in) = 1/sqrt(fan_in))."""
    def init(key, shape, dtype=jnp.float32):
        fan_in = int(np.prod(shape[:-1]))
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def bias_default_init(fan_in: int):
    """torch default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class Conv2d(nn.Module):
    """torch nn.Conv2d equivalent (NHWC, HWIO kernel named 'kernel').

    padding is an int (torch symmetric zero padding) or 'reflect' pairs via
    padding_mode.
    """
    features: int
    kernel_size: int | tuple[int, int] = 3
    stride: int | tuple[int, int] = 1
    padding: int | tuple[int, int] = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    padding_mode: str = "zeros"
    kernel_init: Callable | None = None
    bias_init: Callable | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ks = self.kernel_size if isinstance(self.kernel_size, tuple) else (self.kernel_size,) * 2
        st = self.stride if isinstance(self.stride, tuple) else (self.stride,) * 2
        pd = self.padding if isinstance(self.padding, tuple) else (self.padding,) * 2
        cin = x.shape[-1]
        fan_in = (cin // self.groups) * ks[0] * ks[1]
        kinit = self.kernel_init or conv_default_init()
        binit = self.bias_init or bias_default_init(fan_in)

        if self.padding_mode == "reflect" and (pd[0] or pd[1]):
            x = jnp.pad(x, ((0, 0), (pd[0], pd[0]), (pd[1], pd[1]), (0, 0)), mode="reflect")
            pad_arg = "VALID"
        else:
            pad_arg = ((pd[0], pd[0]), (pd[1], pd[1]))

        kernel = self.param("kernel", kinit, ks + (cin // self.groups, self.features))
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype),
            window_strides=st,
            padding=pad_arg,
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            bias = self.param("bias", binit, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class Linear(nn.Module):
    """torch nn.Linear equivalent (kernel stored (in, out))."""
    features: int
    use_bias: bool = True
    kernel_init: Callable | None = None
    bias_init: Callable | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]

        def default_kinit(key, shape, dtype=jnp.float32):
            bound = 1.0 / np.sqrt(shape[0])
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kinit = self.kernel_init or default_kinit
        binit = self.bias_init or bias_default_init(cin)
        kernel = self.param("kernel", kinit, (cin, self.features))
        y = jnp.einsum("...i,io->...o", x, kernel.astype(x.dtype))
        if self.use_bias:
            y = y + self.param("bias", binit, (self.features,)).astype(y.dtype)
        return y


class ResidualBlockNoBN(nn.Module):
    """ResidualBlock_noBN (module_util.py:34-52): conv-relu-conv + skip,
    kaiming fan_in init scaled by 0.1, zero bias init."""
    nf: int = 64

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        conv1 = Conv2d(self.nf, 3, 1, 1, kernel_init=kaiming_normal_fan_in(0.1),
                       bias_init=nn.initializers.zeros, name="conv1")
        conv2 = Conv2d(self.nf, 3, 1, 1, kernel_init=kaiming_normal_fan_in(0.1),
                       bias_init=nn.initializers.zeros, name="conv2")
        return x + conv2(jax.nn.relu(conv1(x)))


class _ResBlockScanStep(nn.Module):
    """One ResidualBlockNoBN body in (carry, _) -> (carry, None) form for
    nn.scan."""
    nf: int

    @nn.compact
    def __call__(self, x: jax.Array, _):
        conv1 = Conv2d(self.nf, 3, 1, 1, kernel_init=kaiming_normal_fan_in(0.1),
                       bias_init=nn.initializers.zeros, name="conv1")
        conv2 = Conv2d(self.nf, 3, 1, 1, kernel_init=kaiming_normal_fan_in(0.1),
                       bias_init=nn.initializers.zeros, name="conv2")
        return x + conv2(jax.nn.relu(conv1(x))), None


_SCAN_UNROLL_OVERRIDE: str | None = None


def set_scan_unroll(mode: str | None) -> None:
    """Override the trunk-scan unroll policy for graphs whose target backend
    differs from the process default (e.g. AOT-lowering a TPU program on a
    CPU host): 'full' always unrolls, 'rolled' never does, None restores the
    default keyed off jax.default_backend()."""
    global _SCAN_UNROLL_OVERRIDE
    assert mode in (None, "full", "rolled"), mode
    _SCAN_UNROLL_OVERRIDE = mode


def scan_unroll(n: int) -> int:
    """lax.scan unroll factor for the stacked-weight trunk scans: full unroll
    on accelerators (XLA fuses/pipelines the straight-line graph — the rolled
    scan form measured ~15% slower end-to-end on v5e), rolled on CPU where
    the 40-deep unrolled optimization pass dominates cold compile on a
    1-core box (the multichip-driver-timeout fix). Same math and the same
    stacked param layout either way — only the lax.scan unroll knob.
    Cross-backend lowering can pin the choice via set_scan_unroll()."""
    if _SCAN_UNROLL_OVERRIDE is not None:
        return n if _SCAN_UNROLL_OVERRIDE == "full" else 1
    return n if jax.default_backend() != "cpu" else 1


class ResBlocks(nn.Module):
    """A stack of n ResidualBlockNoBN compiled as ONE lax.scan body with the
    per-block weights stacked on a leading axis — numerically identical to n
    unrolled blocks but with O(1)-in-depth trace time (the reference's
    make_layer Sequential, module_util.py:27-31, unrolls in torch where
    tracing is free); on accelerators the scan is fully unrolled again for
    runtime (see scan_unroll).

    Param layout: <name>/block/conv{1,2}/{kernel,bias} with leading axis
    n_blocks; checkpoint.py::_stack_scanned_blocks restacks torch's
    <name>.{i}.* families (and old unrolled orbax trees) into this layout.
    """
    nf: int
    n_blocks: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scan = nn.scan(
            _ResBlockScanStep,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.n_blocks,
            unroll=scan_unroll(self.n_blocks),
        )(self.nf, name="block")
        y, _ = scan(x, None)
        return y


class LateralBlock(nn.Module):
    """LateralBlock (Ours.py:861-871): conv-lrelu-conv + skip, default init."""
    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = Conv2d(self.dim, 3, 1, 1, name="layers_0")(x)
        y = lrelu(y)
        y = Conv2d(self.dim, 3, 1, 1, name="layers_2")(y)
        return x + y


class ConvLSTMCell(nn.Module):
    """ConvLSTMCell (models/modules/convlstm.py:6-58): single conv producing
    i, f, o, g gates (split order matters for porting)."""
    hidden_dim: int
    kernel_size: tuple[int, int] = (3, 3)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, state: tuple[jax.Array, jax.Array]):
        h, c = state
        combined = jnp.concatenate([x, h], axis=-1)
        pad = (self.kernel_size[0] // 2, self.kernel_size[1] // 2)
        gates = Conv2d(4 * self.hidden_dim, self.kernel_size, 1, pad,
                       use_bias=self.use_bias, name="conv")(combined)
        cc_i, cc_f, cc_o, cc_g = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(cc_i)
        f = jax.nn.sigmoid(cc_f)
        o = jax.nn.sigmoid(cc_o)
        g = jnp.tanh(cc_g)
        c_next = f * c + i * g
        h_next = o * jnp.tanh(c_next)
        return h_next, c_next


def pixel_shuffle(x: jax.Array, r: int = 2) -> jax.Array:
    """torch nn.PixelShuffle parity in NHWC: channel index (c, ry, rx)
    fastest-last → out[b, h*r+ry, w*r+rx, c]."""
    B, H, W, C = x.shape
    c = C // (r * r)
    x = x.reshape(B, H, W, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(B, H * r, W * r, c)


def max_pool2d(x: jax.Array, window: int = 3, stride: int = 2, padding: int = 1) -> jax.Array:
    """torch nn.MaxPool2d parity (NHWC)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, window, window, 1), (1, stride, stride, 1),
        ((0, 0), (padding, padding), (padding, padding), (0, 0)))


def avg_pool2d_padded(x: jax.Array, window: int = 3, stride: int = 2,
                      padding: int = 1) -> jax.Array:
    """torch nn.AvgPool2d parity with count_include_pad=True (the default):
    zero padding counts in the denominator."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        (1, window, window, 1), (1, stride, stride, 1),
        ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    return s / float(window * window)


class ConvTranspose2d(nn.Module):
    """torch nn.ConvTranspose2d equivalent (kernel stored HWIO like Conv2d;
    ported from torch's (in, out, kh, kw) by checkpoint.py's 4-D transpose
    then flipped here). Output size = (H-1)*stride - 2*padding + kernel."""
    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, s, p = self.kernel_size, self.stride, self.padding
        cin = x.shape[-1]

        def kinit(key, shape, dtype=jnp.float32):
            # torch default: U(-1/sqrt(fan_in), ..) with fan_in = Cout*k*k
            bound = 1.0 / np.sqrt(self.features * k * k)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param("kernel", kinit, (k, k, cin, self.features))
        # transposed conv = dilated-input conv with flipped kernel
        y = jax.lax.conv_general_dilated(
            x, jnp.flip(kernel, (0, 1)).astype(x.dtype),
            window_strides=(1, 1),
            padding=((k - 1 - p, k - 1 - p), (k - 1 - p, k - 1 - p)),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        bias = self.param("bias", bias_default_init(self.features * k * k),
                          (self.features,))
        return y + bias.astype(y.dtype)


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """torch nn.InstanceNorm2d(affine=False, track_running_stats=False):
    per-sample per-channel normalization over spatial dims, biased var.

    Statistics accumulate in (at least) fp32 — a bf16 mean over thousands
    of pixels loses ~2 decimal digits — and the result is cast back to the
    input dtype so a bf16 trunk stays bf16."""
    acc = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(acc)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.var(xf, axis=(1, 2), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
