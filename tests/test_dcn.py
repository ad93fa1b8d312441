"""Tests for ops/dcn.py vs a direct numpy transcription of the CUDA
modulated-deformable-im2col semantics (dcn_v2_im2col_cuda.cu)."""

import numpy as np

import jax.numpy as jnp

from motif_tpu.ops.dcn import dcn_v2


def _np_dcn(x, offset, mask, weight, bias, K, stride, pad, dil, G):
    """x (B,H,W,Cin) NHWC; offset (B,Ho,Wo,G*KK*2) (g,k,[y,x]);
    mask (B,Ho,Wo,G*KK); weight (K,K,Cin,Cout)."""
    B, H, W, Cin = x.shape
    Cout = weight.shape[-1]
    Ho = (H + 2 * pad - (dil * (K - 1) + 1)) // stride + 1
    Wo = (W + 2 * pad - (dil * (K - 1) + 1)) // stride + 1
    cg = Cin // G
    out = np.zeros((B, Ho, Wo, Cout), np.float32)

    def bilinear(img2d, py, px):
        if py <= -1 or py >= img2d.shape[0] or px <= -1 or px >= img2d.shape[1]:
            return np.zeros(img2d.shape[-1], np.float32)
        y0, x0 = int(np.floor(py)), int(np.floor(px))
        ly, lx = py - y0, px - x0
        v = np.zeros(img2d.shape[-1], np.float32)
        for (yy, xx, w) in ((y0, x0, (1 - ly) * (1 - lx)), (y0, x0 + 1, (1 - ly) * lx),
                            (y0 + 1, x0, ly * (1 - lx)), (y0 + 1, x0 + 1, ly * lx)):
            if 0 <= yy < img2d.shape[0] and 0 <= xx < img2d.shape[1]:
                v += img2d[yy, xx] * w
        return v

    for b in range(B):
        for ho in range(Ho):
            for wo in range(Wo):
                col = np.zeros((K * K, Cin), np.float32)
                for g in range(G):
                    for k in range(K * K):
                        i, j = k // K, k % K
                        oy = offset[b, ho, wo, (g * K * K + k) * 2 + 0]
                        ox = offset[b, ho, wo, (g * K * K + k) * 2 + 1]
                        m = mask[b, ho, wo, g * K * K + k]
                        py = ho * stride - pad + i * dil + oy
                        px = wo * stride - pad + j * dil + ox
                        col[k, g * cg:(g + 1) * cg] = bilinear(
                            x[b, :, :, g * cg:(g + 1) * cg], py, px) * m
                out[b, ho, wo] = np.einsum("kc,kco->o", col,
                                           weight.reshape(K * K, Cin, Cout)) + bias
    return out


import pytest


@pytest.mark.parametrize("backend", ["gather", "onehot"])
def test_dcn_v2_matches_cuda_semantics(rng, backend):
    B, H, W, Cin, Cout, K, G = 2, 5, 6, 4, 3, 3, 2
    x = rng.standard_normal((B, H, W, Cin)).astype(np.float32)
    offset = (rng.standard_normal((B, H, W, G * K * K * 2)) * 1.5).astype(np.float32)
    mask = rng.random((B, H, W, G * K * K), dtype=np.float32)
    weight = rng.standard_normal((K, K, Cin, Cout)).astype(np.float32)
    bias = rng.standard_normal((Cout,)).astype(np.float32)

    want = _np_dcn(x, offset, mask, weight, bias, K, 1, 1, 1, G)
    got = np.asarray(dcn_v2(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
                            jnp.asarray(weight), jnp.asarray(bias),
                            kernel_size=K, stride=1, padding=1, dilation=1,
                            deformable_groups=G, backend=backend))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_dcn_v2_zero_offset_is_plain_conv(rng):
    """check_zero_offset parity (reference DCNv2/test.py:32-74): zero offsets
    and mask==1 reduce DCN to an ordinary conv."""
    import torch
    import torch.nn.functional as TF

    B, H, W, Cin, Cout, K = 1, 8, 8, 6, 4, 3
    x = rng.standard_normal((B, H, W, Cin)).astype(np.float32)
    weight = rng.standard_normal((K, K, Cin, Cout)).astype(np.float32)
    bias = rng.standard_normal((Cout,)).astype(np.float32)
    offset = np.zeros((B, H, W, K * K * 2), np.float32)
    mask = np.ones((B, H, W, K * K), np.float32)

    got = np.asarray(dcn_v2(jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
                            jnp.asarray(weight), jnp.asarray(bias),
                            kernel_size=K, padding=1, deformable_groups=1))
    want = TF.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                     torch.from_numpy(weight).permute(3, 2, 0, 1),
                     torch.from_numpy(bias), padding=1)
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(), atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_dcn_onehot_gradients_match_gather_backend(rng):
    """The custom_vjp backward of the one-hot sampler must match autodiff of
    the gather transcription (the CUDA col2im grads) for input, offset,
    mask and weight."""
    import jax
    import jax.numpy as jnp

    B, H, W, Cin, Cout, K, G = 1, 6, 7, 4, 3, 3, 2
    x = rng.standard_normal((B, H, W, Cin)).astype(np.float32)
    # avoid integer sampling positions (gradient kinks)
    offset = (rng.standard_normal((B, H, W, G * K * K * 2)) * 1.3 + 0.21).astype(np.float32)
    mask = rng.random((B, H, W, G * K * K), dtype=np.float32)
    weight = rng.standard_normal((K, K, Cin, Cout)).astype(np.float32)
    bias = rng.standard_normal((Cout,)).astype(np.float32)
    cot = rng.standard_normal((B, H, W, Cout)).astype(np.float32)

    def loss(backend):
        def f(x, o, m, w, b):
            out = dcn_v2(x, o, m, w, b, kernel_size=K, padding=1,
                         deformable_groups=G, backend=backend)
            return jnp.sum(out * cot)
        return f

    args = tuple(map(jnp.asarray, (x, offset, mask, weight, bias)))
    g1 = jax.grad(loss("onehot"), argnums=(0, 1, 2, 3, 4))(*args)
    g2 = jax.grad(loss("gather"), argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_pallas_sampler_matches_onehot(rng):
    """The Pallas VMEM sampling kernel (interpret mode on CPU) must equal
    the einsum one-hot sampler bit-for-bit at HIGHEST matmul precision."""
    import jax

    from motif_tpu.ops.dcn import _sample_onehot
    from motif_tpu.ops.dcn_pallas import sample_pallas

    B, H, W, G, cg, Q = 2, 16, 28, 4, 8, 700
    x = jnp.asarray(rng.random((B, H, W, G * cg), dtype=np.float32))
    py = jnp.asarray(rng.uniform(-3, H + 2, (B, G, Q)).astype(np.float32))
    px = jnp.asarray(rng.uniform(-3, W + 2, (B, G, Q)).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        ref = _sample_onehot(x, py, px)
        got = sample_pallas(x, py, px, interpret=True, exact=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ywin_backend_matches_onehot_small_offsets(rng):
    """backend='ywin' (row-windowed Pallas sampler, interpret on CPU) must
    match 'onehot' when offsets stay inside the +-max_dy window — the
    serving-path regime. bf16 MXU passes inside the kernel mirror XLA's
    DEFAULT f32 matmul semantics, so compare against a bf16-quantized
    tolerance."""
    import jax

    B, H, W, Cin, Cout, K, G = 2, 16, 12, 8, 6, 3, 2
    x = rng.standard_normal((B, H, W, Cin)).astype(np.float32)
    offset = (rng.standard_normal((B, H, W, G * K * K * 2)) * 1.7).astype(np.float32)
    mask = rng.random((B, H, W, G * K * K), dtype=np.float32)
    weight = (rng.standard_normal((K, K, Cin, Cout)) * 0.2).astype(np.float32)
    bias = rng.standard_normal((Cout,)).astype(np.float32)
    args = tuple(map(jnp.asarray, (x, offset, mask, weight, bias)))

    ref = dcn_v2(*args, kernel_size=K, padding=1, deformable_groups=G,
                 backend="onehot")
    got = dcn_v2(*args, kernel_size=K, padding=1, deformable_groups=G,
                 backend="ywin")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)

    # gradients ride the shared analytic VJP — exact match vs onehot
    import jax.numpy as jnp2
    cot = jnp.asarray(rng.standard_normal(ref.shape).astype(np.float32))

    def loss(backend):
        def f(x, o, m, w, b):
            return jnp2.sum(dcn_v2(x, o, m, w, b, kernel_size=K, padding=1,
                                   deformable_groups=G, backend=backend) * cot)
        return f

    g1 = jax.grad(loss("onehot"), argnums=(0, 1))(*args)
    g2 = jax.grad(loss("ywin"), argnums=(0, 1))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_ywin_violation_falls_back_exact(rng):
    """Offsets beyond max_dy must trip ywin_violation and route through the
    exact one-hot fallback — outputs then match 'onehot' bit-for-bit."""
    from motif_tpu.ops import dcn as dcn_mod
    from motif_tpu.ops.dcn import ywin_violation

    B, H, W, Cin, Cout, K, G = 1, 48, 12, 4, 3, 3, 1
    x = rng.standard_normal((B, H, W, Cin)).astype(np.float32)
    offset = np.zeros((B, H, W, G * K * K * 2), np.float32)
    offset[0, 40, 5, 0] = -35.0   # y-offset far beyond the +-8 window
    mask = rng.random((B, H, W, G * K * K), dtype=np.float32)
    weight = rng.standard_normal((K, K, Cin, Cout)).astype(np.float32)
    bias = np.zeros((Cout,), np.float32)
    args = tuple(map(jnp.asarray, (x, offset, mask, weight, bias)))

    ref = dcn_v2(*args, kernel_size=K, padding=1, deformable_groups=G,
                 backend="onehot")
    got = dcn_v2(*args, kernel_size=K, padding=1, deformable_groups=G,
                 backend="ywin")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # sanity on the guard itself: zero offsets never violate; the crafted
    # one does. (Out-of-image corners are exempt — CUDA zero contribution.)
    import jax.numpy as jnp2
    from motif_tpu.ops.dcn import _sample_positions
    py, _ = _sample_positions(jnp.asarray(offset), B, H, W, G, K, 1, 1, 1)
    py = py.transpose(0, 3, 1, 2, 4).reshape(B, G, -1)
    assert bool(ywin_violation(py, H, W * K * K, 1, 1, K,
                               dcn_mod._YWIN_MAX_DY))
    py0, _ = _sample_positions(jnp.zeros_like(jnp.asarray(offset)),
                               B, H, W, G, K, 1, 1, 1)
    py0 = py0.transpose(0, 3, 1, 2, 4).reshape(B, G, -1)
    assert not bool(ywin_violation(py0, H, W * K * K, 1, 1, K,
                                   dcn_mod._YWIN_MAX_DY))
