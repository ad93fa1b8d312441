"""Tests for ops/softsplat.py against a direct numpy transcription of the
CUDA kernel semantics (softsplat_cp.py / _max_cp.py / _count_cp.py), plus
gradient checks of the custom formulation vs numerical differentiation."""

import numpy as np

import jax
import jax.numpy as jnp

from motif_tpu.ops import softsplat


def _np_splat(values, flow, mode):
    """Direct loop transcription of kernel_Softsplat_updateOutput."""
    B, H, W, C = values.shape
    if mode == "max":
        out = np.ones((B, H, W, C), np.float32)
    else:
        out = np.zeros((B, H, W, C), np.float32)
    for b in range(B):
        for y in range(H):
            for x in range(W):
                fx = x + flow[b, y, x, 0]
                fy = y + flow[b, y, x, 1]
                x0, y0 = int(np.floor(fx)), int(np.floor(fy))
                for (yy, xx, w) in (
                    (y0, x0, (x0 + 1 - fx) * (y0 + 1 - fy)),
                    (y0, x0 + 1, (fx - x0) * (y0 + 1 - fy)),
                    (y0 + 1, x0, (x0 + 1 - fx) * (fy - y0)),
                    (y0 + 1, x0 + 1, (fx - x0) * (fy - y0)),
                ):
                    if 0 <= xx < W and 0 <= yy < H:
                        if mode == "sum":
                            out[b, yy, xx] += values[b, y, x] * w
                        elif mode == "max":
                            out[b, yy, xx] = np.maximum(out[b, yy, xx], values[b, y, x] * w)
                        elif mode == "count":
                            out[b, yy, xx] += 1.0
    return out


def _rand_case(rng, B=2, H=6, W=7, C=3, flow_scale=2.5):
    values = rng.standard_normal((B, H, W, C)).astype(np.float32)
    flow = (rng.standard_normal((B, H, W, 2)) * flow_scale).astype(np.float32)
    return values, flow


def test_splat_sum_matches_kernel(rng):
    values, flow = _rand_case(rng)
    want = _np_splat(values, flow, "sum")
    got = np.asarray(softsplat.splat_sum(jnp.asarray(values), jnp.asarray(flow)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_splat_max_matches_kernel(rng):
    values, flow = _rand_case(rng)
    values = np.abs(values)  # call sites splat exp(z) >= 0
    want = _np_splat(values, flow, "max")
    got = np.asarray(softsplat.splat_max(jnp.asarray(values), jnp.asarray(flow)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_splat_count_matches_kernel(rng):
    values, flow = _rand_case(rng)
    want = _np_splat(values, flow, "count")[..., :1]
    got = np.asarray(softsplat.splat_count(jnp.asarray(flow)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_softmax_splat_returns_unnormalised_pair(rng):
    values, flow = _rand_case(rng, C=4)
    z = rng.standard_normal((2, 6, 7, 1)).astype(np.float32)
    out, norm = softsplat.softmax_splat(jnp.asarray(values), jnp.asarray(flow), jnp.asarray(z))
    stacked = np.concatenate([values * np.exp(z), np.exp(z)], axis=-1)
    want = _np_splat(stacked, flow, "sum")
    np.testing.assert_allclose(np.asarray(out), want[..., :-1], atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(norm), want[..., -1:], atol=1e-5, rtol=1e-5)


def test_function_softsplat_modes(rng):
    """All four reference modes (FunctionSoftsplat, softsplat_cp.py:320-347)
    against the loop oracle."""
    values, flow = _rand_case(rng, C=4)
    z = rng.standard_normal((2, 6, 7, 1)).astype(np.float32)
    v, f, zz = jnp.asarray(values), jnp.asarray(flow), jnp.asarray(z)

    out, norm = softsplat.function_softsplat(v, f, None, "summation")
    np.testing.assert_allclose(np.asarray(out), _np_splat(values, flow, "sum"),
                               atol=1e-5, rtol=1e-5)
    assert norm is None

    for mode, w in (("average", np.ones_like(z)), ("linear", z),
                    ("softmax", np.exp(z))):
        out, norm = softsplat.function_softsplat(v, f, zz, mode)
        want = _np_splat(np.concatenate([values * w, w], -1), flow, "sum")
        np.testing.assert_allclose(np.asarray(out), want[..., :-1],
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(norm), want[..., -1:],
                                   atol=1e-5, rtol=1e-5)


def test_splat_sum_gradients_numerical(rng):
    """Grad w.r.t. input AND flow vs central finite differences —
    validates parity with kernel_Softsplat_updateGradInput/GradFlow."""
    values, flow = _rand_case(rng, B=1, H=4, W=5, C=2, flow_scale=1.3)
    cot = rng.standard_normal((1, 4, 5, 2)).astype(np.float32)

    def f(v, fl):
        return jnp.sum(softsplat.splat_sum(v, fl) * cot)

    gv, gf = jax.grad(f, argnums=(0, 1))(jnp.asarray(values), jnp.asarray(flow))

    eps = 1e-3
    for _ in range(10):
        i = tuple(int(x) for x in (rng.integers(1), rng.integers(4), rng.integers(5), rng.integers(2)))
        vp, vm = values.copy(), values.copy()
        vp[i] += eps
        vm[i] -= eps
        num = (np.sum(_np_splat(vp, flow, "sum") * cot)
               - np.sum(_np_splat(vm, flow, "sum") * cot)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(gv)[i], num, atol=2e-2)
    for _ in range(10):
        i = tuple(int(x) for x in (rng.integers(1), rng.integers(4), rng.integers(5), rng.integers(2)))
        fp, fm = flow.copy(), flow.copy()
        fp[i] += eps
        fm[i] -= eps
        # skip if the perturbation crosses an integer boundary (kink)
        tgt = i[2] + flow[i] if i[3] == 0 else i[1] + flow[i]
        if abs(tgt - round(tgt)) < 2 * eps:
            continue
        num = (np.sum(_np_splat(values, fp, "sum") * cot)
               - np.sum(_np_splat(values, fm, "sum") * cot)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(gf)[i], num, atol=5e-2)


def test_splat_fused_matches_separate_ops(rng):
    values, flow = _rand_case(rng, C=5)
    z = (rng.standard_normal((2, 6, 7, 1)) * 0.5).astype(np.float32)
    v, f, zz = jnp.asarray(values), jnp.asarray(flow), jnp.asarray(z)
    out, norm, z_max, count = softsplat.splat_fused(v, f, zz)
    out2, norm2 = softsplat.softmax_splat(v, f, zz)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(norm), np.asarray(norm2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(z_max),
                               np.asarray(softsplat.splat_max(jnp.exp(zz), f)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(count),
                               np.asarray(softsplat.splat_count(f)), atol=1e-6)


def test_splat_fused_nonpositive_shortcut(rng):
    """z <= 0 ⇒ z_max ≡ 1 and the cond shortcut must match the full path;
    with z > 0 somewhere, the flag False path computes the true max."""
    values, flow = _rand_case(rng, C=3)
    z_neg = -(rng.random((2, 6, 7, 1), dtype=np.float32))
    v, f = jnp.asarray(values), jnp.asarray(flow)

    full = softsplat.splat_fused(v, f, jnp.asarray(z_neg))
    short = softsplat.splat_fused(v, f, jnp.asarray(z_neg),
                                  z_nonpositive=jnp.asarray(True))
    for a, b in zip(full, short):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(short[2]), 1.0)

    z_pos = rng.random((2, 6, 7, 1), dtype=np.float32)
    full_p = softsplat.splat_fused(v, f, jnp.asarray(z_pos),
                                   z_nonpositive=jnp.asarray(False))
    np.testing.assert_allclose(
        np.asarray(full_p[2]),
        np.asarray(softsplat.splat_max(jnp.exp(jnp.asarray(z_pos)), f)), atol=1e-6)


def test_base_scatter_dtype_close_to_fp32():
    """scatter_dtype=float16 accumulates the base-backend scatter in f16;
    with short sums of O(1) values the result must stay within ~1e-2 of the
    fp32 accumulation (serving-path accuracy knob, splat_fused docstring)."""
    rng = np.random.default_rng(3)
    B, H, W, C = 2, 13, 17, 8
    img = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))
    flow = jnp.asarray((rng.random((B, H, W, 2), dtype=np.float32) - 0.5) * 6)
    z = jnp.asarray(rng.random((B, H, W, 1), dtype=np.float32)) * -1.5

    ref = softsplat.splat_fused(img, flow, z, method="base")
    f16 = softsplat.splat_fused(img, flow, z, method="base",
                               scatter_dtype=jnp.float16)
    for a, b, tol in zip(ref, f16, (2e-2, 2e-2, 2e-2, 0.0)):
        assert a.dtype == b.dtype == jnp.float32
        assert float(jnp.max(jnp.abs(a - b))) <= tol + 1e-6
