"""Tests for the native (C++/ctypes) host-preprocessing core against the
numpy/jax reference implementations."""

import numpy as np
import pytest

from motif_tpu import native
from motif_tpu.ops.resize import imresize_matlab_np
from motif_tpu.utils import metrics


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_matlab_resize_matches_numpy(rng):
    imgs = rng.random((3, 12, 16, 3), dtype=np.float32)
    for scale in (0.25, 0.5, 2.0):
        got = native.matlab_resize_batch(imgs, scale)
        want = np.stack([imresize_matlab_np(im, scale) for im in imgs], 0)
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_u8bgr_to_f32rgb(rng):
    img = rng.integers(0, 256, (4, 5, 3)).astype(np.uint8)
    got = native.u8bgr_to_f32rgb(img)
    want = img[..., ::-1].astype(np.float32) / 255.0
    np.testing.assert_allclose(got, want, atol=1e-7)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_y_psnr(rng):
    a = rng.random((2, 8, 9, 3), dtype=np.float32)
    b = np.clip(a + rng.standard_normal((2, 8, 9, 3)).astype(np.float32) * 0.05, 0, 1)
    got = native.y_psnr_batch(a, b)
    ya, yb = metrics.rgb_to_y(a), metrics.rgb_to_y(b)
    for i in range(2):
        want = metrics.psnr(ya[i], yb[i])
        np.testing.assert_allclose(got[i], want, rtol=1e-6)


def test_native_fallback_paths(rng, monkeypatch):
    """Numpy fallbacks produce identical results when the .so is absent."""
    monkeypatch.setattr(native, "_load", lambda: None)
    imgs = rng.random((1, 8, 8, 3), dtype=np.float32)
    out = native.matlab_resize_batch(imgs, 0.5)
    assert out.shape == (1, 4, 4, 3)
    img8 = rng.integers(0, 256, (2, 2, 3)).astype(np.uint8)
    assert native.u8bgr_to_f32rgb(img8).dtype == np.float32
    p = native.y_psnr_batch(imgs, np.clip(imgs + 0.01, 0, 1))
    assert p.shape == (1,)
