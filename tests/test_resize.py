"""Golden tests: ops/resize.py vs torch interpolate and the reference
MATLAB-bicubic imresize_np (imported from /root/reference as a test oracle)."""

import os
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from motif_tpu.ops import resize

REF = "/root/reference"


def _ref_imresize_np():
    """Import the reference data/util.py as an oracle, stubbing lmdb."""
    if not os.path.isdir(REF):
        pytest.skip("reference repo not mounted")
    if "lmdb" not in sys.modules:
        sys.modules["lmdb"] = types.ModuleType("lmdb")
    sys.path.insert(0, REF)
    try:
        from data import util as ref_util  # type: ignore
    finally:
        sys.path.remove(REF)
    return ref_util.imresize_np


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("shape", [((7, 9), (21, 36)), ((16, 12), (7, 5)), ((8, 8), (8, 8))])
def test_interpolate_bilinear_parity(rng, align_corners, shape):
    (H, W), (OH, OW) = shape
    img = rng.standard_normal((2, H, W, 3), dtype=np.float32)
    want = F.interpolate(torch.from_numpy(img).permute(0, 3, 1, 2), size=(OH, OW),
                         mode="bilinear", align_corners=align_corners)
    want = want.permute(0, 2, 3, 1).numpy()
    got = np.asarray(resize.interpolate_bilinear(jnp.asarray(img), (OH, OW), align_corners))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("scale", [0.25, 0.5, 1.0 / 3.0, 2.0, 1.7])
def test_imresize_matlab_vs_reference(rng, scale):
    imresize_np = _ref_imresize_np()
    img = rng.random((12, 16, 3), dtype=np.float32)
    want = imresize_np(img, scale)
    got = np.asarray(resize.imresize_matlab(jnp.asarray(img)[None], scale))[0]
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
    got_np = resize.imresize_matlab_np(img, scale)
    np.testing.assert_allclose(got_np, want, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("hw", [(8, 8), (7, 5), (14, 9)])
def test_avg_pool2d_parity(rng, hw):
    H, W = hw
    x = rng.standard_normal((2, H, W, 4), dtype=np.float32)
    want = F.avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 2, stride=2)
    want = want.permute(0, 2, 3, 1).numpy()
    got = np.asarray(resize.avg_pool2d(jnp.asarray(x), 2, 2))
    np.testing.assert_allclose(got, want, atol=1e-6)
