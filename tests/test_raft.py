"""End-to-end RAFT-small parity: run the REFERENCE torch implementation
(/root/reference/models/core/raft.py, with the prebuilt alt_cuda_corr
extension stubbed out so the pure-torch CorrBlock is used — it computes
identical values, corr.py:8-56) with random weights, port the state dict,
and compare flows from our flax RAFT."""

import argparse
import os
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from motif_tpu import checkpoint
from motif_tpu.models.raft import RAFT

pytestmark = pytest.mark.slow


REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_raft():
    if not os.path.isdir(REF):
        pytest.skip("reference repo not mounted")
    sys.modules.setdefault("alt_cuda_corr", types.ModuleType("alt_cuda_corr"))
    sys.path.insert(0, REF)
    try:
        from models.core.raft import RAFT as TorchRAFT  # type: ignore
    finally:
        sys.path.remove(REF)
    args = argparse.Namespace(small=True, mixed_precision=False,
                              alternate_corr=False, dropout=0)
    torch.manual_seed(0)
    model = TorchRAFT(args)
    model.eval()
    return model


def test_raft_basic_parity(rng):
    """Non-small RAFT (BasicEncoder/BasicUpdateBlock/SepConvGRU + convex
    upsampling, models/core/raft.py:35-39 & update.py:114-135) vs the
    reference torch implementation with ported random weights."""
    if not os.path.isdir(REF):
        pytest.skip("reference repo not mounted")
    sys.modules.setdefault("alt_cuda_corr", types.ModuleType("alt_cuda_corr"))
    sys.path.insert(0, REF)
    try:
        from models.core.raft import RAFT as TorchRAFT  # type: ignore
    finally:
        sys.path.remove(REF)
    args = argparse.Namespace(small=False, mixed_precision=False,
                              alternate_corr=False, dropout=0)
    torch.manual_seed(1)
    ref = TorchRAFT(args)
    ref.eval()

    B, H, W = 1, 128, 192
    img1 = (rng.random((B, 3, H, W), dtype=np.float32) * 255.0)
    img2 = (rng.random((B, 3, H, W), dtype=np.float32) * 255.0)
    with torch.no_grad():
        preds = ref(torch.from_numpy(img1), torch.from_numpy(img2), iters=2)
    want = preds[-1].numpy().transpose(0, 2, 3, 1)

    params = checkpoint.port_torch_state_dict(ref.state_dict())
    m = RAFT(small=False)
    nhwc = lambda a: jnp.asarray(a.transpose(0, 2, 3, 1))
    got = np.asarray(m.apply({"params": params}, nhwc(img1), nhwc(img2), iters=2))
    assert np.all(np.isfinite(want)), "torch oracle produced NaN"
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)

    init = m.init(jax.random.PRNGKey(0), nhwc(img1), nhwc(img2), iters=1)["params"]
    assert checkpoint.verify_port(init, params) == []


def test_raft_small_parity(ref_raft, rng):
    # 1/8 → 16x24; the smallest pyramid level is then 2x3, avoiding the
    # degenerate 1x1 level where the reference divides by (size-1)=0 and
    # produces NaN (that level never occurs at real eval sizes).
    B, H, W = 1, 128, 192
    img1 = (rng.random((B, 3, H, W), dtype=np.float32) * 255.0)
    img2 = (rng.random((B, 3, H, W), dtype=np.float32) * 255.0)

    with torch.no_grad():
        preds = ref_raft(torch.from_numpy(img1), torch.from_numpy(img2), iters=3)
    want = preds[-1].numpy().transpose(0, 2, 3, 1)

    params = checkpoint.port_torch_state_dict(ref_raft.state_dict())
    m = RAFT()
    nhwc = lambda a: jnp.asarray(a.transpose(0, 2, 3, 1))
    got = np.asarray(m.apply({"params": params}, nhwc(img1), nhwc(img2), iters=3))

    assert np.all(np.isfinite(want)), "torch oracle produced NaN"
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)

    # init tree must structurally match the ported tree
    init = m.init(jax.random.PRNGKey(0), nhwc(img1), nhwc(img2), iters=1)["params"]
    assert checkpoint.verify_port(init, params) == []
