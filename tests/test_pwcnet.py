"""PWC-Net tests: ConvTranspose torch parity + structural forward check
(the reference PWCNet cannot run on CPU — its correlation is CUDA-only —
so the cost volume is covered by test_corr.py and the rest structurally)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from motif_tpu import checkpoint
from motif_tpu.models.layers import ConvTranspose2d
from motif_tpu.models.pwcnet import PWCNet, _masked_backwarp


def test_conv_transpose_parity(rng):
    t = tnn.ConvTranspose2d(6, 2, kernel_size=4, stride=2, padding=1)
    x = rng.standard_normal((2, 6, 5, 7)).astype(np.float32)
    want = t(torch.from_numpy(x)).detach().numpy().transpose(0, 2, 3, 1)

    sd = checkpoint.port_torch_state_dict(
        {"moduleUpflow.weight": t.weight, "moduleUpflow.bias": t.bias})
    m = ConvTranspose2d(2, 4, 2, 1)
    got = np.asarray(m.apply({"params": sd["moduleUpflow"]},
                             jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_masked_backwarp_vs_torch(rng):
    """Transcribe Decoder.Backward (PWCNet.py:146-178) in torch as oracle —
    note the reference's quirk: a linspace(-1,1) grid sampled with
    grid_sample's default align_corners=False (zero flow is NOT identity)."""
    import torch.nn.functional as F

    B, H, W, C = 2, 8, 10, 3
    img = rng.random((B, H, W, C), dtype=np.float32)
    flow = (rng.standard_normal((B, H, W, 2)) * 2).astype(np.float32)

    ti = torch.from_numpy(img).permute(0, 3, 1, 2)
    tf = torch.from_numpy(flow).permute(0, 3, 1, 2)
    gx = torch.linspace(-1, 1, W).view(1, 1, 1, W).expand(B, -1, H, -1)
    gy = torch.linspace(-1, 1, H).view(1, 1, H, 1).expand(B, -1, -1, W)
    grid = torch.cat([gx, gy], 1)
    nflow = torch.cat([tf[:, 0:1] / ((W - 1) / 2.0), tf[:, 1:2] / ((H - 1) / 2.0)], 1)
    inp = torch.cat([ti, torch.ones(B, 1, H, W)], 1)
    out = F.grid_sample(inp, (grid + nflow).permute(0, 2, 3, 1),
                        mode="bilinear", padding_mode="zeros", align_corners=False)
    mask = out[:, -1:]
    mask = (mask > 0.999).float()
    want = (out[:, :-1] * mask).numpy().transpose(0, 2, 3, 1)

    got = np.asarray(_masked_backwarp(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)

    # everything out of frame → exactly zero
    out_oob = _masked_backwarp(jnp.asarray(img), jnp.full((B, H, W, 2), 100.0))
    assert float(jnp.abs(out_oob).sum()) == 0.0


@pytest.mark.slow
def test_pwcnet_forward_shapes(rng):
    model = PWCNet()
    a = jnp.asarray(rng.random((1, 64, 96, 3), dtype=np.float32))
    b = jnp.asarray(rng.random((1, 64, 96, 3), dtype=np.float32))
    params = model.init(jax.random.PRNGKey(0), a, b)["params"]
    flow = model.apply({"params": params}, a, b)
    assert flow.shape == (1, 16, 24, 2)
    assert bool(jnp.isfinite(flow).all())
    # param tree mirrors torch names for pwc-checkpoint porting
    assert "moduleExtractor" in params and "moduleOne_0" in params["moduleExtractor"]
    assert "moduleUpflow" in params["moduleFiv"]
    assert "moduleMain_12" in params["moduleRefiner"]


@pytest.mark.slow
def test_pwcnet_light_full_parity(rng):
    """Full-graph parity vs the reference PWCNet_light on CPU, with the CuPy
    9x9 correlation stubbed by a torch wrapper of ops.corr.local_corr (which
    test_corr.py verifies against a transcription of the CUDA kernel)."""
    import os
    import sys
    import types

    import torch

    REF = "/root/reference"
    if not os.path.isdir(REF):
        pytest.skip("reference repo not mounted")

    from motif_tpu.ops.corr import local_corr as jax_local_corr
    from motif_tpu.models.pwcnet import PWCNetLight
    from motif_tpu import checkpoint

    # OpticalFlow/correlation.py imports cupy at module import
    cupy_stub = types.ModuleType("cupy")
    cupy_stub.memoize = lambda **kw: (lambda f: f)
    cupy_stub.ndarray = type("ndarray", (), {})
    cupy_stub.cuda = types.SimpleNamespace(compile_with_cache=None)
    sys.modules.setdefault("cupy", cupy_stub)
    # correlation.py:7-8 snapshots torch.cuda.current_stream() at import
    torch.cuda.current_stream = (
        lambda *a, **k: types.SimpleNamespace(cuda_stream=0))
    tv = types.ModuleType("torchvision")
    tv_t = types.ModuleType("torchvision.transforms")
    for name in ("Resize", "Compose", "ToTensor", "Normalize"):
        setattr(tv_t, name, object)
    tv.transforms = tv_t
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tv_t)
    sys.path.insert(0, REF)
    try:
        import OpticalFlow.correlation as ref_corr
        import OpticalFlow.PWCNet_light as ref_light_mod
    finally:
        sys.path.remove(REF)

    def fake_correlation(tensorFirst, tensorSecond):
        out = jax_local_corr(
            jnp.asarray(tensorFirst.detach().numpy().transpose(0, 2, 3, 1)),
            jnp.asarray(tensorSecond.detach().numpy().transpose(0, 2, 3, 1)),
            max_disp=4)
        return torch.from_numpy(np.asarray(out).transpose(0, 3, 1, 2).copy())

    ref_corr.FunctionCorrelation = fake_correlation
    torch.Tensor.cuda = lambda self, *a, **k: self

    torch.manual_seed(0)
    ref = ref_light_mod.PWCNet()
    ref.eval()

    B, H, W = 1, 64, 128
    img1 = rng.random((B, 3, H, W), dtype=np.float32)
    img2 = rng.random((B, 3, H, W), dtype=np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(img1), torch.from_numpy(img2)).numpy()

    params = checkpoint.port_torch_state_dict(ref.state_dict())
    m = PWCNetLight()
    ref_tree = m.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 3)))["params"]
    problems = [p for p in checkpoint.verify_port(ref_tree, params)
                if not p.startswith("extra")]
    assert not problems, problems[:10]

    got = np.asarray(m.apply({"params": params},
                             jnp.asarray(img1.transpose(0, 2, 3, 1)),
                             jnp.asarray(img2.transpose(0, 2, 3, 1))))
    got = got.transpose(0, 3, 1, 2)
    assert got.shape == want.shape, (got.shape, want.shape)
    d = np.abs(got - want)
    assert d.max() < 1e-3, (d.max(), d.mean())
