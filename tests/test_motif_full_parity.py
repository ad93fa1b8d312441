"""Full-graph MoTIF forward parity vs the REFERENCE torch implementation
(/root/reference/models/modules/Ours.py:412-858, LunaTokis setting=5).

The reference's two CUDA op families are stubbed on CPU:
 * softmax/max/count splatting — replaced by vectorized numpy transcriptions
   of the CUDA kernels (cross-checked in-file against the per-element loop
   oracle from test_softsplat.py);
 * DCNv2 — the `_ext` extension is replaced by a torch wrapper of this
   repo's gather-backend `ops.dcn.dcn_v2`, which is itself verified against
   a loop transcription of dcn_v2_im2col_cuda.cu in test_dcn.py (so this
   test checks GRAPH wiring, the op itself is covered separately).

Random weights are ported through checkpoint.port_torch_state_dict and the
frame outputs compared end to end — the gate VERDICT.md round 1 asked for:
block-level parity cannot catch a transposed reshape in the 431-line
LunaTokis rewiring; this does.
"""

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
from motif_tpu.models.motif import MoTIF

pytestmark = pytest.mark.slow


REF = "/root/reference"


# ---------------------------------------------------------------------------
# numpy splat kernels (vectorized transcription of softsplat_cp.py:12-50,
# softsplat_max_cp.py:20-60, softsplat_count_cp.py:39-50)
# ---------------------------------------------------------------------------

def _corners(flow):
    """Return per-pixel corner indices and bilinear weights. flow NHWC(2)."""
    B, H, W, _ = flow.shape
    gx = np.arange(W, dtype=flow.dtype)[None, None, :] + flow[..., 0]
    gy = np.arange(H, dtype=flow.dtype)[None, :, None] + flow[..., 1]
    x0 = np.floor(gx).astype(np.int64)
    y0 = np.floor(gy).astype(np.int64)
    out = []
    for yy, xx, w in ((y0, x0, (x0 + 1 - gx) * (y0 + 1 - gy)),
                      (y0, x0 + 1, (gx - x0) * (y0 + 1 - gy)),
                      (y0 + 1, x0, (x0 + 1 - gx) * (gy - y0)),
                      (y0 + 1, x0 + 1, (gx - x0) * (gy - y0))):
        valid = (0 <= xx) & (xx < W) & (0 <= yy) & (yy < H)
        out.append((yy, xx, w.astype(flow.dtype), valid))
    return out


def np_splat_fast(values, flow, mode):
    """values/flow NHWC; mode sum|max|count, matching test_softsplat._np_splat.
    dtype-preserving (the fp64 parity path runs it in double)."""
    B, H, W, C = values.shape
    init = np.ones if mode == "max" else np.zeros
    out = init((B, H, W, C), values.dtype)
    bidx = np.arange(B)[:, None, None] * np.ones((1, H, W), np.int64)
    for yy, xx, w, valid in _corners(flow):
        yc = np.clip(yy, 0, H - 1)
        xc = np.clip(xx, 0, W - 1)
        b, y, x = bidx[valid], yc[valid], xc[valid]
        if mode == "sum":
            np.add.at(out, (b, y, x), values[valid] * w[valid][..., None])
        elif mode == "max":
            np.maximum.at(out, (b, y, x), values[valid] * w[valid][..., None])
        else:  # count: raw +1 per in-bounds corner (no bilinear weight)
            np.add.at(out, (b, y, x), 1.0)
    return out


def test_np_splat_fast_matches_loop_oracle():
    from test_softsplat import _np_splat

    rng = np.random.default_rng(3)
    values = rng.standard_normal((2, 5, 6, 3)).astype(np.float32)
    flow = (rng.standard_normal((2, 5, 6, 2)) * 2.0).astype(np.float32)
    for mode in ("sum", "max", "count"):
        v = np.abs(values) if mode == "max" else values
        np.testing.assert_allclose(np_splat_fast(v, flow, mode),
                                   _np_splat(v, flow, mode), atol=1e-5)


# ---------------------------------------------------------------------------
# torch-facing stubs
# ---------------------------------------------------------------------------

def _splat_autograd(mode):
    class _Fn(torch.autograd.Function):
        @staticmethod
        def forward(ctx, inp, flow):
            v = inp.detach().numpy().transpose(0, 2, 3, 1)
            f = flow.detach().numpy().transpose(0, 2, 3, 1)
            out = np_splat_fast(v, f, mode)
            return torch.from_numpy(out.transpose(0, 3, 1, 2).copy())

        @staticmethod
        def backward(ctx, g):  # forward-only parity test
            raise NotImplementedError

    return _Fn


def _ext_stub():
    """A `_ext` module whose dcn_v2_forward delegates to ops.dcn.dcn_v2
    (gather backend) with the CUDA extension's NCHW calling convention
    (dcn_v2.py:24-28)."""
    from motif_tpu.ops.dcn import dcn_v2

    ext = types.ModuleType("_ext")

    def dcn_v2_forward(inp, weight, bias, offset, mask, kh, kw, sh, sw,
                       ph, pw, dh, dw, dg):
        assert kh == kw and sh == sw and ph == pw and dh == dw
        x = jnp.asarray(inp.detach().numpy().transpose(0, 2, 3, 1))
        off = jnp.asarray(offset.detach().numpy().transpose(0, 2, 3, 1))
        m = jnp.asarray(mask.detach().numpy().transpose(0, 2, 3, 1))
        w = jnp.asarray(weight.detach().numpy().transpose(2, 3, 1, 0))
        b = jnp.asarray(bias.detach().numpy())
        out = dcn_v2(x, off, m, w, b, kernel_size=int(kh), stride=int(sh),
                     padding=int(ph), dilation=int(dh),
                     deformable_groups=int(dg), backend="gather")
        return torch.from_numpy(
            np.asarray(out).transpose(0, 3, 1, 2).copy())

    ext.dcn_v2_forward = dcn_v2_forward
    return ext


def _install_stubs_and_import(module_name: str):
    """Install CPU stubs for the reference's CUDA dependencies and import a
    models.modules.* graph module. Returns (module, ref_raft_module)."""
    if not os.path.isdir(REF):
        pytest.skip("reference repo not mounted")

    # module stubs BEFORE importing the reference graph
    cupy_stub = types.ModuleType("cupy")
    cupy_stub.memoize = lambda **kw: (lambda f: f)
    cupy_stub.ndarray = type("ndarray", (), {})  # einops backend probing
    sys.modules.setdefault("cupy", cupy_stub)
    sys.modules.setdefault("alt_cuda_corr", types.ModuleType("alt_cuda_corr"))
    sys.modules["_ext"] = _ext_stub()
    # SIREN.py pulls torchvision transforms it never uses in the model path
    tv = types.ModuleType("torchvision")
    tv_t = types.ModuleType("torchvision.transforms")
    for name in ("Resize", "Compose", "ToTensor", "Normalize"):
        setattr(tv_t, name, object)
    tv.transforms = tv_t
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tv_t)

    # CPU shims for .cuda() / torch.cuda.FloatTensor used at construction
    # (Ours.py:443) and in forward (:621, :677, convlstm.py:62)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.cuda.FloatTensor = (
        lambda data=None, device=None, **k: torch.as_tensor(
            data, dtype=torch.get_default_dtype()))

    # the reference hard-casts sampling grids with .float()
    # (models/core/utils/utils.py, Ours.py BackWarp) which breaks the fp64
    # run; cast the grid to the input dtype instead (exact in fp32, and in
    # fp64 the grid values are integers + flow, representable either way)
    _orig_gs = torch.nn.functional.grid_sample

    def _gs(inp, grid, *a, **k):
        return _orig_gs(inp, grid.to(inp.dtype), *a, **k)

    torch.nn.functional.grid_sample = _gs

    # the reference sprinkles .float() over coordinate tensors (RAFT
    # coords_grid, BackWarp grids); redirect it to the default dtype so the
    # fp64 run stays fp64 end to end (a no-op in normal fp32 execution)
    torch.Tensor.float = lambda self: self.to(torch.get_default_dtype())

    import importlib

    sys.path.insert(0, REF)
    try:
        mod = importlib.import_module(f"models.modules.{module_name}")
        import models.softsplat_cp as ss
        import models.softsplat_max_cp as ssm
        import models.softsplat_count_cp as ssc
        import models.core.raft as ref_raft_mod
    finally:
        sys.path.remove(REF)

    ss._FunctionSoftsplat = _splat_autograd("sum")
    ssm._FunctionSoftsplat = _splat_autograd("max")
    ssc._FunctionSoftsplat = _splat_autograd("count")
    return mod, ref_raft_mod


def _build_ref_model(module_name: str, **ctor_kwargs):
    """Construct a reference LunaTokis fork on CPU with the author-filesystem
    RAFT checkpoint load (Ours.py:424-430) replaced by a seeded random RAFT."""
    mod, ref_raft_mod = _install_stubs_and_import(module_name)
    args = argparse.Namespace(small=True, mixed_precision=False,
                              alternate_corr=True, dropout=0)
    torch.manual_seed(7)
    raft_sd = ref_raft_mod.RAFT(args).state_dict()
    fake_ckpt = {"model": {f"flow_predictor.{k}": v for k, v in raft_sd.items()}}
    real_load = torch.load
    torch.load = lambda *a, **k: fake_ckpt
    try:
        torch.manual_seed(0)
        model = mod.LunaTokis(**ctor_kwargs)
    finally:
        torch.load = real_load
    # route RAFT through the pure-torch CorrBlock (identical values,
    # models/core/corr.py:8-56) instead of the prebuilt .so
    model.flow_predictor.args.alternate_corr = False
    model.eval()
    return model


@pytest.fixture(scope="module")
def ref_lunatokis():
    return _build_ref_model("Ours", setting=5)


@pytest.fixture
def fp64():
    """Run both frameworks in double precision: float32 drift through the
    RAFT GRU iterations is ~1e-3 (see test_raft tolerances), which would
    mask a subtle wiring bug; in fp64 true parity is ~1e-6."""
    jax.config.update("jax_enable_x64", True)
    old_torch = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    yield
    torch.set_default_dtype(old_torch)
    jax.config.update("jax_enable_x64", False)


def test_motif_full_graph_parity(ref_lunatokis, fp64):
    B, H, W, S, N = 1, 32, 48, 4, 2
    HH, WW = H * S, W * S  # 128x192: smallest RAFT pyramid level 2x3 (no NaN)
    iters = 2
    rng = np.random.default_rng(0)
    x = rng.random((B, 4, 3, H, W)).astype(np.float64)
    tt = np.asarray([[1.0 / 3.0, 2.0 / 3.0]], np.float64)

    model64 = ref_lunatokis.double()
    with torch.no_grad():
        times = [torch.from_numpy(tt[:, i:i + 1]) for i in range(N)]
        want, _, _ = model64(
            torch.from_numpy(x), None, times, scale=S,
            use_GT=False, iter=iters)
    # reference returns (N, B, 3, HH, WW); flatten to (N*B, 3, HH, WW)
    want = want.numpy().reshape(N * B, 3, HH, WW)
    assert np.isfinite(want).all(), "reference produced non-finite output"

    params = checkpoint.port_torch_state_dict(model64.state_dict())
    m = MoTIF(setting=5)
    ref_tree = m.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 4, 16, 16, 3), jnp.float32),
                      jnp.zeros((1, N), jnp.float32), (64, 64),
                      iters=1)["params"]
    problems = [p for p in checkpoint.verify_port(ref_tree, params)
                if not p.startswith("extra")]
    assert not problems, problems[:10]

    got, _, _ = m.apply({"params": params},
                        jnp.asarray(x.transpose(0, 1, 3, 4, 2)),
                        jnp.asarray(tt), (HH, WW), use_gt=False, iters=iters)
    got = np.asarray(got)  # (N, B, HH, WW, 3)
    got_nchw = got.reshape(B * N, HH, WW, 3).transpose(0, 3, 1, 2)

    diff = np.abs(got_nchw - want)
    print("full-graph parity: max", diff.max(), "mean", diff.mean())
    assert diff.max() < 1e-4, (diff.max(), diff.mean())
    assert diff.mean() < 1e-6, diff.mean()


# ---------------------------------------------------------------------------
# fork parity: Ours_7 (linear-motion) and Ours_flow (flow precomputer)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_ours7():
    return _build_ref_model("Ours_7", setting=3)


def test_ours7_full_graph_parity(ref_ours7, fp64):
    B, H, W, S, N = 1, 32, 48, 4, 2
    HH, WW = H * S, W * S
    iters = 2
    rng = np.random.default_rng(1)
    x = rng.random((B, 2, 3, H, W)).astype(np.float64)
    tt = np.asarray([[0.25, 0.75]], np.float64)

    model64 = ref_ours7.double()
    with torch.no_grad():
        times = [torch.from_numpy(tt[:, i:i + 1]) for i in range(N)]
        want, _, _ = model64(torch.from_numpy(x), None, times, scale=S,
                             use_GT=False, iter=iters)
    want = want.numpy().reshape(N * B, 3, HH, WW)
    assert np.isfinite(want).all()

    params = checkpoint.port_torch_state_dict(model64.state_dict())
    m = MoTIF(setting=3, linear_motion=True)
    ref_tree = m.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 2, 16, 16, 3), jnp.float32),
                      jnp.zeros((1, N), jnp.float32), (64, 64),
                      iters=1)["params"]
    problems = [p for p in checkpoint.verify_port(ref_tree, params)
                if not p.startswith("extra")]
    assert not problems, problems[:10]

    got, _, _ = m.apply({"params": params},
                        jnp.asarray(x.transpose(0, 1, 3, 4, 2)),
                        jnp.asarray(tt), (HH, WW), use_gt=False, iters=iters)
    got_nchw = np.asarray(got).reshape(N * B, HH, WW, 3).transpose(0, 3, 1, 2)
    diff = np.abs(got_nchw - want)
    print("ours7 parity: max", diff.max(), "mean", diff.mean())
    assert diff.max() < 1e-4, (diff.max(), diff.mean())
    assert diff.mean() < 1e-6, diff.mean()


@pytest.fixture(scope="module")
def ref_ours_flow():
    return _build_ref_model("Ours_flow")


def test_ours_flow_precompute_parity(ref_ours_flow, fp64):
    from motif_tpu.models.flow_precompute import FlowPrecompute

    B, H, W, S = 1, 32, 48, 4
    iters = 2
    rng = np.random.default_rng(2)
    x = rng.random((B, 4, 3, H, W)).astype(np.float64)

    model64 = ref_ours_flow.double()
    with torch.no_grad():
        times = [torch.zeros(B, 1, dtype=torch.float64)]
        w_flow, _, w_psies = model64(torch.from_numpy(x), None, times,
                                     scale=S, use_GT=False, iter=iters)
    w_flow = w_flow.reshape(8 * B, 2, H, W).numpy()
    w_psies = w_psies.numpy()

    params = checkpoint.port_torch_state_dict(model64.state_dict())
    m = FlowPrecompute(scale=S)
    g_flow, zero, g_psies = m.apply(
        {"params": {"flow_predictor": params["flow_predictor"]}},
        jnp.asarray(x.transpose(0, 1, 3, 4, 2)), iters=iters)
    assert zero == 0
    g_flow = np.asarray(g_flow).transpose(0, 3, 1, 2)
    g_psies = np.asarray(g_psies).transpose(0, 3, 1, 2)

    df = np.abs(g_flow - w_flow)
    dp = np.abs(g_psies - w_psies)
    print("ours_flow parity: flow max", df.max(), "psies max", dp.max())
    assert df.max() < 1e-6, df.max()
    assert dp.max() < 1e-6, dp.max()
