"""Mixed-precision (compute_dtype=bfloat16) consistency gates.

The bf16 path must produce frames close to the fp32 path with the SAME
params: the trunk/SIRENs run in bf16 (relative error ~4e-3 per op) while
flow values, reliability metrics, the splat accumulation and the output
clamp stay fp32 (models/motif.py compute_dtype docstring). Output frames
live in [0, 1], so an absolute tolerance of a few 1e-2 bounds the visual
impact (>= ~35 dB agreement between the two paths); the PSNR-grade gate
against reference weights is the on-hardware Vid4 eval (BASELINE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motif_tpu.models.motif import MoTIF


@pytest.mark.slow
@pytest.mark.parametrize("n_anchors", [2])
def test_bf16_matches_fp32(n_anchors):
    rng = np.random.default_rng(0)
    B, N_in, H, W, N = 1, 4, 64, 64, 2
    HH, WW = 96, 96
    x = jnp.asarray(rng.random((B, N_in, H, W, 3), dtype=np.float32))
    tt = jnp.asarray(np.linspace(0.2, 0.8, N, dtype=np.float32)[None])

    m32 = MoTIF(setting=5, n_anchors=n_anchors)
    m16 = MoTIF(setting=5, n_anchors=n_anchors, compute_dtype="bfloat16")
    params = m32.init(jax.random.PRNGKey(0), x, tt, (HH, WW), iters=1)["params"]

    f32, fl32, _ = m32.apply({"params": params}, x, tt, (HH, WW), iters=2)
    f16, fl16, _ = m16.apply({"params": params}, x, tt, (HH, WW), iters=2)

    assert f16.dtype == jnp.float32  # output is cast back
    assert fl16.dtype == jnp.float32
    diff = float(jnp.max(jnp.abs(f16 - f32)))
    # bf16 trunk at random init: empirical diff ~1e-2; guard at 6e-2
    assert diff < 6e-2, f"bf16 frames diverge from fp32: max abs {diff}"
    # predicted flows follow bf16 SIREN outputs; normalised flow is
    # flow_raw-scale (x20/(HH/H) cancel), tolerance in raw units
    fdiff = float(jnp.max(jnp.abs(fl16 - fl32)))
    assert fdiff < 6e-2, f"bf16 flow diverges: max abs {fdiff}"


@pytest.mark.slow
def test_fused_decode_matches_reference_path():
    """fused_decode folds the STINF/SINF first layers through the LIIF
    nearest-upsample — exact math, float ops reordered. Same params must
    give the same frames/flows up to fp32 reassociation noise."""
    rng = np.random.default_rng(0)
    B, N_in, H, W, N = 1, 4, 64, 64, 2
    HH, WW = 96, 96
    x = jnp.asarray(rng.random((B, N_in, H, W, 3), dtype=np.float32))
    tt = jnp.asarray(np.linspace(0.2, 0.8, N, dtype=np.float32)[None])

    m0 = MoTIF(setting=5)
    m1 = MoTIF(setting=5, fused_decode=True)
    params = m0.init(jax.random.PRNGKey(0), x, tt, (HH, WW), iters=1)["params"]
    f0, fl0, _ = m0.apply({"params": params}, x, tt, (HH, WW), iters=2)
    f1, fl1, _ = m1.apply({"params": params}, x, tt, (HH, WW), iters=2)
    assert float(jnp.max(jnp.abs(f1 - f0))) < 5e-3
    assert float(jnp.max(jnp.abs(fl1 - fl0))) < 5e-3


def test_bf16_param_tree_identical():
    """compute_dtype must not change the param tree (same checkpoint loads
    in both modes)."""
    x = jnp.zeros((1, 4, 16, 16, 3), jnp.float32)
    tt = jnp.zeros((1, 2), jnp.float32)
    p32 = MoTIF(setting=5).init(jax.random.PRNGKey(0), x, tt, (64, 64),
                                iters=1)["params"]
    p16 = MoTIF(setting=5, compute_dtype="bfloat16").init(
        jax.random.PRNGKey(0), x, tt, (64, 64), iters=1)["params"]
    s32 = jax.tree.map(lambda a: (a.shape, a.dtype), p32)
    s16 = jax.tree.map(lambda a: (a.shape, a.dtype), p16)
    assert s32 == s16


@pytest.mark.slow
def test_fused_decode_grad_matches():
    """The synth-fold reads synth_net.net_0 / imnet / flow_imnet kernels via
    self.variables — gradients must flow through those reads identically to
    the reference-order path (train-with-fused support)."""
    rng = np.random.default_rng(1)
    B, N_in, H, W, N = 1, 4, 64, 64, 2
    HH, WW = 96, 96
    x = jnp.asarray(rng.random((B, N_in, H, W, 3), dtype=np.float32))
    tt = jnp.asarray(np.linspace(0.2, 0.8, N, dtype=np.float32)[None])
    gt = jnp.asarray(rng.random((B, N, HH, WW, 3), dtype=np.float32))

    m0 = MoTIF(setting=5)
    m1 = MoTIF(setting=5, fused_decode=True)
    params = m0.init(jax.random.PRNGKey(0), x, tt, (HH, WW), iters=1)["params"]

    def loss(m):
        def f(p):
            fr, _, _ = m.apply({"params": p}, x, tt, (HH, WW), iters=2)
            return jnp.sum((fr.transpose(1, 0, 2, 3, 4) - gt) ** 2)
        return jax.grad(f)(params)

    g0 = loss(m0)
    g1 = loss(m1)
    for key in ("synth_net", "imnet", "flow_imnet", "encoder"):
        a = jnp.concatenate([v.ravel() for v in jax.tree.leaves(g0[key])])
        b = jnp.concatenate([v.ravel() for v in jax.tree.leaves(g1[key])])
        scale = float(jnp.max(jnp.abs(a))) + 1e-12
        d = float(jnp.max(jnp.abs(a - b))) / scale
        assert d < 5e-3, f"grad mismatch in {key}: rel {d}"


def test_bf16_and_fused_smoke_tiny():
    """Fast-lane smoke (the full-size bf16/fused parity gates are slow-lane,
    ~5 min of XLA compiles on this 1-core box): tiny model, all serving
    knobs on, output finite + close to the fp32 reference-order path."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 4, 16, 16, 3), dtype=np.float32))
    tt = jnp.asarray([[0.3, 0.7]], dtype=jnp.float32)
    m0 = MoTIF(setting=5, channel=8, front_rbs=1, back_rbs=1)
    m1 = MoTIF(setting=5, channel=8, front_rbs=1, back_rbs=1,
               compute_dtype="bfloat16", fused_decode=True,
               splat_method="base", splat_dtype="float16")
    params = m0.init(jax.random.PRNGKey(0), x, tt, (64, 64), iters=1)["params"]
    f0, _, _ = m0.apply({"params": params}, x, tt, (64, 64), iters=1)
    f1, _, _ = m1.apply({"params": params}, x, tt, (64, 64), iters=1)
    assert f1.dtype == jnp.float32
    assert bool(jnp.isfinite(f1).all())
    assert float(jnp.max(jnp.abs(f1 - f0))) < 6e-2
