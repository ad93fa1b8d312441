"""Smoke tests for the baseline model zoo + factory: shapes, finiteness,
torch-mirroring param names."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from motif_tpu.models.baselines import EDVR, SuperSloMo, TMNet, ZSM
from motif_tpu.models.factory import define_g
from motif_tpu.models.layers import pixel_shuffle
from motif_tpu.models.videoinr import VideoINR


def test_pixel_shuffle_parity(rng):
    import torch

    x = rng.standard_normal((2, 16, 4, 5)).astype(np.float32)
    want = torch.pixel_shuffle(torch.from_numpy(x), 2).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(pixel_shuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), 2))
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_zsm_forward(rng):
    m = ZSM(nf=16, front_rbs=1, back_rbs=1)
    x = jnp.asarray(rng.random((1, 2, 8, 8, 3), dtype=np.float32))
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": p}, x)
    assert out.shape == (1, 3, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())
    assert "conv_first" in p and "recon_trunk" in p and "upconv1" in p
    assert p["recon_trunk"]["block"]["conv1"]["kernel"].shape[0] == 1


def test_tmnet_forward(rng):
    m = TMNet(nf=16, front_rbs=1, back_rbs=1)
    x = jnp.asarray(rng.random((1, 2, 8, 8, 3), dtype=np.float32))
    tt = jnp.asarray([[0.5]], dtype=jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x, tt)["params"]
    out = m.apply({"params": p}, x, tt)
    assert out.shape == (1, 3, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())
    assert "layersAtB" in p and "layersFusion_0" in p
    assert "TMB_A_l1" in p["pcd_align"]


def test_edvr_forward(rng):
    m = EDVR(nf=16, num_frame=3, extract_blocks=1, recon_blocks=1)
    x = jnp.asarray(rng.random((1, 3, 8, 8, 3), dtype=np.float32))
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    out = m.apply({"params": p}, x)
    assert out.shape == (1, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())
    assert "offset_conv1_l3" in p["pcd_align"] and "cas_dcnpack" in p["pcd_align"]
    assert "temporal_attn1" in p["fusion"]


@pytest.mark.slow
def test_supersloMo_forward(rng):
    m = SuperSloMo(h0=64, w0=96)
    x = jnp.asarray(rng.random((1, 2, 64, 96, 3), dtype=np.float32))
    p = m.init(jax.random.PRNGKey(0), x, 2)["params"]
    out = m.apply({"params": p}, x, 2)
    assert out.shape == (1, 3, 64, 96, 3)
    assert bool(jnp.isfinite(out).all())
    assert "flow" in p and "down1" in p["flow"] and "up5" in p["interp"]


def test_videoinr_forward(rng):
    m = VideoINR(nf=16, front_rbs=1, back_rbs=1)
    x = jnp.asarray(rng.random((1, 2, 8, 8, 3), dtype=np.float32))
    tt = jnp.asarray([[0.25, 0.75]], dtype=jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x, tt, (16, 16))["params"]
    preds = m.apply({"params": p}, x, tt, (16, 16))
    assert len(preds) == 2 and preds[0].shape == (1, 16, 16, 3)
    assert all(bool(jnp.isfinite(f).all()) for f in preds)
    assert "feat_imnet" in p and "encode_imnet" in p and "upconv1" in p


def test_factory_dispatch():
    from motif_tpu.models.motif import MoTIF

    from motif_tpu.models.flow_precompute import FlowPrecompute

    assert isinstance(define_g({"which_model_G": "Ours", "setting": 5}), MoTIF)
    assert isinstance(define_g({"which_model_G": "Ours_44"}), MoTIF)
    m7 = define_g({"which_model_G": "Ours_7", "setting": 6})
    assert isinstance(m7, MoTIF) and m7.linear_motion and m7.setting == 3
    assert isinstance(define_g({"which_model_G": "Ours_flow"}), FlowPrecompute)
    mz = define_g({"which_model_G": "Ours_ZSM", "setting": 5})
    assert isinstance(mz, MoTIF) and not mz.linear_motion
    assert isinstance(define_g({"which_model_G": "LIIF"}), VideoINR)
    assert isinstance(define_g({"which_model_G": "ZSM"}), ZSM)
    assert isinstance(define_g({"which_model_G": "TMNet"}), TMNet)
    assert isinstance(define_g({"which_model_G": "EDVR"}), EDVR)
    assert isinstance(define_g({"which_model_G": "Super_SloMo"}), SuperSloMo)
    with pytest.raises(NotImplementedError):
        define_g({"which_model_G": "nope"})
