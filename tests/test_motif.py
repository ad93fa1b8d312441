"""Smoke + invariant tests for the full MoTIF model (setting=5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from motif_tpu.models.motif import MoTIF, liif_nearest_axis, make_coord_1d


def test_liif_nearest_matches_torch_grid_sample(rng):
    """The separable LIIF nearest upsample must equal
    grid_sample(nearest, align_corners=False) at shifted cell centers."""
    import torch
    import torch.nn.functional as F

    H, W, HH, WW = 6, 7, 19, 23
    img = rng.standard_normal((1, 4, H, W)).astype(np.float32)

    ys = make_coord_1d(HH) + 1e-6
    xs = make_coord_1d(WW) + 1e-6
    gy, gx = np.meshgrid(np.clip(ys, -1 + 1e-6, 1 - 1e-6),
                         np.clip(xs, -1 + 1e-6, 1 - 1e-6), indexing="ij")
    grid = torch.from_numpy(np.stack([gx, gy], -1).astype(np.float32))[None]
    want = F.grid_sample(torch.from_numpy(img), grid, mode="nearest",
                         align_corners=False).numpy()

    iy, _ = liif_nearest_axis(H, HH)
    ix, _ = liif_nearest_axis(W, WW)
    got = img[:, :, iy][:, :, :, ix]
    np.testing.assert_array_equal(got, want)


@pytest.fixture(scope="module")
def tiny_motif():
    model = MoTIF(setting=5)
    B, N_in, H, W = 1, 4, 16, 16
    HH, WW = 64, 64  # HR/8 must survive RAFT's 4-level corr pyramid
    x = jnp.asarray(np.random.default_rng(1).random((B, N_in, H, W, 3), dtype=np.float32))
    tt = jnp.asarray([[0.5, 1.0]], dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, tt, (HH, WW), iters=2)["params"]
    return model, params, x, tt, (HH, WW)


def test_motif_forward_shapes(tiny_motif):
    model, params, x, tt, out_hw = tiny_motif
    frames, flow, flow_gt = model.apply({"params": params}, x, tt, out_hw, iters=2)
    N, B = tt.shape[1], x.shape[0]
    assert frames.shape == (N, B, out_hw[0], out_hw[1], 3)
    assert flow.shape == (2 * B * N, out_hw[0], out_hw[1], 2)
    assert np.all(np.isfinite(np.asarray(frames)))
    assert frames.min() >= 0.0 and frames.max() <= 1.0


def test_motif_groups2_channel_split():
    """groups>1 (Ours.py:783-791): per-group STINF flow slices, per-group
    feature splats, groups re-concatenated for synth. The reference's own
    G>1 would crash upstream (hardcoded synth in_features); this build runs
    the same math with lazily-inferred dims — check shapes, finiteness, and
    the G-factored flow batch, in fwd and teacher-forced train mode."""
    model = MoTIF(setting=5, groups=2, front_rbs=1, back_rbs=2)
    B, N_in, H, W, HH, WW = 1, 4, 16, 16, 64, 64
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((B, N_in, H, W, 3), dtype=np.float32))
    tt = jnp.asarray([[0.5, 1.0]], dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, tt, (HH, WW), iters=1)["params"]

    frames, flow, flow_gt = model.apply({"params": params}, x, tt, (HH, WW),
                                        iters=1)
    N, G = tt.shape[1], 2
    assert frames.shape == (N, B, HH, WW, 3)
    assert flow.shape == (2 * B * N * G, HH, WW, 2)
    assert np.all(np.isfinite(np.asarray(frames)))

    # teacher-forced train path: flow_gt must be repeated per group so the
    # flow loss lines up with the (nBNG,...) flow prediction (Ours.py:788)
    tf = jnp.asarray(rng.random((B, N + 2, HH, WW, 3), dtype=np.float32))
    _, flow_t, flow_gt_t = model.apply(
        {"params": params}, x, tt, (HH, WW), iters=1, use_gt=True, train=True,
        target_frames=tf)
    assert flow_t.shape == flow_gt_t.shape == (2 * B * N * G, HH, WW, 2)

    with pytest.raises(NotImplementedError):
        MoTIF(setting=5, groups=2, fused_decode=True).apply(
            {"params": params}, x, tt, (HH, WW), iters=1)


@pytest.mark.slow
def test_motif_jit_and_train_path(tiny_motif):
    model, params, x, tt, out_hw = tiny_motif
    B, N = x.shape[0], tt.shape[1]
    tf = jnp.asarray(np.random.default_rng(2).random(
        (B, N + 2, out_hw[0], out_hw[1], 3), dtype=np.float32))

    @jax.jit
    def fwd(p, x, tt, tf):
        return model.apply({"params": p}, x, tt, out_hw, use_gt=True, iters=2,
                           target_frames=tf, train=True)

    frames, flow, flow_gt = fwd(params, x, tt, tf)
    assert frames.shape == (N, B, out_hw[0], out_hw[1], 3)
    assert np.all(np.isfinite(np.asarray(flow_gt)))


def test_motif_param_tree_names(tiny_motif):
    """Spot-check that the param tree mirrors reference module names so
    best.pth ports mechanically."""
    _, params, *_ = tiny_motif
    assert "flow_predictor" in params and "fnet" in params["flow_predictor"]
    assert "encoder" in params and "conv_first" in params["encoder"]
    # the 40 recon blocks run as one nn.scan with weights stacked on a
    # leading axis (layers.py::ResBlocks); checkpoint.py restacks torch's
    # recon_trunk.{i}.* keys into this layout
    rt = params["encoder"]["recon_trunk"]["block"]
    assert rt["conv1"]["kernel"].shape[0] == 40
    assert "flow_imnet" in params and "net_0" in params["flow_imnet"]
    assert "synth_net" in params and "net_4" in params["synth_net"]
    assert "flow_process_9" in params
    assert "alpha" in params and params["alpha"].shape == (1,)
    pcd = params["encoder"]["pcd_align"]
    assert "L3_dcnpack_1" in pcd and "conv_offset_mask" in pcd["L3_dcnpack_1"]
    lstm = params["encoder"]["ConvBLSTM"]["forward_net"]
    assert "cell_list_0" in lstm and "pcd_h" in lstm and "pcd_c" in lstm


@pytest.mark.slow
def test_motif_gradients_flow(tiny_motif):
    """Charbonnier-style loss must produce finite, nonzero grads for the
    trainable trunk (encoder / sirens / flow_process / alpha)."""
    model, params, x, tt, out_hw = tiny_motif
    gt = jnp.asarray(np.random.default_rng(3).random(
        (tt.shape[1], x.shape[0], out_hw[0], out_hw[1], 3), dtype=np.float32))

    def loss_fn(p):
        frames, _, _ = model.apply({"params": p}, x, tt, out_hw, iters=2)
        return jnp.sum(jnp.sqrt((frames - gt) ** 2 + 1e-12))

    grads = jax.grad(loss_fn)(params)
    for key in ["encoder", "imnet", "flow_imnet", "synth_net"]:
        leaves = jax.tree_util.tree_leaves(grads[key])
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves), key
        total = sum(float(jnp.abs(l).sum()) for l in leaves)
        assert total > 0.0, f"zero grads in {key}"
    assert float(jnp.abs(grads["alpha"]).sum()) > 0.0


@pytest.mark.slow
def test_motif_44_variant(rng):
    """4-anchor Ours_44 variant (Ours_44.py): 16 flow pairs, per-time
    residual selection, N=1 per call."""
    model = MoTIF(setting=5, n_anchors=4)
    B, N_in, H, W = 1, 4, 16, 16
    HH, WW = 64, 64
    x = jnp.asarray(np.random.default_rng(4).random((B, N_in, H, W, 3), dtype=np.float32))
    tt = jnp.asarray([[0.5]], dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, tt, (HH, WW), iters=2)["params"]
    frames, flow, _ = model.apply({"params": params}, x, tt, (HH, WW), iters=2)
    assert frames.shape == (1, B, HH, WW, 3)
    assert flow.shape == (4 * B, HH, WW, 2)
    assert np.all(np.isfinite(np.asarray(frames)))
    # param tree identical to the 2-anchor model (only wiring differs)
    m2 = MoTIF(setting=5, n_anchors=2)
    p2 = m2.init(jax.random.PRNGKey(0),
                 x, jnp.asarray([[0.2, 0.8]], jnp.float32), (HH, WW), iters=2)["params"]
    from motif_tpu import checkpoint
    assert checkpoint.verify_port(p2, params) == []


@pytest.mark.slow
def test_motif_44_precomputed_flows(rng):
    """Ours_44 with dataset-provided lr_flow / hr flow_GT (training path)."""
    model = MoTIF(setting=5, n_anchors=4)
    B, N_in, H, W, N = 1, 4, 16, 16, 1
    HH, WW = 64, 64
    r = np.random.default_rng(5)
    x = jnp.asarray(r.random((B, N_in, H, W, 3), dtype=np.float32))
    tt = jnp.asarray([[1.0 / 6.0]], dtype=jnp.float32)
    lr_flow = jnp.asarray(r.standard_normal((B, 16, H, W, 2)).astype(np.float32))
    flow_gt = jnp.asarray(r.standard_normal((B, N, 4, HH, WW, 2)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, tt, (HH, WW), iters=2)["params"]
    frames, flow, fgt = model.apply({"params": params}, x, tt, (HH, WW),
                                    use_gt=True, iters=2, train=True,
                                    flows=(lr_flow, flow_gt))
    assert frames.shape == (N, B, HH, WW, 3)
    assert np.all(np.isfinite(np.asarray(frames)))


@pytest.mark.slow
def test_decode_chunks_exact(tiny_motif):
    """decode_chunks (the reference's query-thirds LIIF memory bound,
    Sakuya_arch.py:486-599) splits only the token axis of the pointwise
    SIREN decodes — outputs must be bit-exact vs the single-program path,
    in both the reference-order and fused_decode configurations."""
    model, params, x, tt, out_hw = tiny_motif
    want, wf, _ = model.apply({"params": params}, x, tt, out_hw, iters=2)
    for fused in (False, True):
        m3 = MoTIF(setting=5, decode_chunks=3, fused_decode=fused)
        got, gf, _ = m3.apply({"params": params}, x, tt, out_hw, iters=2)
        assert got.shape == want.shape
        if not fused:  # identical float-op order => bit-exact
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
            np.testing.assert_array_equal(np.asarray(gf), np.asarray(wf))
        else:          # fused reorders math; just bound the drift
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-4)
