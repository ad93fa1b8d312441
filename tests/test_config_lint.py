"""Config lint: every yml shipped under configs/ must be executable.

Two gates (VERDICT r2 #3):
 * build lint (fast): for EVERY config, parse the yml, build the generator
   via define_g, build the dataset against a synthetic data tree of the
   right layout, and collate one batch — validates the whole
   yml → factory → dataset → collate contract.
 * step lint (slow): run ONE tiny train step (train configs) or one eval
   infer (test configs) per unique compiled-graph signature — duplicated
   recipes (the reference grid differs mostly in paths/names,
   options/train/*.yml) share one compile.

Shapes are shrunk (GT 64 / LQ 16, batch 1-2, iters=1); the reference's
RAFT needs >=64 px inputs for its 4-level corr pyramid.
"""

import functools
import glob
import os
import random

import numpy as np
import pytest

from motif_tpu.data import BatchLoader, collate_adobe_arbitrary, create_dataset
from motif_tpu.models.factory import EVAL_CHUNK, define_g
from motif_tpu.utils import config as cfg

CONFIGS = sorted(glob.glob("configs/**/*.yml", recursive=True))


@pytest.fixture(scope="module")
def trees(tmp_path_factory):
    """Synthetic data trees per dataset-mode family."""
    import cv2

    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("lint_data")

    def frames(d, n, hw, names=None):
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            name = names[i] if names else f"{i:03d}.png"
            cv2.imwrite(str(d / name),
                        rng.integers(0, 255, (*hw, 3), np.uint8))

    # Adobe240-style: GT 4x the LQ; frames big enough for the arbitrary
    # collate's crop of lq_size*d (32*4=128).
    adobe = root / "adobe"
    frames(adobe / "HR" / "clip0", 10, (136, 144))
    frames(adobe / "LR" / "clip0", 10, (34, 36))
    # Adobe_flow precomputed arrays (flow_root defaults to the LQ root):
    # LR anchor flow (K,2,h,w), psies (K,3,h,w), HR GT flow (2*9,2,H,W).
    np.save(adobe / "LR" / "clip0" / "000_002_flow.npy",
            rng.normal(size=(4, 2, 34, 36)).astype(np.float32))
    np.save(adobe / "LR" / "clip0" / "000_002_psies.npy",
            rng.normal(size=(4, 3, 34, 36)).astype(np.float32))
    np.save(adobe / "LR" / "clip0" / "000_002_flow_GT.npy",
            rng.normal(size=(18, 2, 136, 144)).astype(np.float32))

    # Vimeo septuplet with the reference flow npys.
    vimeo = root / "vimeo"
    d_gt = vimeo / "GT" / "00001" / "0001"
    d_lq = vimeo / "LQ" / "00001" / "0001"
    frames(d_gt, 7, (72, 96), [f"im{v}.png" for v in range(1, 8)])
    frames(d_lq, 7, (18, 24), [f"im{v}.png" for v in range(1, 8)])
    np.save(d_lq / "lr_flow_12.npy",
            rng.normal(size=(16, 2, 18, 24)).astype(np.float32))
    np.save(d_gt / "hr_gt_flow.npy",
            rng.normal(size=(28, 2, 72, 96)).astype(np.float32))
    with open(vimeo / "keys.txt", "w") as f:
        f.write("00001_0001\n")

    # eval windows (WindowEvalDataset): enough frames for the 8x-temporal
    # interval-7 presets (ref_num 4 spans ~24 frames), GT = 4x LQ
    ev = root / "eval"
    frames(ev / "HR" / "clip0", 40, (32, 48))
    frames(ev / "LR" / "clip0", 40, (8, 12))
    return {"adobe": adobe, "vimeo": vimeo, "eval": ev}


class _FixedScale(random.Random):
    """collate rng whose d_scale draw is pinned to 4 (crop 128 → GT 64,
    LQ 16) so the lint compiles one deterministic bucket."""

    def uniform(self, a, b):
        return 4.0


def _dataset_opt(opt, trees):
    """Rewrite the config's dataset section onto the synthetic trees with
    shrunk shapes. Returns (dataset_opt, mode)."""
    dopt = dict(opt["datasets"]["train"])
    mode = dopt["mode"]
    if mode.startswith("vimeo"):
        dopt["dataroot_GT"] = str(trees["vimeo"] / "GT")
        dopt["dataroot_LQ"] = str(trees["vimeo"] / "LQ")
        dopt["cache_keys"] = str(trees["vimeo"] / "keys.txt")
    elif mode in ("Adobe_test", "Adobe_test_3", "Gopro_test", "Gopro_test_a",
                  "Vimeo_test_44"):
        dopt["dataroot_GT"] = str(trees["eval"] / "HR")
        dopt["dataroot_LQ"] = str(trees["eval"] / "LR")
        dopt["videos"] = ["clip0"]
    else:
        dopt["dataroot_GT"] = str(trees["adobe"] / "HR")
        dopt["dataroot_LQ"] = str(trees["adobe"] / "LR")
    dopt["GT_size"] = 64
    dopt["LQ_size"] = 16 if not mode.endswith("_a") else 32
    dopt["batch_size"] = 1
    dopt["sample_num"] = min(int(dopt.get("sample_num") or 3), 3)
    return dopt, mode


def _one_batch(dopt, mode, seed=0):
    ds = create_dataset(dopt)
    assert len(ds) > 0, f"empty dataset for mode {mode}"
    kw = {}
    # the arbitrary-scale collate is a TRAIN-path construct; eval presets
    # ending in _a (Gopro_test_a) produce ready-made windows instead.
    if mode.endswith("_a") and not mode.endswith("_test_a"):
        kw["collate"] = functools.partial(
            collate_adobe_arbitrary, lq_size=int(dopt["LQ_size"]),
            rng=_FixedScale(seed))
    loader = BatchLoader(ds, batch_size=int(dopt["batch_size"]), **kw)
    return next(iter(loader.epoch(0)))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_builds(path, trees):
    """Fast lane: yml → model + dataset + one collated batch."""
    is_train = os.path.basename(path).startswith("train")
    opt = cfg.parse(path, is_train=is_train)
    model = define_g(opt["network_G"])
    assert model is not None
    dopt, mode = _dataset_opt(opt, trees)
    batch = _one_batch(dopt, mode)
    assert "lq" in batch and "gt" in batch
    lq, gt = batch["lq"], batch["gt"]
    assert lq.ndim == 5 and gt.ndim == 5
    if is_train and not mode.endswith("_a"):
        scale = int(opt.get("scale") or 4)
        assert gt.shape[2] == lq.shape[2] * scale


def _signature(opt, mode):
    net = opt["network_G"]
    return (net.get("which_model_G") or "Ours", int(net.get("setting") or 5),
            mode.endswith("_a"), mode.startswith("vimeo"))


@pytest.mark.slow
def test_config_steps(trees):
    """Slow lane: one tiny train step / eval infer per unique graph
    signature across all configs."""
    import jax

    from motif_tpu.eval import Evaluator
    from motif_tpu.parallel import make_mesh
    from motif_tpu.trainer import Trainer

    mesh = make_mesh(1)   # batch 1 on the conftest's 8-virtual-device CPU

    done = set()
    for path in CONFIGS:
        is_train = os.path.basename(path).startswith("train")
        opt = cfg.parse(path, is_train=is_train)
        dopt, mode = _dataset_opt(opt, trees)
        sig = (is_train,) + _signature(opt, mode)
        if sig in done:
            continue
        done.add(sig)
        which = opt["network_G"].get("which_model_G") or "Ours"
        model = define_g(opt["network_G"])
        batch = _one_batch(dopt, mode)

        if not is_train:
            fam = which if which in EVAL_CHUNK or not which.startswith("Ours") \
                else "Ours"
            ev = Evaluator(model, None, iters=1, family=fam)
            ev.params = _eval_params(model, which, batch)
            out, _ = ev.infer(batch["lq"][:1], batch["times"][:1],
                              (batch["gt"].shape[2], batch["gt"].shape[3]))
            assert np.isfinite(out).all()
            continue

        family = "LIIF" if which == "LIIF" else "Ours"
        arbitrary = mode.endswith("_a")
        if getattr(model, "n_anchors", 2) == 4 and mode == "vimeo":
            dopt["load_flows"] = True
            batch = _one_batch(dopt, mode)
        out_hw = None if arbitrary else (64, 64)
        tr = Trainer(model, cfg.trainer_config_from_opt(opt), out_hw,
                     iters=1, mesh=mesh, flow_loss=(which != "Ours_ZSM"),
                     family=family)
        state = tr.init_state(jax.random.PRNGKey(0), batch)
        state2, aux = tr.step(state, batch)  # NB: `state` is donated
        assert np.isfinite(float(aux["loss"])), (path, aux)
        assert int(state2.step) == 1


def _eval_params(model, which, batch):
    import jax
    import jax.numpy as jnp

    rng = jax.random.PRNGKey(0)
    lq0 = jnp.asarray(batch["lq"][:1, :, :16, :16])
    tt0 = jnp.asarray(batch["times"][:1])
    if which.startswith("Ours"):
        return model.init(rng, lq0, tt0, (64, 64), iters=1)["params"]
    if which == "LIIF":
        return model.init(rng, lq0, tt0, (64, 64))["params"]
    if which in ("ZSM", "Zooming", "EDVR"):
        return model.init(rng, lq0)["params"]
    if which == "TMNet":
        return model.init(rng, lq0, tt0[:, 1:-1])["params"]
    if which == "Super_SloMo":
        return model.init(rng, lq0[:, [0, -1]], 2)["params"]
    raise NotImplementedError(which)
