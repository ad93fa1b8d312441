"""End-to-end wiring tests for the flagship training recipe: Ours_44
(4-anchor MoTIF) + precomputed Vimeo flow npys (reference train.py +
Vimeo7_dataset.py:143,152 + Ours_44.py flows branch), plus multihost
sharding and epoch-resume plumbing."""

import os

import numpy as np
import pytest

import jax

from motif_tpu.data import Subset, Vimeo7Dataset, create_dataset
from motif_tpu.parallel import host_shard_indices


pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def vimeo_flow_tree(tmp_path_factory):
    """Vimeo-style clip WITH flow npys in the reference layout:
    lr_flow_12.npy (16, 2, h, w), hr_gt_flow.npy (28, 2, H, W)."""
    import cv2

    root = tmp_path_factory.mktemp("vimeo_flow")
    gt = root / "GT"
    lq = root / "LQ"
    rng = np.random.default_rng(0)
    for base, size in ((gt, (32, 48)), (lq, (8, 12))):
        d = base / "00001" / "0001"
        os.makedirs(d)
        for v in range(1, 8):
            img = rng.integers(0, 255, (*size, 3), np.uint8)
            cv2.imwrite(str(d / f"im{v}.png"), img)
    np.save(lq / "00001" / "0001" / "lr_flow_12.npy",
            rng.normal(size=(16, 2, 8, 12)).astype(np.float32))
    np.save(gt / "00001" / "0001" / "hr_gt_flow.npy",
            rng.normal(size=(28, 2, 32, 48)).astype(np.float32))
    with open(root / "keys.txt", "w") as f:
        f.write("00001_0001\n")
    return str(gt), str(lq), str(root / "keys.txt")


def test_vimeo7_load_flows_shapes(vimeo_flow_tree):
    gt, lq, keys = vimeo_flow_tree
    ds = Vimeo7Dataset(gt, lq, keys=keys, gt_size=16, scale=4, seed=0)
    assert "flow" not in ds[0]
    ds = Vimeo7Dataset(gt, lq, keys=keys, gt_size=16, scale=4, seed=0,
                       load_flows=True)
    item = ds[0]
    # model layout: lr (16, h, w, 2); gt (N=7, 4, HH, WW, 2)
    assert item["flow"].shape == (16, 4, 4, 2)
    assert item["flow_gt"].shape == (7, 4, 16, 16, 2)
    assert np.isfinite(item["flow"]).all() and np.isfinite(item["flow_gt"]).all()


def test_create_dataset_vimeo_load_flows_opt(vimeo_flow_tree):
    gt, lq, keys = vimeo_flow_tree
    opt = {"mode": "vimeo", "dataroot_GT": gt, "dataroot_LQ": lq,
           "cache_keys": keys, "GT_size": 16, "scale": 4, "load_flows": True}
    ds = create_dataset(opt)
    assert ds.load_flows
    item = ds[0]
    assert item["flow"].shape[0] == 16


def test_ours44_train_step_with_precomputed_flows(vimeo_flow_tree):
    """The flagship recipe end-to-end on the 8-device CPU mesh: factory
    model (Ours_44 → 4 anchors), dataset flows threaded through
    Trainer.loss_fn, finite loss, step increments."""
    import jax.numpy as jnp

    from motif_tpu.data import BatchLoader
    from motif_tpu.models.factory import define_g
    from motif_tpu.parallel import make_mesh, shard_batch
    from motif_tpu.trainer import Trainer, TrainerConfig

    gt, lq, keys = vimeo_flow_tree
    model = define_g({"which_model_G": "Ours_44", "setting": 5})
    assert model.n_anchors == 4
    ds = Vimeo7Dataset(gt, lq, keys=keys, gt_size=16, scale=4, seed=0,
                       load_flows=True)
    # one clip repeated to fill the 8-way batch
    loader = BatchLoader(Subset(ds, [0] * 8), batch_size=8, shuffle=False)
    batch = next(iter(loader.epoch(0)))
    assert batch["flow"].shape == (8, 16, 4, 4, 2)
    assert batch["flow_gt"].shape == (8, 7, 4, 16, 16, 2)

    mesh = make_mesh(8)
    trainer = Trainer(model, TrainerConfig(lr=1e-4), (16, 16), iters=1,
                      mesh=mesh)
    batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "key"}
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    batch = jax.device_put(batch, shard_batch(mesh))
    state, aux = trainer.step(state, batch)
    assert np.isfinite(float(aux["loss"]))
    assert "flow_l" in aux and np.isfinite(float(aux["flow_l"]))
    assert int(state.step) == 1
    # host step mirror avoids further device syncs
    assert trainer._host_step == 1


def test_host_shard_indices_disjoint_and_complete():
    shards = [host_shard_indices(103, process_index=i, process_count=4)
              for i in range(4)]
    all_idx = np.concatenate(shards)
    assert len(np.unique(all_idx)) == 103
    for i in range(4):
        for j in range(i + 1, 4):
            assert not set(shards[i]) & set(shards[j])


def test_checkpoint_meta_roundtrip(tmp_path):
    from motif_tpu import checkpoint

    state = {"w": np.zeros((2,), np.float32)}
    checkpoint.save_train_state(str(tmp_path), 7, state, meta={"epoch": 3})
    assert checkpoint.latest_step(str(tmp_path)) == 7
    assert checkpoint.restore_meta(str(tmp_path), 7) == {"epoch": 3}
    assert checkpoint.restore_meta(str(tmp_path), 99) == {}


def test_two_process_disjoint_batches(vimeo_flow_tree, tmp_path):
    """Two separate processes, each building the host-sharded loader with its
    own process_index, must draw disjoint sample sets (the DistIterSampler
    guarantee, reference data/data_sampler.py:53-60)."""
    import json
    import subprocess
    import sys as _sys
    import textwrap

    gt, lq, keys = vimeo_flow_tree
    # enlarge the key list so the shard split is meaningful
    big_keys = tmp_path / "keys.txt"
    with open(keys) as f:
        base = f.read().strip().replace("_", "/")
    with open(big_keys, "w") as f:
        for i in range(10):
            f.write(base + "\n")  # 10 copies -> indices 0..9

    script = textwrap.dedent("""
        import json, sys
        import numpy as np
        from motif_tpu.data import Subset, Vimeo7Dataset, BatchLoader
        from motif_tpu.parallel import host_shard_indices

        gt, lq, keys, pi = sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4])
        ds = Vimeo7Dataset(gt, lq, keys=keys, gt_size=16, scale=4, seed=0)
        idx = host_shard_indices(len(ds), process_index=pi, process_count=2)
        sub = Subset(ds, idx)
        loader = BatchLoader(sub, batch_size=1, shuffle=True, seed=pi)
        seen = [int(i) for i in sub.indices]
        n = sum(1 for _ in loader.epoch(0))
        print(json.dumps({"indices": seen, "batches": n}))
    """)
    outs = []
    for pi in range(2):
        r = subprocess.run(
            [_sys.executable, "-c", script, gt, lq, str(big_keys), str(pi)],
            capture_output=True, text=True, cwd="/root/repo", timeout=120,
            env={**os.environ, "JAX_PLATFORMS": "cpu"})
        assert r.returncode == 0, r.stderr[-2000:]
        outs.append(json.loads(r.stdout.strip().splitlines()[-1]))
    s0, s1 = set(outs[0]["indices"]), set(outs[1]["indices"])
    assert not (s0 & s1), "host shards overlap"
    assert s0 | s1 == set(range(10)), "host shards must cover the dataset"
    assert outs[0]["batches"] == len(s0) and outs[1]["batches"] == len(s1)
