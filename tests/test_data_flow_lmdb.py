"""Tests for the Adobe_flow precomputed-array path and the lmdb IO layer
(reference Adobe_dataset_flow.py:190-258 and data/util.py:34-83)."""

import os
import pickle

import numpy as np
import pytest

from motif_tpu.data import AdobeSeptupletDataset, Vimeo7Dataset, create_dataset
from motif_tpu.data.lmdb_io import (LmdbFrameSource, parse_size, read_img_lmdb,
                                    read_meta)


@pytest.fixture(scope="module")
def adobe_flow_tree(tmp_path_factory):
    """Adobe240-style video dir + flow npys in the reference layout."""
    import cv2

    root = tmp_path_factory.mktemp("adobe_flow")
    gt = root / "GT" / "clip0"
    lq = root / "LQ" / "clip0"
    fl = root / "FLOW" / "clip0"
    for d in (gt, lq, fl):
        os.makedirs(d)
    rng = np.random.default_rng(0)
    for i in range(10):
        cv2.imwrite(str(gt / f"{i:03d}.png"),
                    rng.integers(0, 255, (32, 48, 3), np.uint8))
        cv2.imwrite(str(lq / f"{i:03d}.png"),
                    rng.integers(0, 255, (8, 12, 3), np.uint8))
    # window 0 uses LQ frames 000,002,004,006 → files named 000_002_*
    np.save(fl / "000_002_flow.npy",
            rng.normal(size=(4, 2, 8, 12)).astype(np.float32))
    np.save(fl / "000_002_psies.npy",
            rng.normal(size=(4, 3, 8, 12)).astype(np.float32))
    np.save(fl / "000_002_flow_GT.npy",
            rng.normal(size=(2, 9, 2, 32, 48)).reshape(18, 2, 32, 48)
            .astype(np.float32))
    return str(root / "GT"), str(root / "LQ"), str(root / "FLOW")


def test_adobe_flow_dataset_shapes(adobe_flow_tree):
    gt, lq, fl = adobe_flow_tree
    ds = AdobeSeptupletDataset(gt, lq, sample_num=3, gt_size=16, scale=4,
                               load_flows=True, flow_root=fl, seed=0)
    item = ds[0]
    assert item["lq"].shape == (4, 4, 4, 3)
    assert item["flow"].shape == (4, 4, 4, 2)
    assert item["psies"].shape == (4, 4, 4, 3)
    # (n_times, n_anchors=2, HH, WW, 2)
    assert item["flow_gt"].shape == (3, 2, 16, 16, 2)
    assert np.isfinite(item["flow_gt"]).all()


def test_adobe_flow_time_subselection(adobe_flow_tree):
    """flow_GT rows must follow the sampled times (reference reshape
    (2,9,2,h,w)[:, picked])."""
    gt, lq, fl = adobe_flow_tree
    ds = AdobeSeptupletDataset(gt, lq, sample_num=3, gt_size=32, scale=4,
                               load_flows=True, flow_root=fl,
                               phase="test", seed=1)  # no crop/augment
    item = ds[0]
    picked = np.round(item["times"] * 8).astype(int)
    raw = np.load(os.path.join(fl, "clip0", "000_002_flow_GT.npy"))
    raw = raw.reshape(2, 9, 2, 32, 48)
    want = raw[:, picked]                     # (2, n, 2, H, W)
    got = item["flow_gt"]                     # (n, 2, H, W, 2)
    for t in range(len(picked)):
        for a in range(2):
            np.testing.assert_allclose(
                got[t, a].transpose(2, 0, 1), want[a, t])


def test_create_dataset_adobe_flow(adobe_flow_tree):
    gt, lq, fl = adobe_flow_tree
    ds = create_dataset({"mode": "Adobe_flow", "dataroot_GT": gt,
                         "dataroot_LQ": lq, "flow_root": fl,
                         "sample_num": 3, "GT_size": 16, "scale": 4})
    assert ds.load_flows and ds.flow_root == fl


# ---------------------------------------------------------------------------
# lmdb
# ---------------------------------------------------------------------------

class _StubTxn:
    def __init__(self, store):
        self.store = store

    def get(self, key):
        return self.store.get(key)

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _StubEnv:
    """Duck-typed lmdb environment (env.begin(write=False) → txn.get)."""

    def __init__(self, store):
        self.store = store

    def begin(self, write=False):
        return _StubTxn(self.store)


def _make_pack(tmp_path, keys, shape=(3, 8, 12)):
    rng = np.random.default_rng(0)
    store, raw = {}, {}
    for k in keys:
        img = rng.integers(0, 255, (shape[1], shape[2], shape[0]), np.uint8)
        store[k.encode("ascii")] = img.tobytes()
        raw[k] = img
    with open(tmp_path / "meta_info.pkl", "wb") as f:
        pickle.dump({"keys": keys,
                     "resolution": [f"{shape[0]}_{shape[1]}_{shape[2]}"]}, f)
    return store, raw


def test_lmdb_meta_and_read(tmp_path):
    keys = [f"00001_0001_{v}" for v in range(1, 8)]
    store, raw = _make_pack(tmp_path, keys)
    got_keys, sizes = read_meta(str(tmp_path))
    assert got_keys == keys and len(sizes) == len(keys)
    assert parse_size(sizes[0]) == (3, 8, 12)

    env = _StubEnv(store)
    img = read_img_lmdb(env, keys[0], sizes[0])
    assert img.shape == (8, 12, 3) and img.dtype == np.float32
    # BGR buffer → RGB float
    np.testing.assert_allclose(img[..., 0], raw[keys[0]][..., 2] / 255.0)
    with pytest.raises(KeyError):
        read_img_lmdb(env, "missing", sizes[0])


def test_vimeo7_lmdb_source(tmp_path, monkeypatch):
    """Vimeo7Dataset(data_type='lmdb') reads frames through LmdbFrameSource."""
    gt_keys = [f"00001_0001_{v}" for v in range(1, 8)]
    os.makedirs(tmp_path / "gt" / "00001" / "0001", exist_ok=True)
    os.makedirs(tmp_path / "lq" / "00001" / "0001", exist_ok=True)
    gt_store, _ = _make_pack(tmp_path / "gt", gt_keys, (3, 32, 48))
    lq_store, _ = _make_pack(tmp_path / "lq", gt_keys, (3, 8, 12))
    # flow npys still live on disk next to the (virtual) frames
    rng = np.random.default_rng(0)
    np.save(tmp_path / "gt" / "00001" / "0001" / "hr_gt_flow.npy",
            rng.normal(size=(28, 2, 32, 48)).astype(np.float32))
    np.save(tmp_path / "lq" / "00001" / "0001" / "lr_flow_12.npy",
            rng.normal(size=(16, 2, 8, 12)).astype(np.float32))

    stores = {str(tmp_path / "gt"): gt_store, str(tmp_path / "lq"): lq_store}
    monkeypatch.setattr("motif_tpu.data.lmdb_io.open_lmdb",
                        lambda path: _StubEnv(stores[path]))

    (tmp_path / "gt").mkdir(exist_ok=True)
    ds = Vimeo7Dataset(str(tmp_path / "gt"), str(tmp_path / "lq"),
                       keys=None, gt_size=16, scale=4, data_type="lmdb",
                       load_flows=True, seed=0)
    assert list(ds.keys) == ["00001_0001"]
    item = ds[0]
    assert item["lq"].shape == (4, 4, 4, 3)
    assert item["gt"].shape == (9, 16, 16, 3)
    assert item["flow"].shape == (16, 4, 4, 2)
