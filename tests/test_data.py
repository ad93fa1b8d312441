"""Data-layer tests with synthetic frame directories."""

import os

import numpy as np
import pytest

from motif_tpu.data import (BatchLoader, Vimeo7Dataset, WindowEvalDataset,
                            create_dataset)
from motif_tpu.data.pipeline import collate_adobe_arbitrary


@pytest.fixture(scope="module")
def frame_tree(tmp_path_factory):
    """videos/<name>/000.png .. 017.png (tiny, valued by index)."""
    import cv2

    root = tmp_path_factory.mktemp("frames")
    for video in ["walk", "foliage"]:
        d = root / video
        d.mkdir()
        for i in range(18):
            img = np.full((16, 20, 3), i * 10 % 255, np.uint8)
            cv2.imwrite(str(d / f"{i:03d}.png"), img)
    return str(root)


@pytest.fixture(scope="module")
def vimeo_tree(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("vimeo")
    gt = root / "GT"
    lq = root / "LQ"
    for base, size in ((gt, (32, 48)), (lq, (8, 12))):
        d = base / "00001" / "0001"
        os.makedirs(d)
        for v in range(1, 8):
            img = np.full((*size, 3), v * 20, np.uint8)
            cv2.imwrite(str(d / f"im{v}.png"), img)
    with open(root / "keys.txt", "w") as f:
        f.write("00001_0001\n")
    return str(gt), str(lq), str(root / "keys.txt")


def test_window_eval_dataset_adobe_test_3(frame_tree):
    ds = WindowEvalDataset(frame_tree, frame_tree, ["walk", "foliage"],
                           interval=1, ref_num=4,
                           gt_sampled_idx=[0, 0, 1, 2, 2], time_denom=2.0)
    # per video: windows while i + 2*3 < 18 → i in 0,2,..,10 → 6 windows
    assert len(ds) == 12
    item = ds[0]
    assert item["lq"].shape == (4, 16, 20, 3)
    assert item["gt"].shape == (5, 16, 20, 3)
    np.testing.assert_allclose(item["times"], [0.0, 0.5, 1.0])
    # anchors duplicate interior endpoints
    np.testing.assert_array_equal(item["gt"][0], item["gt"][1])
    np.testing.assert_array_equal(item["gt"][-1], item["gt"][-2])


def test_create_dataset_registry(frame_tree):
    ds = create_dataset({"mode": "Adobe_test_3", "dataroot_GT": frame_tree,
                         "dataroot_LQ": frame_tree, "videos": ["walk"]})
    assert len(ds) == 6
    ds8 = create_dataset({"mode": "Adobe_test", "dataroot_GT": frame_tree,
                          "dataroot_LQ": frame_tree, "videos": ["walk"],
                          "ref_num": 2})
    item = ds8[0]
    assert item["times"].shape == (9,)
    np.testing.assert_allclose(item["times"], np.arange(9) / 8.0)


def test_vimeo7_dataset(vimeo_tree):
    gt, lq, keys = vimeo_tree
    ds = Vimeo7Dataset(gt, lq, keys=keys, gt_size=16, scale=4, seed=0)
    item = ds[0]
    assert item["lq"].shape == (4, 4, 4, 3)
    assert item["gt"].shape == (9, 16, 16, 3)
    assert item["times"].shape == (7,)
    assert set(np.round(item["times"] * 6).astype(int)) == set(range(7))


def test_batch_loader_and_prefetch(frame_tree):
    ds = WindowEvalDataset(frame_tree, frame_tree, ["walk"], interval=1,
                           ref_num=4, gt_sampled_idx=[0, 0, 1, 2, 2])
    loader = BatchLoader(ds, batch_size=2, shuffle=True, seed=0)
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    assert batches[0]["lq"].shape == (2, 4, 16, 20, 3)
    from motif_tpu.data import device_prefetch

    out = list(device_prefetch(loader.epoch(1)))
    assert len(out) == 3


def test_collate_adobe_arbitrary(frame_tree):
    import random

    items = []
    for _ in range(2):
        frames = [np.random.default_rng(0).random((200, 200, 3), np.float32)
                  for _ in range(4)]
        gts = [np.random.default_rng(1).random((200, 200, 3), np.float32)
               for _ in range(9)]
        items.append({"lq_raw": frames, "gt_raw": gts,
                      "times": np.linspace(0, 1, 7, dtype=np.float32)})
    batch = collate_adobe_arbitrary(items, lq_size=32, rng=random.Random(0))
    B, N, h, w, _ = batch["lq"].shape
    assert B == 2 and N == 4
    gh, gw = batch["gt"].shape[2:4]
    # GT = crop/2, LQ = crop/(2d) → LQ = GT/d with d in [2,4]
    assert gh / 4 - 1 <= h <= gh / 2 + 1
    assert batch["out_hw"] == (gh, gw)


def test_adobe_septuplet_and_vimeo_arbitrary(frame_tree, vimeo_tree):
    from motif_tpu.data import AdobeSeptupletDataset, VimeoArbitraryDataset

    # same-size GT/LQ roots in the fixture → use scale=1 for valid crops
    ds = AdobeSeptupletDataset(frame_tree, frame_tree, interval=7,
                               sample_num=3, gt_size=8, scale=1, seed=0)
    assert len(ds) > 0
    item = ds[0]
    assert item["lq"].shape == (4, 8, 8, 3)
    assert item["gt"].shape == (5, 8, 8, 3)
    assert item["times"].shape == (3,)
    assert np.all((item["times"] >= 0) & (item["times"] <= 1))

    gt, lq, keys = vimeo_tree
    dv = VimeoArbitraryDataset(gt, keys=keys, sample_num=3, seed=0)
    it = dv[0]
    assert len(it["lq_raw"]) == 4 and len(it["gt_raw"]) == 5
    assert it["times"].shape == (3,)


def test_flow_io_roundtrip(rng, tmp_path):
    from motif_tpu.utils.flow_io import read_flow, write_flow, flow_to_image

    flow = rng.standard_normal((6, 8, 2)).astype(np.float32) * 4
    path = str(tmp_path / "x.flo")
    write_flow(path, flow)
    got = read_flow(path)
    np.testing.assert_array_equal(got, flow)
    img = flow_to_image(flow)
    assert img.shape == (6, 8, 3) and img.dtype == np.uint8


def test_index_generation_matches_reference():
    """Window planner vs the reference implementation imported directly
    (pure python, utils/util.py:272-316)."""
    import sys
    import types

    from motif_tpu.utils.video import test_index_generation as ours

    # utils/util.py pulls torchvision for unrelated helpers
    tv = types.ModuleType("torchvision")
    tv_u = types.ModuleType("torchvision.utils")
    tv_u.make_grid = object
    tv.utils = tv_u
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.utils", tv_u)
    sys.path.insert(0, "/root/reference")
    try:
        from utils.util import test_index_generation as ref  # type: ignore
    finally:
        sys.path.remove("/root/reference")

    for skip in (False, True):
        for n_out in (3, 5):
            for len_in in (5, 7, 9, 12):
                if 1 + n_out // 2 > len_in:
                    continue
                assert ours(skip, n_out, len_in) == ref(skip, n_out, len_in), (
                    skip, n_out, len_in)
