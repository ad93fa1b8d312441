"""Dataset catalogs mirroring the reference's sampling rules (SURVEY.md §2.5).

All datasets return channel-last RGB float32 in [0, 1]:
  {'lq': (N_in, H, W, 3), 'gt': (N+2, HH, WW, 3), 'times': (N,), 'key': str}
where gt[0]/gt[-1] are the two anchor frames (duplicated endpoints in the
reference's gt_sampled_idx) — the layout MoTIF's teacher-flow path expects.

Reference parity notes:
 * frames are decoded with cv2 (BGR) then flipped to RGB, exactly like
   data/util.py read_img + the [2,1,0] reindex in each dataset class.
 * window construction follows Adobe_test*/Gopro_test (Adobe_test_3.py:88-109):
   inputs  = frames[i : i + (1+interval)*(ref_num-1) + 1 : 1+interval]
   gts     = frames[i + (1+interval)*k : i + (1+interval)*(k+1) + 1],
   k = (ref_num-1)//2, window stride 1+interval.
 * Vimeo septuplet training follows Vimeo7_dataset.py:112-205 (random
   reverse, random crop, flip/rot augmentation with flow sign fixes).
"""

from __future__ import annotations

import os
import os.path as osp
import pickle
import random
from dataclasses import dataclass, field
from typing import Sequence

import numpy as np

VID4_VIDEOS = ["walk", "foliage", "city", "calendar"]
GOPRO_VIDEOS = [  # Gopro_test.py:89-93
    "GOPR0384_11_00", "GOPR0384_11_05", "GOPR0385_11_01", "GOPR0396_11_00",
    "GOPR0410_11_00", "GOPR0854_11_00", "GOPR0862_11_00", "GOPR0868_11_00",
    "GOPR0869_11_00", "GOPR0871_11_00", "GOPR0881_11_01",
]


def read_img(path: str) -> np.ndarray:
    """cv2 decode → RGB float32 [0,1] HWC (data/util.py:59-83 + reindex).
    The uint8-BGR → float-RGB conversion runs in the native C++ core when
    available (motif_tpu/native)."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 2:
        img = img[:, :, None].repeat(3, 2)
    if img.shape[2] > 3:
        img = img[:, :, :3]
    if img.dtype == np.uint8:
        from motif_tpu import native

        return native.u8bgr_to_f32rgb(img)
    return (img.astype(np.float32) / 255.0)[:, :, ::-1].copy()


def _list_frames(d: str) -> list[str]:
    frames = sorted(int(f[:-4]) for f in os.listdir(d) if f.endswith(".png"))
    return ["{:03d}.png".format(f) for f in frames]


@dataclass
class WindowEvalDataset:
    """Sliding-window eval dataset covering the Adobe_test / Adobe_test_3 /
    Gopro_test / Vimeo_test_44 modes via parameters."""
    gt_root: str
    lq_root: str
    videos: Sequence[str]
    interval: int = 1
    ref_num: int = 4
    gt_sampled_idx: Sequence[int] = (0, 0, 1, 2, 2)
    time_denom: float = 2.0

    def __post_init__(self):
        self.file_list: list[list[str]] = []
        self.gt_list: list[list[str]] = []
        interval_num = self.ref_num - 1
        step = 1 + self.interval
        k = interval_num // 2
        for video in self.videos:
            frames = _list_frames(osp.join(self.gt_root, video))
            index = 0
            while index + step * interval_num < len(frames):
                inputs = [frames[i] for i in range(index, index + step * interval_num + 1, step)]
                gts = [frames[i] for i in range(index + step * k, index + step * (k + 1) + 1)]
                self.file_list.append([osp.join(video, f) for f in inputs])
                self.gt_list.append([osp.join(video, f) for f in gts])
                index += step

    def __len__(self):
        return len(self.file_list)

    def __getitem__(self, index: int) -> dict:
        idx = list(self.gt_sampled_idx)
        gt_paths = np.array([osp.join(self.gt_root, f) for f in self.gt_list[index]])[idx]
        lq_paths = [osp.join(self.lq_root, f) for f in self.file_list[index]]
        lq = np.stack([read_img(p) for p in lq_paths], 0)
        gt = np.stack([read_img(p) for p in gt_paths], 0)
        times = np.asarray([i / self.time_denom for i in idx[1:-1]], np.float32)
        return {"lq": lq, "gt": gt, "times": times,
                "key": self.file_list[index][0]}


@dataclass
class Vimeo7Dataset:
    """Vimeo-90K septuplet training set (Vimeo7_dataset.py). Reads GT frames
    [1]+[1..7]+[7] and LQ frames im1,3,5,7; optional precomputed flow npys;
    random reverse / crop / flip / rot augmentation with flow sign fixes."""
    gt_root: str
    lq_root: str
    keys: Sequence[str] | str = "sep_trainlist.txt"
    gt_size: int = 128
    scale: int = 4
    n_frames: int = 7
    random_reverse: bool = True
    use_flip: bool = True
    use_rot: bool = True
    load_flows: bool = False
    data_type: str = "img"   # 'img' folder tree or 'lmdb' packs
    phase: str = "train"
    seed: int | None = None

    def __post_init__(self):
        if self.data_type == "lmdb":
            from motif_tpu.data.lmdb_io import LmdbFrameSource

            self._gt_src = LmdbFrameSource(self.gt_root)
            self._lq_src = LmdbFrameSource(self.lq_root)
            if self.keys is None or self.keys == "sep_trainlist.txt":
                # default to the pack's own key catalog ('a_b_frame' keys)
                self.keys = sorted({"_".join(k.split("_")[:2])
                                    for k in self._gt_src.keys})
        if isinstance(self.keys, str):
            if osp.exists(self.keys) or osp.isabs(self.keys):
                path = self.keys
            else:  # bare filename: resolve next to the GT root
                path = osp.join(osp.dirname(self.gt_root.rstrip("/")), self.keys)
            if path.endswith(".pkl"):
                with open(path, "rb") as f:
                    self.keys = pickle.load(f)
            else:
                with open(path) as f:
                    self.keys = [l.strip().replace("/", "_")
                                 for l in f if l.strip()]
        half = self.n_frames // 2
        self.lr_index_list = [i * 2 for i in range(1 + half)]  # 0,2,4,6
        self._rng = random.Random(self.seed)

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, index: int) -> dict:
        key = self.keys[index]
        name_a, name_b = key.split("_")
        neighbor = list(range(1, 8))
        reverse = self._rng.random()
        if self.random_reverse and reverse < 0.5:
            neighbor.reverse()

        gt_dir = osp.join(self.gt_root, name_a, name_b)
        lq_dir = osp.join(self.lq_root, name_a, name_b)
        if self.data_type == "lmdb":
            gts = [self._gt_src.read(name_a, name_b, v)
                   for v in [1] + neighbor + [7]]
            lqs = [self._lq_src.read(name_a, name_b, neighbor[i])
                   for i in self.lr_index_list]
        else:
            gts = [read_img(osp.join(gt_dir, f"im{v}.png"))
                   for v in [1] + neighbor + [7]]
            lqs = [read_img(osp.join(lq_dir, f"im{neighbor[i]}.png"))
                   for i in self.lr_index_list]
        times = np.asarray([(v - 1) / 6.0 for v in neighbor], np.float32)

        gt_flow = lr_flow = None
        if self.load_flows:
            # precomputed flows (Vimeo7_dataset.py:143,152): channel-first
            # npys (K, 2, h, w) → channel-last (K, h, w, 2)
            gt_flow = np.load(osp.join(gt_dir, "hr_gt_flow.npy")).astype(np.float32)
            lr_flow = np.load(osp.join(lq_dir, "lr_flow_12.npy")).astype(np.float32)
            if self.random_reverse and reverse < 0.5:
                # Vimeo7_dataset.py:159-162: flip times and anchors
                _, _, h, w = gt_flow.shape
                gt_flow = np.flip(np.flip(gt_flow.reshape(7, 4, 2, h, w), 0), 1
                                  ).reshape(28, 2, h, w)
                lr_flow = np.flip(np.flip(lr_flow.reshape(4, 4, 2, h // 4, w // 4),
                                          0), 1).reshape(16, 2, h // 4, w // 4)

        if self.phase == "train":
            H, W = lqs[0].shape[:2]
            lq_size = self.gt_size // self.scale
            rh = self._rng.randint(0, max(0, H - lq_size))
            rw = self._rng.randint(0, max(0, W - lq_size))
            lqs = [v[rh:rh + lq_size, rw:rw + lq_size] for v in lqs]
            rh4, rw4 = rh * self.scale, rw * self.scale
            gts = [v[rh4:rh4 + self.gt_size, rw4:rw4 + self.gt_size] for v in gts]
            if self.load_flows:
                lr_flow = lr_flow[:, :, rh:rh + lq_size, rw:rw + lq_size]
                gt_flow = gt_flow[:, :, rh4:rh4 + self.gt_size, rw4:rw4 + self.gt_size]
            # flip / rot augmentation with flow sign fixes (data/util.py:92-128)
            hflip = self.use_flip and self._rng.random() < 0.5
            vflip = self.use_rot and self._rng.random() < 0.5
            rot90 = self.use_rot and self._rng.random() < 0.5

            def aug(img):
                if hflip:
                    img = img[:, ::-1]
                if vflip:
                    img = img[::-1]
                if rot90:
                    img = img.transpose(1, 0, 2)
                return np.ascontiguousarray(img)

            def aug_flow(fl):  # fl (K, 2, h, w), channels (u=x, v=y)
                if hflip:
                    fl = fl[:, :, :, ::-1]
                    fl[:, 1] *= -1  # the reference flips channel 1 on hflip
                if vflip:
                    fl = fl[:, :, ::-1, :]
                    fl[:, 0] *= -1
                if rot90:
                    fl = np.flip(fl.transpose(0, 1, 3, 2), 1)
                return np.ascontiguousarray(fl)

            lqs = [aug(v) for v in lqs]
            gts = [aug(v) for v in gts]
            if self.load_flows:
                lr_flow = aug_flow(lr_flow.copy())
                gt_flow = aug_flow(gt_flow.copy())

        out = {"lq": np.stack(lqs, 0), "gt": np.stack(gts, 0),
               "times": times, "key": key}
        if self.load_flows:
            # → model layout: lr (16, h, w, 2); gt (N=7, 4, HH, WW, 2)
            out["flow"] = lr_flow.transpose(0, 2, 3, 1)
            g = gt_flow.transpose(0, 2, 3, 1)
            out["flow_gt"] = g.reshape(7, 4, *g.shape[1:3], 2)
        return out


@dataclass
class AdobeArbitraryDataset:
    """Adobe240 arbitrary space-time training (Adobe_arbitrary.py +
    collate_function, data/__init__.py:91-131): per *batch* a random
    d_scale ∈ [2,4]; GT crop 64*d, LQ = MATLAB-bicubic 1/(2d) of the crop,
    GT = 1/2 downsample. Use with BatchLoader(collate='adobe_a')."""
    root: str
    video_list_file: str | None = None
    n_frames: int = 7
    sample_num: int = 7
    interval: int = 7
    seed: int | None = None

    def __post_init__(self):
        if self.video_list_file:
            with open(self.video_list_file) as f:
                videos = [l.strip() for l in f if l.strip()]
        else:
            videos = sorted(os.listdir(self.root))
        self.file_list, self.gt_list = [], []
        for video in videos:
            frames = _list_frames(osp.join(self.root, video))
            index = 0
            while index + self.interval + 1 < len(frames):
                window = frames[index:index + self.interval + 2]
                self.file_list.append([osp.join(video, f)
                                       for f in [window[0], window[2], window[4], window[6]]])
                self.gt_list.append([osp.join(video, f) for f in window])
                index += self.interval + 1
        self._rng = random.Random(self.seed)

    def __len__(self):
        return len(self.file_list)

    def __getitem__(self, index: int):
        lq = [read_img(osp.join(self.root, p)) for p in self.file_list[index]]
        gts_all = [osp.join(self.root, p) for p in self.gt_list[index]]
        n = len(gts_all)
        picked = sorted(self._rng.sample(range(n), min(self.sample_num, n)))
        idx = [0] + picked + [n - 1]
        gt = [read_img(gts_all[i]) for i in idx]
        times = np.asarray([i / (n - 1) for i in picked], np.float32)
        return {"lq_raw": lq, "gt_raw": gt, "times": times,
                "key": self.file_list[index][0]}


@dataclass
class AdobeSeptupletDataset:
    """Adobe240 fixed-scale training (Adobe_dataset.py / _4 / _flow):
    septuplet windows with stride interval+1, LQ = frames [0,2,4,6] from the
    LQ root, random sample_num GT times at i/8 plus duplicated endpoints.

    load_flows=True adds the Adobe_flow variant's precomputed arrays
    (Adobe_dataset_flow.py:190-258): per window,
    flow_root/<video>/<n1>_<n2>_{flow,psies,flow_GT}.npy — LR anchor flow
    (K,2,h,w), LR reliability psies, and HR GT flow (2,9,2,H,W) subselected
    to the sampled times; all cropped/augmented jointly with the frames
    (sign fixes per data/util.py:92-128 — psies get spatial transforms only)."""
    gt_root: str
    lq_root: str
    video_list_file: str | None = None
    interval: int = 7
    sample_num: int = 7
    gt_size: int = 128
    scale: int = 4
    use_flip: bool = True
    use_rot: bool = True
    load_flows: bool = False
    flow_root: str | None = None
    phase: str = "train"
    seed: int | None = None

    def __post_init__(self):
        if self.video_list_file:
            with open(self.video_list_file) as f:
                videos = [l.strip() for l in f if l.strip()]
        else:
            videos = sorted(os.listdir(self.gt_root))
        self.file_list, self.gt_list = [], []
        for video in videos:
            frames = _list_frames(osp.join(self.gt_root, video))
            index = 0
            while index + self.interval + 1 < len(frames):
                window = frames[index:index + self.interval + 2]
                self.file_list.append(
                    [osp.join(video, window[i]) for i in (0, 2, 4, 6)])
                self.gt_list.append([osp.join(video, f) for f in window[:9]])
                index += self.interval + 1
        self._rng = random.Random(self.seed)

    def __len__(self):
        return len(self.file_list)

    def __getitem__(self, index: int) -> dict:
        lqs = [read_img(osp.join(self.lq_root, p)) for p in self.file_list[index]]
        gt_paths = [osp.join(self.gt_root, p) for p in self.gt_list[index]]
        m = len(gt_paths)
        picked = sorted(self._rng.sample(range(m), min(self.sample_num, m)))
        idx = [0] + picked + [m - 1]
        gts = [read_img(gt_paths[i]) for i in idx]
        times = np.asarray([i / 8.0 for i in picked], np.float32)

        flow = psies = flow_gt = None
        if self.load_flows:
            # Adobe_dataset_flow.py:190-208 — file naming from the first two
            # LQ frame numbers of the window
            video = osp.dirname(self.file_list[index][0])
            n1 = osp.basename(self.file_list[index][0])[:-4]
            n2 = osp.basename(self.file_list[index][1])[:-4]
            base = osp.join(self.flow_root or self.lq_root, video, f"{n1}_{n2}")
            flow = np.load(base + "_flow.npy").astype(np.float32)
            psies = np.load(base + "_psies.npy").astype(np.float32)
            flow_gt = np.load(base + "_flow_GT.npy").astype(np.float32)
            h, w = flow_gt.shape[2], flow_gt.shape[3]
            flow_gt = flow_gt.reshape(2, 9, 2, h, w)[:, picked].reshape(-1, 2, h, w)

        if self.phase == "train":
            H, W = lqs[0].shape[:2]
            lq_size = self.gt_size // self.scale
            rh = self._rng.randint(0, max(0, H - lq_size))
            rw = self._rng.randint(0, max(0, W - lq_size))
            lqs = [v[rh:rh + lq_size, rw:rw + lq_size] for v in lqs]
            rh4, rw4 = rh * self.scale, rw * self.scale
            gts = [v[rh4:rh4 + self.gt_size, rw4:rw4 + self.gt_size] for v in gts]
            if self.load_flows:
                flow = flow[:, :, rh:rh + lq_size, rw:rw + lq_size]
                psies = psies[:, :, rh:rh + lq_size, rw:rw + lq_size]
                flow_gt = flow_gt[:, :, rh4:rh4 + self.gt_size, rw4:rw4 + self.gt_size]

            hflip = self.use_flip and self._rng.random() < 0.5
            vflip = self.use_rot and self._rng.random() < 0.5
            rot90 = self.use_rot and self._rng.random() < 0.5

            def aug(img):
                if hflip:
                    img = img[:, ::-1]
                if vflip:
                    img = img[::-1]
                if rot90:
                    img = img.transpose(1, 0, 2)
                return np.ascontiguousarray(img)

            def aug_flow(fl, signs=True):
                # data/util.py:108-127: flows get channel-1/0 sign fixes on
                # h/v flip; psies (signs=False) only the spatial transforms
                if hflip:
                    fl = fl[:, :, :, ::-1].copy()
                    if signs:
                        fl[:, 1] *= -1
                if vflip:
                    fl = fl[:, :, ::-1, :].copy()
                    if signs:
                        fl[:, 0] *= -1
                if rot90:
                    fl = fl.transpose(0, 1, 3, 2)
                    if signs:
                        fl = np.flip(fl, 1)
                return np.ascontiguousarray(fl)

            lqs = [aug(v) for v in lqs]
            gts = [aug(v) for v in gts]
            if self.load_flows:
                flow = aug_flow(flow.copy())
                psies = aug_flow(psies.copy(), signs=False)
                flow_gt = aug_flow(flow_gt.copy())

        out = {"lq": np.stack(lqs, 0), "gt": np.stack(gts, 0),
               "times": times, "key": self.file_list[index][0]}
        if self.load_flows:
            # model layout (channel-last); flow_gt (2, n, 2, H, W) anchor-
            # major → (n_times, n_anchors=2, HH, WW, 2)
            out["flow"] = flow.transpose(0, 2, 3, 1)
            out["psies"] = psies.transpose(0, 2, 3, 1)
            n = len(picked)
            g = flow_gt.reshape(2, n, 2, *flow_gt.shape[2:])
            out["flow_gt"] = g.transpose(1, 0, 3, 4, 2)
        return out


@dataclass
class VimeoArbitraryDataset:
    """Vimeo arbitrary-scale training (Vimeo_dataset_arbitrary.py): returns
    raw HR frame lists for the batch-level collate (collate_function_vimeo,
    data/__init__.py:133-173 → pipeline.collate_adobe_arbitrary with
    lq_size=32)."""
    gt_root: str
    keys: Sequence[str] | str = "sep_trainlist.txt"
    sample_num: int = 7
    seed: int | None = None

    def __post_init__(self):
        if isinstance(self.keys, str):
            path = self.keys if osp.exists(self.keys) else osp.join(
                osp.dirname(self.gt_root.rstrip("/")), self.keys)
            with open(path) as f:
                self.keys = [l.strip().replace("/", "_") for l in f if l.strip()]
        self._rng = random.Random(self.seed)

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, index: int) -> dict:
        name_a, name_b = self.keys[index].split("_")
        d = osp.join(self.gt_root, name_a, name_b)
        frames = [read_img(osp.join(d, f"im{v}.png")) for v in range(1, 8)]
        picked = sorted(self._rng.sample(range(9), self.sample_num))
        # 9 GT slots = [im1] + im1..7 + [im7] like the reference's i/8 grid
        gts_all = [frames[0]] + frames + [frames[6]]
        idx = [0] + picked + [8]
        gt = [gts_all[i] for i in idx]
        lq = [frames[i] for i in (0, 2, 4, 6)]
        times = np.asarray([i / 8.0 for i in picked], np.float32)
        return {"lq_raw": lq, "gt_raw": gt, "times": times,
                "key": self.keys[index]}


@dataclass
class ArbitraryScaleTestDataset:
    """GoPro arbitrary space-time test (Adobe_arbitrary_test.py +
    collate_function_test): interval = time-1, all GT frames, crop 720x1248,
    LQ = MATLAB bicubic 1/d_scale."""
    root: str
    videos: Sequence[str] = field(default_factory=lambda: list(GOPRO_VIDEOS))
    ref_num: int = 4
    time: int = 9
    d_scale: float = 4.0

    def __post_init__(self):
        self.interval = self.time - 1
        self._base = WindowEvalDataset(
            self.root, self.root, self.videos,
            interval=self.interval, ref_num=self.ref_num,
            gt_sampled_idx=[0] + list(range(self.time)) + [self.time - 1],
            time_denom=float(self.time - 1))

    def __len__(self):
        return len(self._base)

    def __getitem__(self, index: int):
        from motif_tpu.ops.resize import imresize_matlab_np

        item = self._base[index]
        gt = item["gt"][:, :720, :1248]
        lq_hr = item["lq"][:, :720, :1248]
        lq = np.stack([imresize_matlab_np(v * 255.0, 1.0 / self.d_scale) / 255.0
                       for v in lq_hr], 0).astype(np.float32)
        return {"lq": lq, "gt": gt, "times": item["times"], "key": item["key"]}


def create_dataset(opt: dict):
    """Factory keyed by the reference mode strings (data/__init__.py:57-88)."""
    mode = opt["mode"]
    if mode in ("Adobe_test", "Adobe_test_3", "Gopro_test", "Vimeo_test_44"):
        presets = {
            # Adobe_test.py:168-176 / Gopro_test.py:174-182: [0,0,1..8,8], i/8
            "Adobe_test": dict(interval=7, gt_sampled_idx=[0, 0] + list(range(1, 9)) + [8],
                               time_denom=8.0),
            # Adobe_test_3.py:158-166 (default test.yml): [0,0,1,2,2], i/2
            "Adobe_test_3": dict(interval=1, gt_sampled_idx=[0, 0, 1, 2, 2], time_denom=2.0),
            "Gopro_test": dict(interval=7, gt_sampled_idx=[0, 0] + list(range(1, 9)) + [8],
                               time_denom=8.0),
            # Vimeo_test_44.py:87,165: [0,0,1..6,6], i/6
            "Vimeo_test_44": dict(interval=5, gt_sampled_idx=[0, 0] + list(range(1, 7)) + [6],
                                  time_denom=6.0),
        }
        p = presets[mode]
        videos = opt.get("videos")
        if videos is None:
            videos = (VID4_VIDEOS if mode in ("Adobe_test_3", "Vimeo_test_44")
                      else GOPRO_VIDEOS if mode == "Gopro_test"
                      else sorted(os.listdir(opt["dataroot_GT"])))
        return WindowEvalDataset(opt["dataroot_GT"], opt["dataroot_LQ"], videos,
                                 ref_num=opt.get("ref_num", 4), **p)
    if mode == "vimeo":
        # The reference Vimeo7_dataset ALWAYS loads the precomputed flow npys
        # (Vimeo7_dataset.py:143,152); `load_flows: false` in the yml opts out
        # (e.g. when training a 2-anchor model that computes teacher flow live).
        return Vimeo7Dataset(opt["dataroot_GT"], opt["dataroot_LQ"],
                             keys=opt.get("cache_keys") or "sep_trainlist.txt",
                             gt_size=opt.get("GT_size", 128),
                             scale=opt.get("scale", 4),
                             n_frames=opt.get("N_frames", 7),
                             random_reverse=opt.get("random_reverse", True),
                             use_flip=opt.get("use_flip", True),
                             use_rot=opt.get("use_rot", True),
                             load_flows=bool(opt.get("load_flows", False)),
                             data_type=opt.get("data_type", "img"),
                             phase=opt.get("phase", "train"))
    if mode == "Adobe_a":
        return AdobeArbitraryDataset(opt["dataroot_GT"],
                                     video_list_file=opt.get("video_list"),
                                     sample_num=opt.get("sample_num", 7))
    if mode in ("Adobe", "Adobe_4", "Adobe_flow"):
        return AdobeSeptupletDataset(opt["dataroot_GT"], opt["dataroot_LQ"],
                                     video_list_file=opt.get("video_list"),
                                     sample_num=opt.get("sample_num", 7),
                                     gt_size=opt.get("GT_size", 128),
                                     scale=opt.get("scale", 4),
                                     use_flip=opt.get("use_flip", True),
                                     use_rot=opt.get("use_rot", True),
                                     load_flows=(mode == "Adobe_flow"),
                                     flow_root=opt.get("flow_root"),
                                     phase=opt.get("phase", "train"))
    if mode == "vimeo_a":
        return VimeoArbitraryDataset(opt["dataroot_GT"],
                                     keys=opt.get("cache_keys") or "sep_trainlist.txt",
                                     sample_num=opt.get("sample_num", 7))
    if mode == "Gopro_test_a":
        return ArbitraryScaleTestDataset(opt["dataroot_GT"],
                                         videos=opt.get("videos", GOPRO_VIDEOS),
                                         time=opt.get("time", 9),
                                         d_scale=opt.get("d_scale", 4.0))
    raise NotImplementedError(f"Dataset mode [{mode}] is not recognized.")
