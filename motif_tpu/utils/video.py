"""Video / sequence utilities (reference utils/util.py:198-353 and
video.py): sliding-window planning, frame IO, ffmpeg muxing."""

from __future__ import annotations

import os
import os.path as osp
import subprocess

import numpy as np


def read_seq_imgs(img_seq_path: str) -> np.ndarray:
    """Read a directory of frames → (T, H, W, 3) RGB float32 [0,1]
    (utils/util.py:259-269)."""
    from motif_tpu.data.datasets import read_img

    paths = sorted(
        osp.join(img_seq_path, f) for f in os.listdir(img_seq_path)
        if f.lower().endswith((".png", ".jpg", ".jpeg")))
    return np.stack([read_img(p) for p in paths], 0)


def test_index_generation(skip: bool, n_out: int, len_in: int) -> list[list[list[int]]]:
    """Sliding-window eval plan (reference utils/util.py:272-316).

    skip: inputs are every other frame of the output window (VFI-style);
    n_out: frames the network produces per window; len_in: total frames.
    Returns [[input_indices, output_indices], ...] with a tail window
    appended when the stride would miss the last frame — exactly the
    reference semantics, e.g.::

        (skip=False, N_out=3, len_in=5) → [[0,1],[0,1,2]], [[1,2],[2,3,4]]
        (skip=True,  N_out=3, len_in=5) → [[0,2],[0,1,2]], [[2,4],[2,3,4]]
    """
    n_in = 1 + n_out // 2
    assert n_in <= len_in, "input too short for the window size"

    plans: list[list[list[int]]] = []
    if skip:
        right = n_out
        while right <= len_in:
            h_list = [right - n_out + x for x in range(n_out)]
            plans.append([h_list[::2], h_list])
            right += n_out - 1
        if right < len_in - 1:   # tail coverage (utils/util.py:306-309)
            h_list = [len_in - n_out + x for x in range(n_out)]
            plans.append([h_list[::2], h_list])
    else:
        right = n_out
        right_in = n_in
        while right_in <= len_in:
            h_list = [right - n_out + x for x in range(n_out)]
            l_list = [right_in - n_in + x for x in range(n_in)]
            plans.append([l_list, h_list])
            right += n_out - 1
            right_in += n_in - 1
        if right_in < len_in - 1:  # tail (utils/util.py:310-315)
            right = len_in * 2 - 1
            h_list = [right - n_out + x for x in range(n_out)]
            l_list = [len_in - n_in + x for x in range(n_in)]
            plans.append([l_list, h_list])
    return plans


def tensor2img(arr: np.ndarray, min_max=(0.0, 1.0)) -> np.ndarray:
    """Float image (H, W, 3) RGB [0,1] → uint8 BGR for cv2.imwrite
    (utils/util.py:105-129 semantics: clamp, scale, round)."""
    a = np.clip(arr, *min_max)
    a = (a - min_max[0]) / (min_max[1] - min_max[0])
    a = (a * 255.0).round().astype(np.uint8)
    return a[..., ::-1]  # RGB → BGR


def save_img(img_rgb: np.ndarray, path: str) -> None:
    import cv2

    cv2.imwrite(path, tensor2img(img_rgb))


def extract_frames(ffmpeg_dir: str, video: str, out_dir: str) -> None:
    """ffmpeg video → frames (utils/util.py:323-337)."""
    cmd = [osp.join(ffmpeg_dir, "ffmpeg") if ffmpeg_dir else "ffmpeg",
           "-i", video, "-vsync", "0", "-qscale:v", "2",
           osp.join(out_dir, "%06d.png")]
    subprocess.run(cmd, check=True)


def create_video(ffmpeg_dir: str, frame_dir: str, output: str, fps: int = 30,
                 pattern: str = "%06d.png") -> None:
    """frames → video (utils/util.py:340-353 / video.py)."""
    cmd = [osp.join(ffmpeg_dir, "ffmpeg") if ffmpeg_dir else "ffmpeg",
           "-r", str(fps), "-i", osp.join(frame_dir, pattern),
           "-vcodec", "libx264", "-crf", "18", "-pix_fmt", "yuv420p",
           "-y", output]
    subprocess.run(cmd, check=True)


class ProgressBar:
    """Minimal ProgressBar parity (utils/util.py:198-245)."""

    def __init__(self, task_num: int = 0, bar_width: int = 50):
        self.task_num = task_num
        self.completed = 0

    def update(self, msg: str = ""):
        self.completed += 1
        if self.task_num:
            print(f"[{self.completed}/{self.task_num}] {msg}", flush=True)
        else:
            print(f"completed: {self.completed}, {msg}", flush=True)
