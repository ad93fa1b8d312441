"""Build Adobe240- and GoPro-shaped eval trees from the mounted Vid4 sample
so the driver's Adobe 2x-8x temporal sweep, GoPro 8x and streaming demo
configs can execute end-to-end on the chip.

The mount ships only Vid4 (8 frames/video) and a 2-clip Vimeo sample; the
real Adobe240/GoPro frame dumps are not available. This tool ping-pongs
each Vid4 video's 8 frames to the frame count the sliding-window protocols
need (Adobe_test/Gopro_test: interval=7, ref_num=4 → ≥25 frames) and lays
them out as data/adobe240/{HR,LR}/<clip>/NNN.png and
data/gopro/{HR,LR}/<GOPR...>/NNN.png symlinks. PIXELS ARE VID4 — the
resulting PSNR rows exercise the full protocol (window planning, padding,
temporal chunking, metrics) but are NOT Adobe240/GoPro scores; BASELINE.md
labels them accordingly.
"""

import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from motif_tpu.data.datasets import GOPRO_VIDEOS, VID4_VIDEOS

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
N_FRAMES = 32


def pingpong(n_src: int, n_out: int):
    """0,1,..,n-1,n-2,..,1,0,1,.. — temporally continuous frame cycle."""
    cycle = list(range(n_src)) + list(range(n_src - 2, 0, -1))
    return [cycle[i % len(cycle)] for i in range(n_out)]


def build(dst_root: str, clips: list[str], src_videos: list[str]):
    for ci, clip in enumerate(clips):
        src = src_videos[ci % len(src_videos)]
        for res in ("HR", "LR"):
            src_dir = osp.join(ROOT, "data/Vid4", res, src)
            frames = sorted(f for f in os.listdir(src_dir) if f.endswith(".png"))
            dst_dir = osp.join(dst_root, res, clip)
            os.makedirs(dst_dir, exist_ok=True)
            for i, j in enumerate(pingpong(len(frames), N_FRAMES)):
                dst = osp.join(dst_dir, f"{i:03d}.png")
                if not osp.lexists(dst):
                    os.symlink(osp.join(src_dir, frames[j]), dst)


def main():
    build(osp.join(ROOT, "data/adobe240"),
          [f"clip_{v}" for v in VID4_VIDEOS], VID4_VIDEOS)
    build(osp.join(ROOT, "data/gopro"), list(GOPRO_VIDEOS), VID4_VIDEOS)
    print("synthetic eval trees written: data/adobe240, data/gopro "
          f"({N_FRAMES} frames/clip, Vid4 pixels)")


if __name__ == "__main__":
    main()
