"""Precompute the Vimeo-90K flow npys that the reference training recipe
consumes (Vimeo7_dataset.py:143,152 — `hr_gt_flow.npy` / `lr_flow_12.npy`).

The reference repo ships no generator for these files (its authors produced
them offline with a fine-tuned RAFT); this tool fills that gap using the
framework's own RAFT-small, batched over all pairs of a clip in one jitted
call per shape bucket.

Layout written (channel-first, matching the reference loader):
  LR_root/<a>/<b>/lr_flow_12.npy : (16, 2, h, w)   flow anchor_i -> anchor_j
                                   over LR frames im1,3,5,7 (i*4+j order,
                                   self-pairs zeroed)
  GT_root/<a>/<b>/hr_gt_flow.npy : (28, 2, H, W)   flow anchor_a -> time_t
                                   over GT frames, t-major ((t*4+a) order,
                                   reshaped (7, 4, 2, H, W) by the loader)

Usage:
  python tools/precompute_flows.py --gt_root data/vimeo/GT \
      --lq_root data/vimeo/LR --keys data/vimeo/keys.txt \
      [--checkpoint raft.pth|orbax_dir] [--iters 12]

Without --checkpoint the RAFT is randomly initialized (seed 0) — only
useful for pipeline smoke tests, and flagged as such in the log.
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def load_keys(path: str) -> list[str]:
    if path.endswith(".pkl"):
        import pickle

        with open(path, "rb") as f:
            return pickle.load(f)
    with open(path) as f:
        return [l.strip().replace("/", "_") for l in f if l.strip()]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gt_root", required=True)
    p.add_argument("--lq_root", required=True)
    p.add_argument("--keys", required=True,
                   help=".txt (a/b per line) or Vimeo7_train_keys.pkl")
    p.add_argument("--checkpoint", default=None,
                   help="RAFT weights: torch .pth (ported) or orbax dir")
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--overwrite", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    from motif_tpu.data.datasets import read_img
    from motif_tpu.models.raft import RAFT

    model = RAFT()
    params = None
    if args.checkpoint:
        from motif_tpu import checkpoint as ckpt

        if args.checkpoint.endswith((".pth", ".pt")):
            sd = ckpt.load_reference_checkpoint(args.checkpoint)
            params = ckpt.port_torch_state_dict(sd)
        else:
            import orbax.checkpoint as ocp

            with ocp.StandardCheckpointer() as c:
                params = c.restore(osp.abspath(args.checkpoint))
    keys = load_keys(args.keys)

    fwd_cache: dict[tuple, callable] = {}

    def raft_flow(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
        """src/dst: (B, H, W, 3) float32 in [0,1] -> (B, H, W, 2) flow."""
        nonlocal params
        shape = src.shape
        if params is None:
            print("WARNING: no --checkpoint given; using a randomly "
                  "initialized RAFT (smoke-test flows only)")
            params = model.init(jax.random.PRNGKey(0), jnp.asarray(src[:1]),
                                jnp.asarray(dst[:1]), iters=1)["params"]
        if shape not in fwd_cache:
            fwd_cache[shape] = jax.jit(
                lambda a, b: model.apply({"params": params}, a * 255.0,
                                         b * 255.0, iters=args.iters))
        return np.asarray(fwd_cache[shape](jnp.asarray(src), jnp.asarray(dst)))

    anchors_idx = [1, 3, 5, 7]
    for key in keys:
        a, b = key.split("_")
        gt_dir, lq_dir = osp.join(args.gt_root, a, b), osp.join(args.lq_root, a, b)
        lr_out = osp.join(lq_dir, "lr_flow_12.npy")
        hr_out = osp.join(gt_dir, "hr_gt_flow.npy")
        if not args.overwrite and osp.exists(lr_out) and osp.exists(hr_out):
            continue

        lqs = np.stack([read_img(osp.join(lq_dir, f"im{i}.png"))
                        for i in anchors_idx], 0)
        gts = np.stack([read_img(osp.join(gt_dir, f"im{i}.png"))
                        for i in range(1, 8)], 0)
        gt_anchors = gts[[0, 2, 4, 6]]

        # LR anchor->anchor, 16 pairs i*4+j. RAFT needs >=64 px inputs, so
        # mirror the model's own live procedure (Ours.py:540-554): upsample
        # the LR frames to the GT resolution, run RAFT there, then
        # downsample the flow back and rescale by (h/HH). Self-pairs zeroed
        # like Ours.py:551-553.
        from motif_tpu.ops.resize import interpolate_bilinear

        h, w = lqs.shape[1:3]
        HH, WW = gts.shape[1:3]
        lqs_hr = np.asarray(interpolate_bilinear(jnp.asarray(lqs), (HH, WW)))
        src = np.concatenate([np.repeat(lqs_hr[i:i + 1], 4, 0) for i in range(4)], 0)
        dst = np.tile(lqs_hr, (4, 1, 1, 1))
        lr_flow = raft_flow(src, dst)
        lr_flow = np.asarray(interpolate_bilinear(jnp.asarray(lr_flow),
                                                  (h, w))) * (h / HH)
        for i in range(4):
            lr_flow[i * 4 + i] = 0.0
        np.save(lr_out, lr_flow.transpose(0, 3, 1, 2).astype(np.float32))

        # HR anchor->time, t-major: row t*4+a = flow(anchor_a -> frame_t)
        src = np.tile(gt_anchors, (7, 1, 1, 1))
        dst = np.repeat(gts, 4, 0)
        hr_flow = raft_flow(src, dst)
        np.save(hr_out, hr_flow.transpose(0, 3, 1, 2).astype(np.float32))
        print(f"{key}: wrote {lr_out} {lr_flow.shape} and {hr_out} {hr_flow.shape}")


if __name__ == "__main__":
    main()
