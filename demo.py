"""Streaming video inference CLI — the reference demo.py equivalent:
slide over consecutive frame pairs, synthesize `time_scale` intermediate
frames per pair at `space_scale` spatial upsampling, save PNGs (and
optionally mux a video).

Usage:
  python demo.py --frames_dir in/ --out_dir out/ --space_scale 4 \
                 --time_scale 8 [--model Ours|TMNet] [--checkpoint best.pth]
"""

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--model", default="Ours")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--space_scale", type=int, default=4)
    p.add_argument("--time_scale", type=int, default=8)
    p.add_argument("--downsample", type=float, default=1.0,
                   help="pre-downsample inputs (the reference uses 1/8 to "
                        "avoid OOM, demo.py:80-81)")
    p.add_argument("--fps", type=int, default=0, help="mux video at this fps")
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from motif_tpu.models.factory import define_g
    from motif_tpu.ops.resize import imresize_matlab_np
    from motif_tpu.utils.video import create_video, read_seq_imgs, save_img
    from motif_tpu import checkpoint as ckpt_lib

    frames = read_seq_imgs(args.frames_dir)
    if args.downsample != 1.0:
        frames = np.stack([imresize_matlab_np(f * 255, args.downsample) / 255
                           for f in frames], 0).astype(np.float32)
    T, H, W, _ = frames.shape
    H4, W4 = H // 4 * 4, W // 4 * 4
    frames = frames[:, :H4, :W4]
    print(f"{T} frames at {H4}x{W4}, x{args.space_scale} space, "
          f"x{args.time_scale} time")

    model = define_g({"which_model_G": args.model})
    x0 = jnp.zeros((1, 4, 16, 16, 3), jnp.float32)
    tt0 = jnp.zeros((1, args.time_scale), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, tt0, (64, 64), iters=1)["params"]
    if args.checkpoint:
        # torch .pth (reference bridge) or native orbax dir / checkpoint root
        params = ckpt_lib.load_params(args.checkpoint, params)

    HH, WW = H4 * args.space_scale, W4 * args.space_scale
    times = jnp.asarray([[i / args.time_scale for i in range(args.time_scale)]],
                        dtype=jnp.float32)

    fwd = jax.jit(lambda p, x, t: model.apply(
        {"params": p}, x, t, (HH, WW), use_gt=False, iters=4)[0])

    os.makedirs(args.out_dir, exist_ok=True)
    n_out = 0
    for i in range(T - 1):
        pair = frames[i:i + 2]
        x = jnp.asarray(np.stack([pair[0], pair[0], pair[1], pair[1]], 0))[None]
        out = np.asarray(fwd(params, x, times))  # (time_scale, 1, HH, WW, 3)
        for k in range(out.shape[0]):
            save_img(out[k, 0], os.path.join(args.out_dir, f"{n_out:06d}.png"))
            n_out += 1
        print(f"pair {i + 1}/{T - 1} → {n_out} frames", flush=True)

    if args.fps:
        create_video("", args.out_dir,
                     os.path.join(args.out_dir, "output.mp4"), args.fps)


if __name__ == "__main__":
    main()
