"""Image dump CLI — the reference generate.py equivalent: run the eval
pipeline on the first N clips and save output / GT / diff images.

Usage: python generate.py [-opt test.yml] [--max_clips 1] [--out_dir test_out]
"""

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-opt", type=str, default="test.yml")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--max_clips", type=int, default=1)
    p.add_argument("--out_dir", type=str, default="test_out")
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from motif_tpu.utils import config as cfg
    from motif_tpu.data import create_dataset, BatchLoader
    from motif_tpu.models.factory import define_g
    from motif_tpu.eval import Evaluator
    from motif_tpu.utils.video import save_img

    opt = cfg.parse(args.opt, is_train=False)
    dataset = create_dataset(opt["datasets"]["train"])
    loader = BatchLoader(dataset, batch_size=1, shuffle=False)

    model = define_g(opt["network_G"])
    x0 = jnp.zeros((1, 4, 16, 16, 3), jnp.float32)
    tt0 = jnp.zeros((1, 2), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, tt0, (64, 64), iters=1)["params"]
    ev = Evaluator(model, params, scale=int(opt.get("scale") or 4), iters=4)

    os.makedirs(args.out_dir, exist_ok=True)
    for it, batch in enumerate(loader.epoch(0)):
        if it >= args.max_clips:
            break
        gt = batch["gt"][:, 1:-1]
        H, W = gt.shape[2], gt.shape[3]
        fake, _ = ev.infer(batch["lq"], batch["times"], (H, W))
        for n in range(fake.shape[0]):
            save_img(fake[n, 0], os.path.join(args.out_dir, f"clip{it}_t{n}_out.png"))
            save_img(gt[0, n], os.path.join(args.out_dir, f"clip{it}_t{n}_gt.png"))
            diff = np.abs(fake[n, 0] - gt[0, n]).mean(-1, keepdims=True).repeat(3, -1)
            save_img(diff * 5.0, os.path.join(args.out_dir, f"clip{it}_t{n}_diff.png"))
        print(f"clip {it}: saved {fake.shape[0]} frames to {args.out_dir}")


if __name__ == "__main__":
    main()
