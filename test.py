"""Evaluation CLI — the reference test.py equivalent (yml-driven).

Usage: python test.py [-opt test.yml]

Reproduces the reference protocol: /4 LQ padding, per-family forward
dispatch (VideoSR_base_model.py:169-200 — Ours 3-times chunks, Ours_44
per-time, LIIF list output, EDVR repeat, Super_SloMo factor, TMNet/ZSM),
Y-channel PSNR (anchor/inter/center) + MATLAB SSIM, per-clip .npy dumps
under ./psnrs/.
"""

import argparse
import logging


def main(overrides: dict | None = None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, default="test.yml")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="orbax step/params dir or reference .pth to load")
    parser.add_argument("--max_clips", type=int, default=None)
    args, _ = parser.parse_known_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from motif_tpu.utils import config as cfg
    from motif_tpu.data import create_dataset, BatchLoader
    from motif_tpu.models.factory import define_g, EVAL_CHUNK
    from motif_tpu.eval import Evaluator
    from motif_tpu import checkpoint

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    logger = logging.getLogger("base")

    opt = cfg.parse(args.opt, is_train=False)
    if overrides:
        # the test_tmp.py sweep path (reference test_tmp.py:305-314 mutates
        # opt['scale'] / dataset 'time' between runs)
        for k, v in overrides.items():
            if k in ("scale",):
                opt[k] = v
                opt["datasets"]["train"]["scale"] = v
                opt["datasets"]["train"]["d_scale"] = v
            else:
                opt["datasets"]["train"][k] = v
    dataset_opt = opt["datasets"]["train"]  # the reference test.yml uses 'train'
    dataset = create_dataset(dataset_opt)
    loader = BatchLoader(dataset, batch_size=1, shuffle=False)
    logger.info("dataset %s: %d clips", dataset_opt["mode"], len(dataset))

    net_opt = opt["network_G"]
    which = net_opt.get("which_model_G") or "Ours"
    model = define_g(net_opt)
    params = _init_params(model, which, jax, jnp)

    ckpt = args.checkpoint or opt["path"].get("pretrain_model_G")
    if ckpt:
        import os

        if os.path.exists(ckpt):
            params = checkpoint.load_params(ckpt, params, logger)
        else:
            logger.warning("checkpoint %s not found — evaluating random init", ckpt)

    ev = Evaluator(model, params, scale=int(opt.get("scale") or 4),
                   iters=4, chunk=EVAL_CHUNK.get(which, 3), family=which)

    def limited():
        for i, b in enumerate(loader.epoch(0)):
            if args.max_clips and i >= args.max_clips:
                break
            yield b

    res = ev.run(limited(), save_psnr_dir="./psnrs", logger=logger,
                 name=str(opt.get("name") or "psnrs"))
    s = res.summary()
    logger.info("FINAL: %s", s)
    print(s)
    return s


def _init_params(model, which: str, jax, jnp):
    """Initialize the param tree with a tiny family-appropriate trace."""
    rng = jax.random.PRNGKey(0)
    if which.startswith("Ours"):
        n_in = 4
        x0 = jnp.zeros((1, n_in, 16, 16, 3), jnp.float32)
        tt0 = jnp.zeros((1, 2), jnp.float32)
        return model.init(rng, x0, tt0, (64, 64), iters=1)["params"]
    if which == "LIIF":
        x0 = jnp.zeros((1, 2, 16, 16, 3), jnp.float32)
        tt0 = jnp.zeros((1, 2), jnp.float32)
        return model.init(rng, x0, tt0, (64, 64))["params"]
    if which == "EDVR":
        x0 = jnp.zeros((1, model.num_frame, 32, 32, 3), jnp.float32)
        return model.init(rng, x0)["params"]
    if which == "Super_SloMo":
        x0 = jnp.zeros((1, 2, 64, 64, 3), jnp.float32)
        return model.init(rng, x0, 2)["params"]
    if which == "TMNet":
        x0 = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
        tt0 = jnp.full((1, 3), 0.5, jnp.float32)
        return model.init(rng, x0, tt0)["params"]
    # ZSM / Zooming
    x0 = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    return model.init(rng, x0)["params"]


if __name__ == "__main__":
    main()
