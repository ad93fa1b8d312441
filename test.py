"""Evaluation CLI — the reference test.py equivalent (yml-driven).

Usage: python test.py [-opt test.yml]

Reproduces the reference protocol: /4 LQ padding, 3-times temporal
chunking, Y-channel PSNR (anchor/inter/center) + MATLAB SSIM, per-clip
.npy dumps under ./psnrs/.
"""

import argparse
import logging


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, default="test.yml")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="orbax step dir or reference .pth to load")
    parser.add_argument("--max_clips", type=int, default=None)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from motif_tpu.utils import config as cfg
    from motif_tpu.data import create_dataset, BatchLoader
    from motif_tpu.models.motif import MoTIF
    from motif_tpu.eval import Evaluator
    from motif_tpu import checkpoint

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    logger = logging.getLogger("base")

    opt = cfg.parse(args.opt, is_train=False)
    dataset_opt = opt["datasets"]["train"]  # the reference test.yml uses 'train'
    dataset = create_dataset(dataset_opt)
    loader = BatchLoader(dataset, batch_size=1, shuffle=False)
    logger.info("dataset %s: %d clips", dataset_opt["mode"], len(dataset))

    net_opt = opt["network_G"]
    model = MoTIF(setting=int(net_opt.get("setting") or 5))
    x0 = jnp.zeros((1, 4, 16, 16, 3), jnp.float32)
    tt0 = jnp.zeros((1, 2), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, tt0, (64, 64), iters=1)["params"]

    ckpt = args.checkpoint or opt["path"].get("pretrain_model_G")
    if ckpt and ckpt.endswith(".pth"):
        import os
        if os.path.exists(ckpt):
            ported = checkpoint.load_reference_checkpoint(ckpt)
            problems = checkpoint.verify_port(params, ported)
            extra = [p for p in problems if p.startswith("extra")]
            missing = [p for p in problems if not p.startswith("extra")]
            if missing:
                logger.warning("port issues: %s", missing[:10])
            params = jax.tree_util.tree_map(
                lambda a, b: b, params,
                _merge(params, ported))
            logger.info("loaded reference checkpoint %s (%d unused keys)",
                        ckpt, len(extra))
        else:
            logger.warning("checkpoint %s not found — evaluating random init", ckpt)

    ev = Evaluator(model, params, scale=int(opt.get("scale") or 4), iters=4)

    def limited():
        for i, b in enumerate(loader.epoch(0)):
            if args.max_clips and i >= args.max_clips:
                break
            yield b

    res = ev.run(limited(), save_psnr_dir="./psnrs", logger=logger)
    s = res.summary()
    logger.info("FINAL: %s", s)
    print(s)


def _merge(target, ported):
    """Use ported leaves where present, keep target elsewhere."""
    if not isinstance(target, dict):
        return ported if ported is not None else target
    return {k: _merge(target[k], ported.get(k)) if k in ported else target[k]
            for k in target}


if __name__ == "__main__":
    main()
