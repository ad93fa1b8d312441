"""Training CLI — the reference train.py equivalent, yml-driven.

Usage: python train.py -opt configs/train_Ours_vimeo.yml

Replaces torch DDP launch with a single-controller JAX mesh: all local
devices form the 'data' axis; multihost runs shard the file list by
jax.process_index() (motif_tpu/parallel/mesh.py).
"""

import argparse
import logging
import math
import os
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", type=str, required=True, help="Path to YAML config.")
    parser.add_argument("--max_steps", type=int, default=None,
                        help="Override train.niter (smoke runs).")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from motif_tpu.utils import config as cfg
    from motif_tpu.data import create_dataset, BatchLoader, Subset, device_prefetch
    from motif_tpu.models.factory import define_g
    from motif_tpu.parallel import make_mesh, shard_batch, host_shard_indices
    from motif_tpu.trainer import Trainer
    from motif_tpu import checkpoint

    opt = cfg.parse(args.opt, is_train=True)
    os.makedirs(opt["path"]["experiments_root"] or "experiments", exist_ok=True)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s: %(message)s")
    logger = logging.getLogger("base")

    seed = (opt.get("train") or {}).get("manual_seed") or 0
    np.random.seed(seed)

    net_opt = opt["network_G"]
    which = net_opt.get("which_model_G") or "Ours"
    # train.py trains any define_G model like the reference (train.py:140 →
    # networks.py:17-61); in practice the grid uses the Ours family and LIIF.
    family = "LIIF" if which == "LIIF" else "Ours"
    assert which.startswith("Ours") or which == "LIIF", \
        f"no training recipe for [{which}] (reference grid: Ours*/LIIF)"
    model = define_g(net_opt)
    # Ours_44 / Ours_4 train from precomputed flow npys (Vimeo7_dataset.py:
    # 143,152 + Ours_44.py flows branch); Ours_ZSM trains without the flow
    # distillation term (VideoSR_base_model.py:138-139,153).
    four_anchor = getattr(model, "n_anchors", 2) == 4
    flow_loss = which != "Ours_ZSM"

    dataset_opt = dict(opt["datasets"]["train"])
    mode = dataset_opt.get("mode") or ""
    arbitrary = mode.endswith("_a")   # Adobe_a / vimeo_a batch-level collate
    if four_anchor and mode == "vimeo":
        dataset_opt.setdefault("load_flows", True)
    dataset = create_dataset(dataset_opt)
    if jax.process_count() > 1:
        # multihost: shard the sample list by host (DistIterSampler rank
        # striding, reference data/data_sampler.py:53-60); each host loads
        # its slice of the global batch.
        dataset = Subset(dataset, host_shard_indices(len(dataset)))
    global_batch = int(dataset_opt.get("batch_size") or 1)
    assert global_batch % jax.process_count() == 0, \
        f"batch_size {global_batch} must divide over {jax.process_count()} hosts"
    batch_size = global_batch // jax.process_count()
    collate_kw = {}
    if arbitrary:
        # arbitrary space-time collate (collate_function(_vimeo),
        # data/__init__.py:91-173): random per-batch d_scale, MATLAB-bicubic
        # LQ synthesis, bucketed GT sizes (one compiled step per bucket).
        import functools
        import random as _random
        from motif_tpu.data import collate_adobe_arbitrary
        lq_size = int(dataset_opt.get("LQ_size") or
                      (32 if mode == "vimeo_a" else 64))
        collate_kw["collate"] = functools.partial(
            collate_adobe_arbitrary, lq_size=lq_size,
            rng=_random.Random(seed + jax.process_index()))
    loader = BatchLoader(dataset, batch_size=batch_size, shuffle=True,
                         seed=seed + jax.process_index(),
                         epoch_ratio=int(opt.get("dataset_ratio") or 200),
                         **collate_kw)

    scale = int(opt.get("scale") or 4)
    gt_size = int(dataset_opt.get("GT_size") or 128)
    out_hw = None if arbitrary else (gt_size, gt_size)

    mesh = make_mesh()
    trainer = Trainer(model, cfg.trainer_config_from_opt(opt), out_hw,
                      iters=int(net_opt.get("iters") or 12), mesh=mesh,
                      flow_loss=flow_loss, seed=seed, family=family)

    sample = next(iter(loader.epoch(0)))
    state = trainer.init_state(jax.random.PRNGKey(seed), sample)
    logger.info("model initialised: %d params",
                sum(p.size for p in jax.tree_util.tree_leaves(state.params)))

    ckpt_dir = opt["path"]["models"] or "experiments/models"
    start = checkpoint.latest_step(ckpt_dir)
    epoch = 0
    if start:
        state = checkpoint.restore_train_state(ckpt_dir, start, state)
        epoch = int(checkpoint.restore_meta(ckpt_dir, start).get("epoch", 0))
        logger.info("resumed from step %d (epoch %d)", start, epoch)

    niter = args.max_steps or int(opt["train"]["niter"])
    save_freq = int((opt.get("logger") or {}).get("save_checkpoint_freq") or 5000)
    print_freq = int((opt.get("logger") or {}).get("print_freq") or 100)

    # scalar metrics stream (TensorBoard-replacement; one JSON per log step)
    import json
    metrics_path = os.path.join(opt["path"]["experiments_root"] or ".",
                                "train_log.jsonl")
    metrics_f = open(metrics_path, "a") if jax.process_index() == 0 else None

    step = int(state.step)  # one sync; afterwards the host counter tracks it
    t0 = time.time()
    while step < niter:
        for batch in device_prefetch(loader.epoch(epoch), shard_batch(mesh)):
            if step >= niter:
                break
            state, aux = trainer.step(state, batch)
            step += 1
            if step % print_freq == 0:
                s_it = (time.time() - t0) / max(1, print_freq)
                logger.info("step %d/%d loss %.4f l_pix %.4f lr %.2e use_gt %s (%.2f s/it)",
                            step, niter, float(aux["loss"]), float(aux["l_pix"]),
                            float(aux["lr"]), aux["use_gt"], s_it)
                if metrics_f:
                    metrics_f.write(json.dumps({
                        "step": step, "loss": float(aux["loss"]),
                        "l_pix": float(aux["l_pix"]),
                        "flow_l": float(aux.get("flow_l", 0.0)),
                        "lr": float(aux["lr"]), "use_gt": aux["use_gt"],
                        "s_per_it": s_it, "epoch": epoch,
                        "time": time.time()}) + "\n")
                    metrics_f.flush()
                t0 = time.time()
            if step % save_freq == 0 and jax.process_index() == 0:
                checkpoint.save_train_state(ckpt_dir, step, state,
                                            meta={"epoch": epoch})
                logger.info("saved checkpoint at step %d", step)
        epoch += 1
    if jax.process_index() == 0:
        if checkpoint.latest_step(ckpt_dir) != step:  # periodic save may have
            checkpoint.save_train_state(ckpt_dir, step, state,  # just run
                                        meta={"epoch": epoch})
        logger.info("training done at step %d", step)


if __name__ == "__main__":
    main()
