"""Training-step throughput bench on the real TPU.

Measures steady-state s/it for:
  * Ours_44 + precomputed flows (the flagship Vimeo recipe)
  * Ours (2-anchor) with live RAFT teacher flow (train.py default path)

Usage: python tools/bench_train.py [--batch 1] [--gt 128] [--steps 10]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--gt", type=int, default=128)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--iters", type=int, default=4, help="RAFT iters (Ours path)")
    p.add_argument("--recipe", choices=["ours44", "ours", "both"], default="both")
    p.add_argument("--dtype", default=None,
                   help="compute_dtype for the conv trunk (e.g. bfloat16)")
    p.add_argument("--fused", action="store_true",
                   help="fused_decode (66-ch splat payload: kills the 131->256"
                        " lane-padding that blows up batch-8 memory)")
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    from motif_tpu.models.motif import MoTIF
    from motif_tpu.parallel import make_mesh, shard_batch
    from motif_tpu.trainer import Trainer, TrainerConfig

    B, GT = args.batch, args.gt
    H = GT // 4
    N = 7
    mesh = make_mesh()
    rng = np.random.default_rng(0)

    def run(name, model, batch, iters):
        trainer = Trainer(model, TrainerConfig(lr=1e-4), (GT, GT),
                          iters=iters, mesh=mesh)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        batch = jax.device_put(batch, shard_batch(mesh))
        t_c = time.time()
        state, aux = trainer.step(state, batch)   # compile + step
        float(aux["loss"])  # host fetch: the only honest sync via the relay
        compile_s = time.time() - t_c
        # force the single use_gt variant we just compiled
        trainer._rng.random = lambda: 0.0  # always < ratio -> use_gt=True
        per = []
        for _ in range(args.steps):
            t0 = time.time()
            state, aux = trainer.step(state, batch)
            float(aux["loss"])
            per.append(time.time() - t0)
        s_it = sum(per) / len(per)
        print(f"  per-step: {[f'{v:.2f}' for v in per]}", flush=True)
        print(f"{name}: {s_it*1e3:.0f} ms/it (batch {B}, GT {GT}, N {N}; "
              f"first step+compile {compile_s:.0f}s; loss {float(aux['loss']):.1f})",
              flush=True)
        return s_it

    common = {
        "lq": rng.random((B, 4, H, H, 3), dtype=np.float32),
        "gt": rng.random((B, N + 2, GT, GT, 3), dtype=np.float32),
        "times": np.tile(np.linspace(0, 1, N, dtype=np.float32), (B, 1)),
    }

    if args.recipe in ("ours44", "both"):
        batch44 = dict(common,
                       flow=rng.standard_normal((B, 16, H, H, 2)).astype(np.float32),
                       flow_gt=rng.standard_normal((B, N, 4, GT, GT, 2)).astype(np.float32))
        run("Ours_44 + precomputed flows",
            MoTIF(setting=5, n_anchors=4, compute_dtype=args.dtype,
                  fused_decode=args.fused),
            batch44, iters=args.iters)
    if args.recipe in ("ours", "both"):
        run("Ours (live RAFT teacher)",
            MoTIF(setting=5, n_anchors=2, compute_dtype=args.dtype,
                  fused_decode=args.fused),
            common, iters=args.iters)


if __name__ == "__main__":
    main()
