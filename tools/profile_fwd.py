"""Per-stage timing of the MoTIF inference forward at the bench config
(LQ 64x112 -> HR 256x448, N=3 times, RAFT iters=4), plus microbenchmarks of
splat-scatter alternatives. Run on the real chip; results feed BASELINE.md.

Each stage is jitted standalone with the real initialized params and the
shapes the full forward uses, so the sum approximates the full forward
(XLA cross-stage fusion makes the full graph slightly cheaper).
"""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, reps=3, inner=20):
    # Reduce to one on-device scalar: the axon tunnel costs ~32 ms roundtrip
    # and ~30 MB/s, so fetching stage outputs would swamp kernel time.
    red = jax.jit(lambda *a: jax.tree.reduce(
        jnp.add, jax.tree.map(lambda x: jnp.sum(x, dtype=jnp.float32), fn(*a))))
    float(red(*args))  # compile + warm-up
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = red(*args)
        float(out)
        ts.append((time.perf_counter() - t0) / inner)
    return float(np.median(ts)) * 1e3  # ms


def main():
    from motif_tpu.models.motif import MoTIF
    from motif_tpu.models.raft import RAFT
    from motif_tpu.models.encoder import ZSMEncoder
    from motif_tpu.models.siren import Siren
    from motif_tpu.ops.softsplat import splat_fused

    B, N_in, H, W, S, N = 1, 4, 64, 112, 4, 3
    HH, WW = H * S, W * S
    n = 2
    rng = np.random.default_rng(0)

    model = MoTIF(setting=5)
    x0 = jnp.zeros((1, N_in, 16, 16, 3), jnp.float32)
    tt0 = jnp.zeros((1, N), jnp.float32)
    params = jax.jit(lambda k: model.init(k, x0, tt0, (64, 64), iters=1))(
        jax.random.PRNGKey(0))["params"]

    class Report(dict):
        def __setitem__(self, k, v):
            super().__setitem__(k, v)
            print(f"{k:38s} {v:8.2f} ms", flush=True)

    report = Report()

    # --- full forward ---
    x = jnp.asarray(rng.random((B, N_in, H, W, 3), dtype=np.float32))
    tt = jnp.asarray(np.tile(np.linspace(0, 1, N, dtype=np.float32), (B, 1)))
    fwd = jax.jit(lambda p, x, tt: model.apply(
        {"params": p}, x, tt, (HH, WW), use_gt=False, iters=4)[0])
    report["full_forward"] = timeit(fwd, params, x, tt)

    model_bf = MoTIF(setting=5, compute_dtype="bfloat16", fused_decode=True)
    fwd_bf = jax.jit(lambda p, x, tt: model_bf.apply(
        {"params": p}, x, tt, (HH, WW), use_gt=False, iters=4)[0])
    report["full_forward_bf16_fused"] = timeit(fwd_bf, params, x, tt)

    model_srv = MoTIF(setting=5, compute_dtype="bfloat16", fused_decode=True,
                      splat_method="base")
    fwd_srv = jax.jit(lambda p, x, tt: model_srv.apply(
        {"params": p}, x, tt, (HH, WW), use_gt=False, iters=4)[0])
    report["full_forward_serving(base splat)"] = timeit(fwd_srv, params, x, tt)

    model_srv2 = MoTIF(setting=5, compute_dtype="bfloat16", fused_decode=True,
                       splat_method="base", raft_resolution=0.5)
    fwd_srv2 = jax.jit(lambda p, x, tt: model_srv2.apply(
        {"params": p}, x, tt, (HH, WW), use_gt=False, iters=4)[0])
    report["full_forward_serving(+raft@hr/2)"] = timeit(fwd_srv2, params, x, tt)

    model_srv3 = MoTIF(setting=5, compute_dtype="bfloat16", fused_decode=True,
                       splat_method="scan", raft_resolution=0.5)
    fwd_srv3 = jax.jit(lambda p, x, tt: model_srv3.apply(
        {"params": p}, x, tt, (HH, WW), use_gt=False, iters=4)[0])
    report["full_forward_serving(scan,raft/2)"] = timeit(fwd_srv3, params, x, tt)

    # --- RAFT: 4 directed HR pairs, iters=4 ---
    src = jnp.asarray(rng.random((n * n * B, HH, WW, 3), dtype=np.float32)) * 255.0
    dst = jnp.asarray(rng.random((n * n * B, HH, WW, 3), dtype=np.float32)) * 255.0
    raft_fn = jax.jit(lambda p, a, b: RAFT().apply({"params": p}, a, b, iters=4))
    report["raft_4pairs_hr"] = timeit(raft_fn, params["flow_predictor"], src, dst)

    # --- ZSM encoder on LR ---
    fr = jnp.asarray(rng.random((B, 2, H, W, 3), dtype=np.float32))
    enc_fn = jax.jit(lambda p, f: ZSMEncoder(64).apply({"params": p}, f))
    report["zsm_encoder_lr"] = timeit(enc_fn, params["encoder"], fr)
    enc_bf = jax.jit(lambda p, f: ZSMEncoder(64).apply(
        {"params": p}, f.astype(jnp.bfloat16)))
    report["zsm_encoder_lr_bf16"] = timeit(enc_bf, params["encoder"], fr)

    # --- SIRENs at HR token counts ---
    sti = jnp.asarray(rng.random((n * B * N, HH * WW, 67), dtype=np.float32))
    si = jnp.asarray(rng.random((n * B, HH * WW, 66), dtype=np.float32))
    syn = jnp.asarray(rng.random((B * N, HH * WW, 198), dtype=np.float32))
    f_im = jax.jit(lambda p, a: Siren([64, 64, 256], 2, 3).apply({"params": p}, a))
    s_im = jax.jit(lambda p, a: Siren([64, 64, 256], 2, 64).apply({"params": p}, a))
    s_net = jax.jit(lambda p, a: Siren([64, 64, 64, 256], 3, 3).apply({"params": p}, a))
    report["flow_imnet(6x114688x67)"] = timeit(f_im, params["flow_imnet"], sti)
    report["imnet(2x114688x66)"] = timeit(s_im, params["imnet"], si)
    report["synth_net(3x114688x198)"] = timeit(s_net, params["synth_net"], syn)

    # --- splat at the real shape ---
    feat = jnp.asarray(rng.random((n * B * N, HH, WW, 130), dtype=np.float32))
    flw = jnp.asarray((rng.random((n * B * N, HH, WW, 2), dtype=np.float32) - 0.5) * 20)
    z = jnp.asarray(rng.random((n * B * N, HH, WW, 1), dtype=np.float32)) * -2
    sp = jax.jit(lambda f, fl, zz: splat_fused(f, fl, zz,
                                               z_nonpositive=jnp.asarray(True)))
    report["splat_fused(6,256,448,130)"] = timeit(sp, feat, flw, z)
    feat66 = feat[..., :66]
    report["splat_fused(6,256,448,66)"] = timeit(sp, feat66, flw, z)

    # --- RAFT in bf16 at HR and at LR (the restructure candidates) ---
    raft_bf = jax.jit(lambda p, a, b: RAFT().apply(
        {"params": p}, a.astype(jnp.bfloat16), b.astype(jnp.bfloat16), iters=4))
    report["raft_4pairs_hr_bf16"] = timeit(raft_bf, params["flow_predictor"], src, dst)
    src_lr = src[:, :H, :W]
    dst_lr = dst[:, :H, :W]
    report["raft_4pairs_lr_bf16"] = timeit(raft_bf, params["flow_predictor"], src_lr, dst_lr)

    print("done")


if __name__ == "__main__":
    main()
