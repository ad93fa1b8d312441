"""Sub-profile of the ZSM encoder stages at the bench config (LR 64x112,
B=1, N=2 frames), fp32 vs bf16 — locates the encoder's 80 ms.

Stages (models/encoder.py): conv_first+5 RBs + pyramid convs | PCDAlign
| BiDeformableConvLSTM | 40-RB recon trunk; plus the DCN op alone.
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
    red = jax.jit(lambda *a: jax.tree.reduce(
        jnp.add, jax.tree.map(lambda x: jnp.sum(x, dtype=jnp.float32), fn(*a))))
    float(red(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = red(*args)
        float(out)
        ts.append((time.perf_counter() - t0) / inner)
    return float(np.median(ts)) * 1e3


def main():
    from flax import linen as nn

    from motif_tpu.models.encoder import ZSMEncoder
    from motif_tpu.models.layers import Conv2d, ResBlocks, lrelu
    from motif_tpu.models.pcd import BiDeformableConvLSTM, PCDAlign
    from motif_tpu.ops.dcn import dcn_v2

    B, H, W, nf = 1, 64, 112, 64
    rng = np.random.default_rng(0)

    enc = ZSMEncoder(nf)
    x = jnp.asarray(rng.random((B, 2, H, W, 3), dtype=np.float32))
    # jit the init: eager init executes op-by-op through the axon relay
    # (~32 ms/op roundtrip), which takes tens of minutes for this graph.
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), x)["params"]

    class Report(dict):
        def __setitem__(self, k, v):
            super().__setitem__(k, v)
            print(f"{k:40s} {v:8.2f} ms", flush=True)

    report = Report()

    for dt, tag in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        xx = x.astype(dt)
        report[f"encoder_full_{tag}"] = timeit(
            jax.jit(lambda p, a: enc.apply({"params": p}, a)), params, xx)

        # front: conv_first + 5 RBs + pyramid convs (r4 scan-stacked layout)
        class Front(nn.Module):
            @nn.compact
            def __call__(self, f):
                l1 = lrelu(Conv2d(nf, 3, 1, 1, name="conv_first")(f))
                l1 = ResBlocks(nf, 5, name="feature_extraction")(l1)
                l2 = lrelu(Conv2d(nf, 3, 2, 1, name="fea_L2_conv1")(l1))
                l2 = lrelu(Conv2d(nf, 3, 1, 1, name="fea_L2_conv2")(l2))
                l3 = lrelu(Conv2d(nf, 3, 2, 1, name="fea_L3_conv1")(l2))
                l3 = lrelu(Conv2d(nf, 3, 1, 1, name="fea_L3_conv2")(l3))
                return l1, l2, l3

        front = Front()
        fl = xx.reshape(B * 2, H, W, 3)
        report[f"front_{tag}"] = timeit(
            jax.jit(lambda p, a: front.apply({"params": p}, a)), params, fl)

        # PCD align (one pair)
        l1 = jnp.asarray(rng.random((B, H, W, nf), dtype=np.float32), dt)
        l2 = jnp.asarray(rng.random((B, H // 2, W // 2, nf), dtype=np.float32), dt)
        l3 = jnp.asarray(rng.random((B, H // 4, W // 4, nf), dtype=np.float32), dt)
        pcd = PCDAlign(nf, groups=8)
        report[f"pcd_align_{tag}"] = timeit(
            jax.jit(lambda p, a, b, c: pcd.apply(
                {"params": p}, [a, b, c], [a, b, c], None, None)),
            params["pcd_align"], l1, l2, l3)

        # ConvLSTM over T=3
        seq = jnp.asarray(rng.random((B, 3, H, W, nf), dtype=np.float32), dt)
        lstm = BiDeformableConvLSTM(nf, groups=8)
        report[f"conv_blstm_{tag}"] = timeit(
            jax.jit(lambda p, a: lstm.apply({"params": p}, a)),
            params["ConvBLSTM"], seq)

        # recon trunk: 40 RBs at (3, H, W, nf) (r4 scan-stacked layout)
        class Trunk(nn.Module):
            @nn.compact
            def __call__(self, f):
                return ResBlocks(nf, 40, name="recon_trunk")(f)

        trunk = Trunk()
        tin = jnp.asarray(rng.random((3 * B, H, W, nf), dtype=np.float32), dt)
        report[f"recon_trunk40_{tag}"] = timeit(
            jax.jit(lambda p, a: trunk.apply({"params": p}, a)), params, tin)

        # DCN op alone (L1 shape, 8 deformable groups)
        feat = jnp.asarray(rng.random((B, H, W, nf), dtype=np.float32), dt)
        off = jnp.asarray(rng.normal(size=(B, H, W, 8 * 2 * 9)), np.float32).astype(dt)
        mask = jnp.asarray(rng.random((B, H, W, 8 * 9), dtype=np.float32), dt)
        wk = jnp.asarray(rng.normal(size=(3, 3, nf, nf)), np.float32).astype(dt) * 0.05
        bk = jnp.zeros((nf,), dt)
        report[f"dcn_l1_{tag}"] = timeit(
            jax.jit(lambda f, o, m, w, b: dcn_v2(f, o, m, w, b,
                                                 deformable_groups=8)),
            feat, off, mask, wk, bk)

    print("done")


if __name__ == "__main__":
    main()
