"""Round-5 lever measurements, one chip session:
1. serving fwd e2e with the new headline knobs (ywin DCN auto, f16 scatter,
   raft@HR/2) — the bench.py configuration;
2. same but DCN backend = pallas VMEM sampler (re-decide the r3 'fences
   fusion' verdict now that the XLA path is t1-bandwidth-bound);
3. same but DCN backend = onehot_full (isolate the ywin e2e gain);
4. dcn_l1 op alone under each backend (bf16);
5. splat v3 ring kernel vs base/base_f16 at serving sizes.
"""

import sys
import os.path as osp
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, reps=3, inner=15):
    red = jax.jit(lambda *a: jax.tree.reduce(
        jnp.add, jax.tree.map(lambda x: jnp.sum(x, dtype=jnp.float32),
                              fn(*a))))
    float(red(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = red(*args)
        float(out)
        ts.append((time.perf_counter() - t0) / inner)
    return float(np.median(ts)) * 1e3


def serving_fwd(n_times=3):
    from motif_tpu.models.motif import MoTIF

    model = MoTIF(setting=5, compute_dtype="bfloat16", fused_decode=True,
                  splat_method="base", splat_dtype="float16",
                  raft_resolution=0.5)
    B, N_in, H, W, S = 1, 4, 64, 112, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, N_in, H, W, 3), dtype=np.float32))
    tt = jnp.asarray(
        np.tile(np.linspace(0, 1, n_times, dtype=np.float32), (B, 1)))
    x0 = jnp.zeros((1, N_in, 16, 16, 3), jnp.float32)
    tt0 = jnp.zeros((1, n_times), jnp.float32)
    params = jax.jit(lambda k: model.init(k, x0, tt0, (64, 64), iters=1))(
        jax.random.PRNGKey(0))["params"]
    fn = lambda p, a, t: model.apply({"params": p}, a, t, (H * S, W * S),
                                     use_gt=False, iters=4)[0]
    return fn, params, x, tt


def main():
    from motif_tpu.ops import dcn as dcn_mod

    for backend in (None, "ywin", "pallas"):
        dcn_mod.set_backend(backend)
        fn, params, x, tt = serving_fwd()
        ms = timeit(fn, params, x, tt)
        print(f"serving fwd (dcn={backend or 'auto/ywin'}): {ms:7.2f} ms "
              f"({3000.0 / ms:6.2f} f/s)", flush=True)
    dcn_mod.set_backend(None)

    # dcn op alone, bf16 L1 at conv-lstm batch (2 = both directions)
    rng = np.random.default_rng(0)
    B, H, W, nf = 2, 64, 112, 64
    dt = jnp.bfloat16
    feat = jnp.asarray(rng.random((B, H, W, nf), dtype=np.float32), dt)
    off = jnp.asarray(rng.normal(size=(B, H, W, 8 * 2 * 9)),
                      np.float32).astype(dt)
    mask = jnp.asarray(rng.random((B, H, W, 8 * 9), dtype=np.float32), dt)
    wk = jnp.asarray(rng.normal(size=(3, 3, nf, nf)),
                     np.float32).astype(dt) * 0.05
    bk = jnp.zeros((nf,), dt)
    for backend in ("onehot", "ywin", "pallas"):
        ms = timeit(lambda f, o, m, w, b, be=backend: dcn_mod.dcn_v2(
            f, o, m, w, b, deformable_groups=8, backend=be),
            feat, off, mask, wk, bk)
        print(f"dcn_l1_bf16 B2 ({backend}): {ms:7.3f} ms", flush=True)

    # splat v3 vs base at serving sizes
    from motif_tpu.ops.softsplat import splat_fused

    B, H, W, C = 6, 256, 448, 64
    img = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))
    z = jnp.asarray(-np.abs(rng.random((B, H, W, 1), dtype=np.float32)))
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    u = 25 * np.sin(2 * np.pi * yy / 180.0) * np.cos(2 * np.pi * xx / 300.0)
    v = 18 * np.cos(2 * np.pi * yy / 230.0 + 1.0) * np.sin(
        2 * np.pi * xx / 260.0)
    flow_s = jnp.asarray(np.stack([u, v], -1)[None].repeat(B, 0), jnp.float32)
    flow_j = flow_s + jnp.asarray(
        rng.standard_normal((B, H, W, 2)) * 1.5, jnp.float32)
    tnp = jnp.asarray(True)
    for name, fl in (("smooth", flow_s), ("jitter", flow_j)):
        for meth, kw in (("base_f16", {"scatter_dtype": jnp.float16}),
                         ("pallas_v3_bf16", {"scatter_dtype": jnp.bfloat16})):
            m = "base" if meth.startswith("base") else "pallas"
            ms = timeit(lambda i, f, zz, kw=kw, m=m: splat_fused(
                i, f, zz, z_nonpositive=tnp, method=m, **kw), img, fl, z)
            print(f"splat {name:7s} {meth:15s} {ms:8.2f} ms", flush=True)
    o_b = splat_fused(img, flow_s, z, z_nonpositive=tnp, method="base")
    o_p = splat_fused(img, flow_s, z, z_nonpositive=tnp, method="pallas",
                      scatter_dtype=jnp.bfloat16)
    print("splat v3 bf16 vs base fp32 out[0] max|d|",
          f"{float(jnp.max(jnp.abs(o_b[0] - o_p[0]))):.2e}", flush=True)
    print("done")


if __name__ == "__main__":
    main()
