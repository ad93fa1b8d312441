"""Microbench: does a half-precision scatter payload speed up the base
splat? Post-synth-fold the payload is 64+2 channels; if the XLA scatter is
byte-bound (base@66 43ms vs base@130 75ms suggests ~0.5ms/ch slope), f16/
bf16 payloads should roughly halve it. Also probes indices_are_sorted and
a per-map (B=1) scatter split. Feeds the splat_dtype decision."""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, reps=5, inner=4):
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
    from motif_tpu.ops.softsplat import splat_fused

    Bs, H, W = 6, 256, 448
    rng = np.random.default_rng(0)
    flw = jnp.asarray((rng.random((Bs, H, W, 2), dtype=np.float32) - 0.5) * 20)
    z = jnp.asarray(rng.random((Bs, H, W, 1), dtype=np.float32)) * -2

    def p(k, v):
        print(f"{k:46s} {v:8.2f} ms", flush=True)

    for C in (64,):
        feat = jnp.asarray(rng.random((Bs, H, W, C), dtype=np.float32))
        for m in ("base", "scan"):
            sp = jax.jit(lambda f, fl, zz, m=m: splat_fused(
                f, fl, zz, z_nonpositive=jnp.asarray(True), method=m))
            p(f"splat_fused C={C} {m} fp32", timeit(sp, feat, flw, z))

    # raw scatter dtype sweep at the base-splat geometry: 1 row/источник
    # pixel, 4*(C+2) payload channels, padded accumulator.
    HW, Wp = H * W, W + 2
    base_idx = jnp.asarray(rng.integers(0, (H + 2) * Wp, (Bs, HW)), jnp.int32)
    bidx = jnp.arange(Bs)[:, None]
    for C in (66,):
        pay32 = jnp.asarray(rng.random((Bs, HW, 4 * C), dtype=np.float32))
        for dt in (jnp.float32, jnp.bfloat16, jnp.float16):
            payd = pay32.astype(dt)

            def scat(idx, v, dt=dt):
                out = jnp.zeros((Bs, (H + 2) * Wp, 4 * C), dt)
                return out.at[bidx, idx].add(v, mode="drop")

            p(f"raw base scatter 4x{C}ch {dt.__name__}", timeit(scat, base_idx, payd))

        idx_sorted = jnp.sort(base_idx, axis=1)

        def scat_sorted(idx, v):
            out = jnp.zeros((Bs, (H + 2) * Wp, 4 * C), jnp.float32)
            return out.at[bidx, idx].add(v, mode="drop",
                                         indices_are_sorted=True)

        p(f"raw base scatter sorted-hint fp32", timeit(scat_sorted, idx_sorted, pay32))

    print("done")


if __name__ == "__main__":
    main()
