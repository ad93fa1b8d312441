"""Round-3 microbenches on the real chip: splat backends, conv shapes.

Questions:
 * splat 'base' (1 row/source, 4-slot payload + shift-combine) vs 'scan'
   (4 corner scatters) at the bench splat shape, C=130 and C=66.
 * why a 3x3/64ch conv at (2,64,112) costs ~0.17 ms: overhead vs compute —
   conv alone, x2 batch, C=128, manual 9-shift dot_general formulation.
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


class Report(dict):
    def __setitem__(self, k, v):
        super().__setitem__(k, v)
        print(f"{k:44s} {v:8.2f} ms", flush=True)


def main():
    from motif_tpu.ops.softsplat import splat_fused

    report = Report()
    rng = np.random.default_rng(0)
    HH, WW = 256, 448

    for C in (130, 66):
        feat = jnp.asarray(rng.random((6, HH, WW, C), dtype=np.float32))
        flw = jnp.asarray((rng.random((6, HH, WW, 2), dtype=np.float32) - 0.5) * 20)
        z = jnp.asarray(rng.random((6, HH, WW, 1), dtype=np.float32)) * -2
        for m in ("scan", "base"):
            sp = jax.jit(lambda f, fl, zz, m=m: splat_fused(
                f, fl, zz, z_nonpositive=jnp.asarray(True), method=m))
            report[f"splat_{m}(6,{HH},{WW},{C})"] = timeit(sp, feat, flw, z)

    # conv shapes at the encoder's size
    B, H, W = 2, 64, 112
    for C, tag in ((64, "c64"), (128, "c128")):
        x = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))
        k = jnp.asarray(rng.normal(size=(3, 3, C, C)), np.float32) * 0.05

        def conv(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        report[f"conv3x3_{tag}_single"] = timeit(jax.jit(conv), x, k)

        def conv10(x, k):
            for _ in range(10):
                x = conv(x, k)
            return x

        report[f"conv3x3_{tag}_x10"] = timeit(jax.jit(conv10), x, k)

    # manual shift formulation: 3x3 conv = sum of 9 shifted 1x1 matmuls
    C = 64
    x = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, C, C)), np.float32) * 0.05

    def conv_shift(x, k):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = 0.0
        for dy in range(3):
            for dx in range(3):
                out = out + jnp.einsum(
                    "bhwc,cd->bhwd", xp[:, dy:dy + H, dx:dx + W], k[dy, dx])
        return out

    def conv_shift10(x, k):
        for _ in range(10):
            x = conv_shift(x, k)
        return x

    report["convshift_c64_x10"] = timeit(jax.jit(conv_shift10), x, k)

    # bigger batch amortization
    x8 = jnp.asarray(rng.random((8, H, W, C), dtype=np.float32))

    def conv10b(x, k):
        for _ in range(10):
            x = jax.lax.conv_general_dilated(
                x, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return x

    report["conv3x3_c64_x10_batch8"] = timeit(jax.jit(conv10b), x8, k)

    print("done")


if __name__ == "__main__":
    main()
