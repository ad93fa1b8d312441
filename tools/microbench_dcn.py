"""DCN backend shootout on the chip at the PCD L1 shape."""

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
    from motif_tpu.ops.dcn import dcn_v2

    rng = np.random.default_rng(0)
    B, H, W, nf, G = 1, 64, 112, 64, 8
    feat = jnp.asarray(rng.random((B, H, W, nf), dtype=np.float32))
    off = jnp.asarray(rng.normal(size=(B, H, W, G * 2 * 9)).astype(np.float32))
    mask = jnp.asarray(rng.random((B, H, W, G * 9), dtype=np.float32))
    wk = jnp.asarray(rng.normal(size=(3, 3, nf, nf)).astype(np.float32)) * 0.05
    bk = jnp.zeros((nf,), jnp.float32)

    for be in ("pallas", "onehot"):
        fn = jax.jit(lambda f, o, m, w, b, be=be: dcn_v2(
            f, o, m, w, b, deformable_groups=G, backend=be))
        print(f"dcn_{be:8s} {timeit(fn, feat, off, mask, wk, bk):8.2f} ms",
              flush=True)
    print("done")


if __name__ == "__main__":
    main()
