"""Microbenchmarks of splat-scatter strategies at the bench splat shape
(6 images, 256x448, 132 channels, 4 corners = 2.75M scattered rows).
Feeds the Pallas/XLA splat redesign (VERDICT r3 #1d)."""

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
    # Reduce outputs to one scalar ON DEVICE: the axon tunnel costs ~32 ms
    # roundtrip + ~30 MB/s, so fetching full outputs swamps kernel time.
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
    Bs, H, W, C = 6, 256, 448, 132
    HW = H * W
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, HW, (Bs, 4 * HW)), jnp.int32)
    vals = jnp.asarray(rng.random((Bs, 4 * HW, C), dtype=np.float32))
    bidx = jnp.arange(Bs)[:, None]

    def p(k, v):
        print(f"{k:42s} {v:8.2f} ms", flush=True)

    # 1. one batched scatter of all 4HW rows
    def scat_one(idx, vals):
        out = jnp.zeros((Bs, HW, C), jnp.float32)
        return out.at[bidx, idx].add(vals)

    p("scatter_4HW_rows_fp32", timeit(jax.jit(scat_one), idx, vals))

    # 2. same in bf16 values (accum fp32? -> accum bf16 here)
    def scat_bf16(idx, vals):
        out = jnp.zeros((Bs, HW, C), jnp.bfloat16)
        return out.at[bidx, idx].add(vals.astype(jnp.bfloat16))

    p("scatter_4HW_rows_bf16", timeit(jax.jit(scat_bf16), idx, vals))

    # 3. flattened-global single scatter (no batch dim)
    gidx = (idx + (jnp.arange(Bs) * HW)[:, None]).reshape(-1)
    gvals = vals.reshape(-1, C)

    def scat_flat(gidx, gvals):
        out = jnp.zeros((Bs * HW, C), jnp.float32)
        return out.at[gidx].add(gvals)

    p("scatter_flat_global", timeit(jax.jit(scat_flat), gidx, gvals))

    # 4. narrow rows: does row width matter? (C=8)
    vals8 = vals[..., :8]

    def scat_narrow(idx, vals8):
        out = jnp.zeros((Bs, HW, 8), jnp.float32)
        return out.at[bidx, idx].add(vals8)

    p("scatter_4HW_rows_C8", timeit(jax.jit(scat_narrow), idx, vals8))

    # 5. sort components
    p("argsort_keys(6x458k)", timeit(jax.jit(lambda i: jnp.argsort(i, axis=1)), idx))
    order = jnp.argsort(idx, axis=1)
    p("gather_rows_sorted(2.75M rows C132)", timeit(
        jax.jit(lambda v, o: jnp.take_along_axis(v, o[..., None], axis=1)), vals, order))
    p("cumsum_rows", timeit(jax.jit(lambda v: jnp.cumsum(v, axis=1)), vals))

    # 6. sort_key_val (u32 keys, u32 payload) — what the sort path really needs
    pos = jnp.broadcast_to(jnp.arange(4 * HW, dtype=jnp.int32)[None], idx.shape)

    def skv(idx, pos):
        return jax.vmap(jax.lax.sort_key_val)(idx, pos)

    p("sort_key_val(6x458k u32/u32)", timeit(jax.jit(skv), idx, pos))

    # 7. full sort-based segment-sum splat
    def sort_based(idx, vals):
        skeys, order = jax.vmap(jax.lax.sort_key_val)(idx, pos)
        svals = jnp.take_along_axis(vals, order[..., None], axis=1)
        cs = jnp.cumsum(svals, axis=1)
        cs = jnp.concatenate([jnp.zeros((Bs, 1, C), cs.dtype), cs], axis=1)
        targets = jnp.arange(HW, dtype=jnp.int32)
        lo = jax.vmap(lambda k: jnp.searchsorted(k, targets, side="left"))(skeys)
        hi = jax.vmap(lambda k: jnp.searchsorted(k, targets, side="right"))(skeys)
        take = jax.vmap(lambda c, i: c[i])
        return take(cs, hi) - take(cs, lo)

    p("sortsegsum_full", timeit(jax.jit(sort_based), idx, vals))

    # 8. scatter into K=4 partial buffers then tree-sum (parallelism probe)
    def scat_split(idx, vals):
        outs = []
        for k in range(4):
            o = jnp.zeros((Bs, HW, C), jnp.float32)
            outs.append(o.at[bidx, idx[:, k::4]].add(vals[:, k::4]))
        return outs[0] + outs[1] + outs[2] + outs[3]

    p("scatter_4way_split_sum", timeit(jax.jit(scat_split), idx, vals))

    print("done", flush=True)


if __name__ == "__main__":
    main()
