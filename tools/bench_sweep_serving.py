"""Sweep serving-batch B and knob combos on the real chip to pick bench.py's
headline configuration (VERDICT r4 #2: batched serving is the honest
throughput lever — the metric is HR frames/sec/chip, not latency).

Run on the TPU: `python tools/bench_sweep_serving.py`.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def measure(model, B, N=3, reps=3, windows=5):
    import jax
    import jax.numpy as jnp

    N_in, H, W, S = 4, 64, 112, 4
    HH, WW = H * S, W * S
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, N_in, H, W, 3), dtype=np.float32))
    tt = jnp.asarray(np.tile(np.linspace(0, 1, N, dtype=np.float32), (B, 1)))

    x0 = jnp.zeros((1, N_in, 16, 16, 3), jnp.float32)
    tt0 = jnp.zeros((1, N), jnp.float32)
    params = jax.jit(lambda k: model.init(k, x0, tt0, (64, 64), iters=1))(
        jax.random.PRNGKey(0))["params"]

    fwd = jax.jit(lambda p, x, tt: jnp.sum(model.apply(
        {"params": p}, x, tt, (HH, WW), use_gt=False, iters=4)[0],
        dtype=jnp.float32))
    compiled = fwd.lower(params, x, tt).compile()
    float(compiled(params, x, tt))  # warm up

    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = compiled(params, x, tt)
        float(out)
        times.append((time.perf_counter() - t0) / reps)
    sec = float(np.median(times))
    return (N * B) / sec, sec


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from motif_tpu.models.motif import MoTIF

    combos = []
    for raft in (1.0, 0.5):
        for B in (1, 2, 4, 8):
            combos.append((raft, B))

    for raft, B in combos:
        model = MoTIF(setting=5, compute_dtype="bfloat16", fused_decode=True,
                      splat_method="base", splat_dtype="float16",
                      raft_resolution=raft)
        try:
            fps, sec = measure(model, B)
            print(f"raft={raft} B={B}: {fps:8.2f} f/s  ({sec*1e3:7.1f} ms/fwd)",
                  flush=True)
        except Exception as e:  # OOM etc — record and continue
            print(f"raft={raft} B={B}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
