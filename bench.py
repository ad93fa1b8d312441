"""Benchmark: HR output frames/sec/chip at the Vimeo 4x + 2-intermediate-time
configuration (BASELINE.json metric). Prints ONE JSON line.

Protocol: MoTIF setting=5 forward at LQ 64x112 → HR 256x448, N=3 target
times per forward pass (the reference eval's temporal chunk,
VideoSR_base_model.py:188-193), RAFT iters=4 (test-time setting), batch 1,
fp32. Reported value is HR frames produced per second on one chip,
steady-state (post-compile), median of repeated timed windows.

vs_baseline: BASELINE.md records no reference numbers (the repo publishes
none); the north-star is >=5x an A100 running the PyTorch reference. An
A100 estimate for the reference at this config is ~1-2 frames/s (RAFT at HR
x4 pairs + 40-block trunk + 3 HR SIREN evals + CuPy splats); we report
vs_baseline against 1.5 frames/s until a measured reference number exists.
"""

import json
import time

import numpy as np

A100_REFERENCE_FPS_ESTIMATE = 1.5


def main():
    import jax

    # persistent compile cache: the full-model XLA compile takes minutes on
    # the remote backend; cached recompiles are seconds.
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from motif_tpu.models.motif import MoTIF

    model = MoTIF(setting=5)
    B, N_in, H, W, S, N = 1, 4, 64, 112, 4, 3
    HH, WW = H * S, W * S
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, N_in, H, W, 3), dtype=np.float32))
    tt = jnp.asarray(np.tile(np.linspace(0, 1, N, dtype=np.float32), (B, 1)))

    x0 = jnp.zeros((1, N_in, 16, 16, 3), jnp.float32)
    tt0 = jnp.zeros((1, N), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, tt0, (64, 64), iters=1)["params"]

    fwd = jax.jit(lambda p, x, tt: model.apply(
        {"params": p}, x, tt, (HH, WW), use_gt=False, iters=4)[0])

    np.asarray(fwd(params, x, tt))  # compile; NB block_until_ready is a
    # no-op through the remote-TPU relay — a host fetch is the only honest
    # synchronization point, so every timed window ends with one.

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            frames = fwd(params, x, tt)
        np.asarray(frames)
        times.append((time.perf_counter() - t0) / reps)
    sec = float(np.median(times))
    fps = (N * B) / sec

    print(json.dumps({
        "metric": "HR output frames/sec/chip (Vimeo 4x, LQ 64x112 -> HR 256x448, 3 times/fwd)",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / A100_REFERENCE_FPS_ESTIMATE, 3),
    }))


if __name__ == "__main__":
    main()
