"""Benchmark: HR output frames/sec/chip at the Vimeo 4x + 2-intermediate-time
configuration (BASELINE.json metric). Prints ONE JSON line.

Protocol: MoTIF setting=5 forward at LQ 64x112 → HR 256x448, N=3 target
times per forward pass (the reference eval's temporal chunk,
VideoSR_base_model.py:188-193), RAFT iters=4 (test-time setting), batch 1,
fp32. Reported value is HR frames produced per second on one chip,
steady-state (post-compile), median of repeated timed windows.

Workload FLOPs: pinned to the XLA cost model's count of the fp32 graph
compiled with the DCN 'gather' backend (tools/count_ref_flops.py), whose
FLOPs match the reference CUDA im2col+GEMM math 1:1. The live graph's own
cost_analysis() is no longer usable for this: from round 3 the DCN
sampling runs inside a Pallas custom call the cost model cannot see (its
count drops ~4.4x), while the r1/r2 one-hot-einsum counts over-counted vs
the reference math. The live count is still reported as xla_visible_flops.

vs_baseline derivation (BASELINE.md records no reference numbers; the
reference repo publishes none): the PyTorch reference executes the same
mathematical graph, so we estimate its A100 frames/s as
    est = N / (ref_flops / (A100_FP32_PEAK * A100_ASSUMED_UTIL))
with A100_FP32_PEAK = 19.5 TFLOP/s and an optimistic 25% sustained
utilization for the eager CuPy/torch pipeline (in practice the reference's
Python-loop LIIF/splat sections push utilization below this, so the
resulting vs_baseline is a conservative ESTIMATE, labeled as such).
"""

import json
import time

import numpy as np

A100_FP32_PEAK = 19.5e12
A100_ASSUMED_UTIL = 0.25
V5E_BF16_PEAK = 197e12
# Reference-equivalent workload FLOPs for one bench forward, counted by
# tools/count_ref_flops.py (fp32 graph, DCN 'gather' backend == the CUDA
# im2col+GEMM math). NB the r1/r2 bench used the one-hot-einsum graph's
# count (2.23e12) which over-counted the reference workload ~4.4x and so
# overstated vs_baseline; this is the honest number.
REF_WORKLOAD_FLOPS = 501386149888.0


def _measure(model, N=3):
    """Compile + steady-state-time one MoTIF forward; returns (fps, flops)."""
    import jax
    import jax.numpy as jnp

    B, N_in, H, W, S = 1, 4, 64, 112, 4
    HH, WW = H * S, W * S
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, N_in, H, W, 3), dtype=np.float32))
    tt = jnp.asarray(np.tile(np.linspace(0, 1, N, dtype=np.float32), (B, 1)))

    x0 = jnp.zeros((1, N_in, 16, 16, 3), jnp.float32)
    tt0 = jnp.zeros((1, N), jnp.float32)
    # jit the init: eager init would execute op-by-op through the axon
    # relay (~32 ms/op roundtrip) and dominate bench wall-clock.
    params = jax.jit(lambda k: model.init(k, x0, tt0, (64, 64), iters=1))(
        jax.random.PRNGKey(0))["params"]

    # Synchronization: block_until_ready is a no-op through the remote-TPU
    # relay, so each timed window ends by fetching ONE on-device f32 scalar
    # (sum of the frames). Fetching the full frames instead would add the
    # relay's ~30 MB/s transfer of 4 MB (~130 ms) to every window — tunnel
    # bandwidth, not chip time; a local host fetches over PCIe at GB/s.
    fwd = jax.jit(lambda p, x, tt: jnp.sum(model.apply(
        {"params": p}, x, tt, (HH, WW), use_gt=False, iters=4)[0],
        dtype=jnp.float32))

    compiled = fwd.lower(params, x, tt).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0]
    flops = float((cost or {}).get("flops", 0.0))

    float(compiled(params, x, tt))  # warm up

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = compiled(params, x, tt)
        float(out)
        times.append((time.perf_counter() - t0) / reps)
    sec = float(np.median(times))
    return (N * B) / sec, flops, sec


def main():
    import jax

    # persistent compile cache: the full-model XLA compile takes minutes on
    # the remote backend; cached recompiles are seconds.
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from motif_tpu.models.motif import MoTIF

    # Headline: bf16 trunk + fp32 flow/splat + f16 scatter + RAFT@HR/2 —
    # every knob PSNR-gated on the overfit-trained model (BASELINE.md r3
    # gates: full serving stack −0.0004 dB; raft_resolution 0.5 +0.046 dB
    # on the train-clip eval; tests/test_bf16.py bounds the bf16 drift).
    # The r3/r4-comparable reference-protocol row (RAFT at full HR) and
    # the fp32 reference-order row are reported alongside.
    fps16, flops16, sec16 = _measure(
        MoTIF(setting=5, compute_dtype="bfloat16", fused_decode=True,
              splat_method="base", splat_dtype="float16",
              raft_resolution=0.5))
    fps_ref_proto, _, _ = _measure(
        MoTIF(setting=5, compute_dtype="bfloat16", fused_decode=True,
              splat_method="base"))
    fps32, flops32, sec32 = _measure(MoTIF(setting=5))

    flops = REF_WORKLOAD_FLOPS
    mfu = (flops / sec16) / V5E_BF16_PEAK
    ref_est_fps = 3.0 / (flops / (A100_FP32_PEAK * A100_ASSUMED_UTIL))

    out = {
        "metric": "HR output frames/sec/chip (Vimeo 4x, LQ 64x112 -> HR 256x448, 3 times/fwd, bf16 trunk + fp32 flow/splat, fused LIIF+synth decode, base splat f16 scatter, RAFT@HR/2; all knobs PSNR-gated, BASELINE.md r3/r5)",
        "value": round(fps16, 3),
        "unit": "frames/s",
        "ref_protocol_fps": round(fps_ref_proto, 3),
        "fp32_fps": round(fps32, 3),
        "ref_workload_flops_per_fwd": flops,
        "xla_visible_flops_per_fwd": flops32 or flops16,
        "mfu_vs_bf16_peak": round(mfu, 4),
        "a100_ref_est_fps": round(ref_est_fps, 3),
    }
    out["vs_baseline"] = round(fps16 / ref_est_fps, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
