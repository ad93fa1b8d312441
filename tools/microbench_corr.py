"""PWC cost-volume microbench (VERDICT r4 #7 / BASELINE.json north-star
item): measure ops/corr.py::local_corr at the PWC-Net pyramid shapes and
compare against its HBM/VPU rooflines to decide whether a Pallas kernel can
beat the XLA shift-multiply form.

Reference op: /root/reference/OpticalFlow/correlation.py:44-112 (CUDA
81-offset correlation). Run on the chip: python tools/microbench_corr.py
"""

import sys
import os.path as osp
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from motif_tpu.ops.corr import local_corr

HBM_GBS = 800e9          # v5e ~810 GB/s
VPU_F32 = 4.9e12         # ~peak f32 elementwise FLOP/s (8x128 x 8 cores ~940MHz x2)


def timeit(fn, *args, reps=3, inner=20):
    red = jax.jit(lambda *a: jnp.sum(fn(*a), dtype=jnp.float32))
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
    rng = np.random.default_rng(0)
    # PWC-Net pyramid shapes for a 256x448 input (models/pwcnet.py levels
    # 6..2, the reference's corr at each level), B=2 image pairs
    shapes = [
        (2, 4, 7, 196), (2, 8, 14, 128), (2, 16, 28, 96),
        (2, 32, 56, 64), (2, 64, 112, 32),
    ]
    for (B, H, W, C) in shapes:
        f1 = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))
        f2 = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))
        ms = timeit(local_corr, f1, f2)
        flops = 81 * B * H * W * C * 2
        # fused ideal: read f1+f2 once, write (B,H,W,81)
        bytes_min = (2 * B * H * W * C + B * H * W * 81) * 4
        t_flop = flops / VPU_F32 * 1e3
        t_mem = bytes_min / HBM_GBS * 1e3
        sol = max(t_flop, t_mem)
        print(f"B{B} {H}x{W}x{C}: {ms:7.3f} ms | roofline {sol:6.3f} ms "
              f"(vpu {t_flop:6.3f} / hbm {t_mem:6.3f}) | "
              f"eff {sol / ms * 100:5.1f}%", flush=True)

    # the full PWCNet corr budget at serving-ish sizes: sum of levels
    print("done")


if __name__ == "__main__":
    main()
