"""Count the reference-equivalent workload FLOPs of one bench-protocol
MoTIF forward (LQ 64x112 -> HR 256x448, N=3 times, RAFT iters=4, fp32).

Why this exists: bench.py's A100 estimate divides the reference's assumed
sustained FLOP rate by the workload's FLOPs. From round 3 the DCN sampling
runs inside a Pallas custom call that XLA's cost model cannot see (the
live graph's count drops ~4.4x), and the one-hot formulations (r1/r2
counts) over-count vs the reference math. This tool compiles the fp32
graph on CPU with the DCN backend forced to 'gather' — whose FLOPs match
the CUDA im2col+GEMM pipeline 1:1 (gathers are 0-FLOP in XLA's cost
model; the im2col einsum IS the reference's batched GEMM,
dcn_v2_cuda.cu:19-40) — and prints the XLA-counted total. Remaining known
deviation: the RAFT correlation *lookup* stays one-hot (mildly inflated
vs the reference's bilinear_sampler gather); the all-pairs correlation
einsum matches the reference CorrBlock matmul exactly.

The printed value is pinned as REF_WORKLOAD_FLOPS in bench.py (re-run this
tool if the bench protocol changes).
"""

import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


def main():
    from motif_tpu.models.motif import MoTIF
    from motif_tpu.ops import dcn

    dcn.set_backend("gather")

    B, N_in, H, W, S, N = 1, 4, 64, 112, 4, 3
    HH, WW = H * S, W * S
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((B, N_in, H, W, 3), dtype=np.float32))
    tt = jnp.asarray(np.tile(np.linspace(0, 1, N, dtype=np.float32), (B, 1)))

    model = MoTIF(setting=5)
    x0 = jnp.zeros((1, N_in, 16, 16, 3), jnp.float32)
    tt0 = jnp.zeros((1, N), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, tt0, (64, 64), iters=1)["params"]

    fwd = jax.jit(lambda p, x, tt: model.apply(
        {"params": p}, x, tt, (HH, WW), use_gt=False, iters=4)[0])
    cost = fwd.lower(params, x, tt).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    print({"ref_workload_flops": float(cost["flops"])})


if __name__ == "__main__":
    main()
