"""Quick TPU timing for the encoder + serving forward (r4 scan-unroll check)."""
import sys, os.path as osp, time
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

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

from motif_tpu.models.motif import MoTIF
from motif_tpu.models.encoder import ZSMEncoder

B, N_in, H, W, S, N = 1, 4, 64, 112, 4, 3
HH, WW = H * S, W * S
rng = np.random.default_rng(0)
model = MoTIF(setting=5)
x0 = jnp.zeros((1, N_in, 16, 16, 3), jnp.float32)
tt0 = jnp.zeros((1, N), jnp.float32)
params = jax.jit(lambda k: model.init(k, x0, tt0, (64, 64), iters=1))(
    jax.random.PRNGKey(0))["params"]

fr = jnp.asarray(rng.random((B, 2, H, W, 3), dtype=np.float32))
enc_bf = jax.jit(lambda p, f: ZSMEncoder(64).apply({"params": p}, f.astype(jnp.bfloat16)))
print(f"zsm_encoder_lr_bf16 {timeit(enc_bf, params['encoder'], fr):8.2f} ms", flush=True)

x = jnp.asarray(rng.random((B, N_in, H, W, 3), dtype=np.float32))
tt = jnp.asarray(np.tile(np.linspace(0, 1, N, dtype=np.float32), (B, 1)))
model_srv = MoTIF(setting=5, compute_dtype="bfloat16", fused_decode=True,
                  splat_method="base")
fwd_srv = jax.jit(lambda p, x, tt: model_srv.apply(
    {"params": p}, x, tt, (HH, WW), use_gt=False, iters=4)[0])
print(f"serving_fwd(base splat) {timeit(fwd_srv, params, x, tt):8.2f} ms", flush=True)
