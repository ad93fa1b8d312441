"""Decompose the Pallas ring-sweep splat's serving-size cost: kernel alone
(fast path, no lax.cond / no violation check), host prep alone, and the XLA
base backend, at the dtype/max_dy corners. Answers: where do the ~34 ms go,
and does a smaller max_dy (=> fp32 ring fits VMEM) win?
"""
import sys, os.path as osp, time
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from motif_tpu.ops.softsplat import _splat_fused_base
from motif_tpu.ops import softsplat_pallas as sp

B, H, W, C = 6, 256, 448, 64
rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))
z = jnp.asarray(-np.abs(rng.random((B, H, W, 1), dtype=np.float32)))
yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
u = 25 * np.sin(2 * np.pi * yy / 180.0) * np.cos(2 * np.pi * xx / 300.0)
v = 12 * np.cos(2 * np.pi * yy / 230.0 + 1.0) * np.sin(2 * np.pi * xx / 260.0)
flow = jnp.asarray(np.stack([u, v], -1)[None].repeat(B, 0), jnp.float32)
ez = jnp.exp(z)


def timeit(fn, *args, reps=3, inner=10):
    red = jax.jit(lambda *a: jax.tree.reduce(
        jnp.add, jax.tree.map(lambda x: jnp.sum(x, dtype=jnp.float32),
                              fn(*a))))
    float(red(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = red(*args)
        float(out)
        ts.append((time.perf_counter() - t0) / inner)
    return float(np.median(ts)) * 1e3


print("ring vmem MB: fp32/D32", sp._ring_vmem_bytes(W, C, 32, None, jnp.float32)/2**20,
      " fp32/D16", sp._ring_vmem_bytes(W, C, 16, None, jnp.float32)/2**20,
      " bf16/D32", sp._ring_vmem_bytes(W, C, 32, jnp.bfloat16, jnp.float32)/2**20,
      flush=True)

print(f"base fp32      {timeit(lambda i,f,e: _splat_fused_base(i,f,None,e), img, flow, ez):8.2f} ms", flush=True)
print(f"base f16       {timeit(lambda i,f,e: _splat_fused_base(i,f,None,e,scatter_dtype=jnp.float16), img, flow, ez):8.2f} ms", flush=True)

for name, dy, cdt in (("fast fp32 D16", 16, None),
                      ("fast fp32 D8 ", 8, None),
                      ("fast bf16 D32", 32, jnp.bfloat16),
                      ("fast bf16 D16", 16, jnp.bfloat16),
                      ("fast bf16 D8 ", 8, jnp.bfloat16)):
    ms = timeit(lambda i, f, e, dy=dy, cdt=cdt: sp._splat_pallas_fast(
        i, f, e, dy, cdt), img, flow, ez)
    print(f"{name}  {ms:8.2f} ms", flush=True)

# host-prep only: everything _splat_pallas_fast does before pallas_call
def prep_only(img, flow, ez, max_dy=16, compute_dtype=None):
    B, H, W, C = img.shape
    D = max_dy
    K = sp._round8(W)
    nsteps = H // sp.ROWS_PER_STEP
    cdt = jnp.dtype(compute_dtype) if compute_dtype is not None else img.dtype
    gx = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    fu = flow[..., 0].astype(jnp.float32)
    fv = flow[..., 1].astype(jnp.float32)
    x0 = jnp.floor(gx + fu)
    y0 = jnp.floor(gy + fv)
    bad_x = (x0 < -1.0) | (x0 > W)
    bad_y = (y0 < -1.0) | (y0 > H)
    srow = jnp.broadcast_to(gy, (B, H, W))
    y0c = jnp.clip(jnp.where(bad_y, srow, y0), srow - D, srow + D)
    good = ~bad_x & ~bad_y
    y0m = jnp.where(good, y0c, srow)
    rmin = jnp.min(y0m, axis=2).astype(jnp.int32)
    rmax = jnp.max(y0m, axis=2).astype(jnp.int32)
    nrows_m1 = jnp.where(jnp.any(good, axis=2), rmax - rmin, -1)
    meta = jnp.stack([rmin, nrows_m1], -1).reshape(B, nsteps, sp.ROWS_PER_STEP, 2)
    ezf = ez.astype(jnp.float32)
    pay = jnp.concatenate([img.astype(jnp.float32) * ezf, ezf,
                           jnp.zeros((B, H, W, 1), jnp.float32)], -1).astype(cdt)
    pay = jnp.pad(pay, ((0, 0), (0, 0), (0, K - W), (0, 0)))
    vals = pay.reshape(B, nsteps, sp.ROWS_PER_STEP, K, C + 2)
    ut = jnp.pad(fu, ((0, 0), (0, 0), (0, K - W)), constant_values=1e9)
    vt = jnp.pad(fv, ((0, 0), (0, 0), (0, K - W)))
    return meta, vals, ut, vt

print(f"prep only fp32 {timeit(prep_only, img, flow, ez):8.2f} ms", flush=True)
print(f"prep only bf16 {timeit(lambda i,f,e: prep_only(i,f,e,32,jnp.bfloat16), img, flow, ez):8.2f} ms", flush=True)

# violation check alone
print(f"violation chk  {timeit(lambda f: sp.splat_violation(f, 16), flow):8.2f} ms", flush=True)

# exactness of the D16 fp32 fast path vs base
o_b = _splat_fused_base(img, flow, None, ez)
o_p = sp._splat_pallas_fast(img, flow, ez, 16, None)
for k in range(3):
    print(f"fp32 D16 out[{k}] max|d| {float(jnp.max(jnp.abs(o_b[k] - o_p[k]))):.2e}", flush=True)
