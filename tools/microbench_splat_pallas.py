"""Serving-size splat benchmark: Pallas ring-sweep kernel vs XLA backends.

Sizes mirror the bench.py serving forward (Vimeo 4x): the splat runs at
nBN = 6 images of 256x448 with a 64-channel fused payload + ez.
Flows: smooth synthetic motion fields (what real video gives the splat)
plus a jittered variant; the XLA 'base' backend is flow-independent, the
Pallas kernel's row-slot loop count varies with local vertical spread.
"""
import sys, os.path as osp, time
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from motif_tpu.ops.softsplat import splat_fused
from motif_tpu.ops.softsplat_pallas import splat_violation

B, H, W, C = 6, 256, 448, 64
rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))
z = jnp.asarray(-np.abs(rng.random((B, H, W, 1), dtype=np.float32)))

# smooth flow: low-frequency sinusoid field, |v| <= 18, |u| <= 25
yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
u = 25 * np.sin(2 * np.pi * yy / 180.0) * np.cos(2 * np.pi * xx / 300.0)
v = 18 * np.cos(2 * np.pi * yy / 230.0 + 1.0) * np.sin(2 * np.pi * xx / 260.0)
flow_s = jnp.asarray(np.stack([u, v], -1)[None].repeat(B, 0), jnp.float32)
# jittered: adds +-1.5px white noise (breaks within-segment runs)
flow_j = flow_s + jnp.asarray(
    rng.standard_normal((B, H, W, 2)) * 1.5, jnp.float32)

print("violation(smooth, D=32):", bool(splat_violation(flow_s, 32)),
      " violation(jitter):", bool(splat_violation(flow_j, 32)), flush=True)


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


tnp = jnp.asarray(True)
for name, fl in (("smooth", flow_s), ("jitter", flow_j)):
    for meth, kw in (("base", {}), ("base_f16", {"scatter_dtype": jnp.float16}),
                     ("pallas", {}), ("pallas_bf16",
                                      {"scatter_dtype": jnp.bfloat16})):
        m = meth.split("_")[0] if meth.startswith("base") else "pallas"
        m = "base" if meth.startswith("base") else "pallas"
        ms = timeit(lambda i, f, zz, kw=kw, m=m: splat_fused(
            i, f, zz, z_nonpositive=tnp, method=m, **kw), img, fl, z)
        print(f"{name:7s} {meth:12s} {ms:8.2f} ms", flush=True)

# accuracy on chip: pallas vs base, smooth flow
o_b = splat_fused(img, flow_s, z, z_nonpositive=tnp, method="base")
o_p = splat_fused(img, flow_s, z, z_nonpositive=tnp, method="pallas")
o_pb = splat_fused(img, flow_s, z, z_nonpositive=tnp, method="pallas",
                   scatter_dtype=jnp.bfloat16)
for k, (a, b) in enumerate(zip(o_b, o_p)):
    d = float(jnp.max(jnp.abs(a - b)))
    print(f"pallas-vs-base out[{k}] max|d| {d:.2e}", flush=True)
print("pallas_bf16-vs-base out[0] max|d|",
      f"{float(jnp.max(jnp.abs(o_b[0] - o_pb[0]))):.2e}", flush=True)

# fixed-overhead probe: all pixels off-grid in x AND y -> every segment is
# skipped (nrows_m1 == -1); remaining time = host prep + pipeline + flush.
flow_off = jnp.full_like(flow_s, 1000.0)
ms = timeit(lambda i, f, zz: splat_fused(i, f, zz, z_nonpositive=tnp,
                                         method="pallas"), img, flow_off, z)
print(f"fixed overhead (all segments skipped): {ms:8.2f} ms", flush=True)
