"""Split the Pallas splat's fixed overhead: host prep vs pallas_call.

Times (a) the full splat, (b) the prep stage alone (everything before
pallas_call, summed), (c) the pallas_call alone on pre-built operands,
(d) the epilogue slice+transpose alone.
"""
import sys, os.path as osp, time
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import functools
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

import motif_tpu.ops.softsplat_pallas as sp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C = 6, 256, 448, 64
rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((B, H, W, C), dtype=np.float32))
z = jnp.asarray(-np.abs(rng.random((B, H, W, 1), dtype=np.float32)))
yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
u = 25 * np.sin(2 * np.pi * yy / 180.0) * np.cos(2 * np.pi * xx / 300.0)
v = 18 * np.cos(2 * np.pi * yy / 230.0 + 1.0) * np.sin(2 * np.pi * xx / 260.0)
flow = jnp.asarray(np.stack([u, v], -1)[None].repeat(B, 0), jnp.float32)
ez = jnp.exp(z)


def timeit(fn, *args, reps=3, inner=10):
    # host-fetch sync: axon's block_until_ready returns before execution
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


# ---- replicate the prep from _splat_pallas_fast ----
max_dy = 32
D = max_dy
ROWS_PER_STEP = sp.ROWS_PER_STEP
SEG = sp.SEG
LAG = sp._cdiv(D - 1, ROWS_PER_STEP)
RING = 2 * D + 4
CP = sp._cdiv(C + 2, 8) * 8
LANES = sp._cdiv(W + 3, 128) * 128
segs_row = sp._cdiv(W, SEG)
segs = ROWS_PER_STEP * segs_row
nsteps = H // ROWS_PER_STEP


@jax.jit
def prep(img, flow, ez):
    gx = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    srow = jnp.broadcast_to(gy, (B, H, W))
    fx = gx + flow[..., 0]
    fy = gy + flow[..., 1]
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx1 = fx - x0
    wy1 = fy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    bad_x = (x0 < -1.0) | (x0 > W)
    bad_y = (y0 < -1.0) | (y0 > H)
    ones = jnp.ones_like(x0)
    zero = jnp.zeros_like(x0)
    wx0 = jnp.where(bad_x, zero, wx0)
    wx1 = jnp.where(bad_x, zero, wx1)
    vx = jnp.where(bad_x, zero, ones)
    wy0 = jnp.where(bad_y, zero, wy0)
    wy1 = jnp.where(bad_y, zero, wy1)
    uy0 = jnp.where(bad_y, zero, ones)
    uy1 = uy0
    x0c = jnp.where(bad_x, zero - 1.0, x0)
    y0c = jnp.clip(jnp.where(bad_y, srow, y0), srow - D, srow + D)

    def segpad(a, fill=0.0):
        a = jnp.pad(a, ((0, 0), (0, 0), (0, segs_row * SEG - W)),
                    constant_values=fill)
        return a.reshape(B, H * segs_row, SEG)

    y0p = segpad(y0c)
    rowfix = jnp.repeat(
        jnp.arange(H, dtype=jnp.float32).repeat(segs_row)[None], B, 0)
    lanei = jnp.arange(SEG)
    padlane = lanei[None, None, :] >= (W - (segs_row - 1) * SEG)
    lastseg = (jnp.arange(H * segs_row) % segs_row) == segs_row - 1
    padmask = padlane & lastseg[None, :, None]
    y0p = jnp.where(padmask, rowfix[..., None], y0p)
    zpad = jnp.zeros_like(y0p)
    sl = jnp.stack([y0p, segpad(wy0), segpad(wy1), segpad(uy0), segpad(uy1),
                    segpad(x0c, -1.0), segpad(wx0), segpad(wx1), segpad(vx),
                    zpad, zpad, zpad, zpad, zpad, zpad, zpad], axis=2)
    rmin = jnp.min(y0p, axis=2).astype(jnp.int32)
    rmax = jnp.max(y0p, axis=2).astype(jnp.int32)
    any_c = jnp.max(segpad(wx0) + segpad(wx1) + segpad(uy0), axis=2) > 0.0
    nrows_m1 = jnp.where(any_c, rmax - rmin, -1)
    meta = jnp.stack([rmin, nrows_m1], axis=-1).reshape(B, nsteps, segs, 2)
    pay = jnp.concatenate([
        img * ez, ez, jnp.zeros((B, H, W, CP - C - 1), jnp.float32)], axis=-1)
    pay = jnp.pad(pay, ((0, 0), (0, 0), (0, segs_row * SEG - W), (0, 0)))
    vals = (pay.reshape(B, H, segs_row, SEG, CP)
            .transpose(0, 1, 2, 4, 3)
            .reshape(B, nsteps, segs, CP, SEG))
    return meta, vals, sl.reshape(B, nsteps, segs, 16, SEG)


meta, vals, sl = jax.tree.map(lambda a: a + 0, prep(img, flow, ez)); float(jnp.sum(meta))
print("prep alone:", timeit(prep, img, flow, ez), "ms", flush=True)

out_dtype = jnp.float32
grid = (B, nsteps + LAG + 1)
out_rows = (nsteps + 1) * ROWS_PER_STEP


@jax.jit
def kernel_only(meta, vals, sl):
    return pl.pallas_call(
        functools.partial(sp._splat_kernel, H=H, D=D, LAG=LAG, RING=RING,
                          CP=CP, C=C, LANES=LANES, segs=segs, nsteps=nsteps,
                          out_dtype=out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, segs, 2),
                         lambda b, jj: (b, jnp.minimum(jj, nsteps - 1), 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, segs, CP, SEG),
                         lambda b, jj: (b, jnp.minimum(jj, nsteps - 1), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, segs, 16, SEG),
                         lambda b, jj: (b, jnp.minimum(jj, nsteps - 1), 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ROWS_PER_STEP, CP, LANES),
            lambda b, jj: (b, jnp.maximum(jj - LAG, 0), 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, out_rows, CP, LANES), out_dtype),
        scratch_shapes=[pltpu.VMEM((RING, CP, LANES), jnp.float32)],
    )(meta, vals, sl)


out = kernel_only(meta, vals, sl); float(jnp.sum(out))
print("kernel alone (smooth):", timeit(kernel_only, meta, vals, sl), "ms",
      flush=True)

# skipped-segment variant: nrows_m1 = -1 everywhere
meta_skip = meta.at[..., 1].set(-1)
print("kernel alone (all skipped):", timeit(kernel_only, meta_skip, vals, sl),
      "ms", flush=True)


@jax.jit
def epilogue(out):
    inner = out[:, 1:H + 1, :, 1:W + 1]
    return inner.transpose(0, 1, 3, 2)


print("epilogue alone:", timeit(epilogue, out), "ms", flush=True)

# how much is the payload relayout inside prep?
@jax.jit
def payload_only(img, ez):
    pay = jnp.concatenate([
        img * ez, ez, jnp.zeros((B, H, W, CP - C - 1), jnp.float32)], axis=-1)
    pay = jnp.pad(pay, ((0, 0), (0, 0), (0, segs_row * SEG - W), (0, 0)))
    return (pay.reshape(B, H, segs_row, SEG, CP)
            .transpose(0, 1, 2, 4, 3)
            .reshape(B, nsteps, segs, CP, SEG))


print("payload relayout alone:", timeit(payload_only, img, ez), "ms",
      flush=True)
