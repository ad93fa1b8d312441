"""Pallas TPU kernel for the fused softmax/count splat — the forward-warp
scatter that replaces the reference CUDA kernel trio (softsplat_cp.py:12-51,
softsplat_count_cp.py:14-51) on the serving path.

Why a kernel: XLA lowers the splat to a scatter-add whose throughput is
row-rate-bound (~4e7 rows/s on v5e regardless of row width <=256B —
BASELINE.md), ~25 ms of the 123 ms serving forward at Vimeo 4x sizes. The
scatter's HBM speed-of-light is ~1 ms; the gap is per-row serialization.

Design — "row-merged ring sweep" (v2):

* Sweep source rows top to bottom, 8 per grid step. A VMEM ring accumulator
  holds the only padded target rows still reachable (vertical displacement
  bounded by +-D on the fast path): ring[t mod RING] = one (LANES sublanes,
  CP lanes) padded output row in NHWC-minor orientation. The grid step's
  8-row output block lags the source sweep by LAG = ceil((D-1)/8) steps;
  RING % 8 == 0 so each flush is ONE contiguous dynamic-slice copy + zero
  (no per-row loop). No HBM read-modify-write ever happens.
* Each SOURCE ROW (all W pixels, K = W rounded to 8) scatters via ONE MXU
  matmul per distinct target row it touches: the horizontal placement of K
  pixels into a padded output row is a weighted one-hot matrix
  St[c, i] = wx0_i*[c == x0_i+1] + wx1_i*[c == x0_i+2] built in-register
  from iota compares, and the row's contribution to target row rmin+q is
      M = (Sb ∘ cvu_q) @ Ab,   (LANES, 2K) x (2K, CP)
  where Sb = [St | St2] stacks the value placement and the count-validity
  placement, Ab = [payload ; onehot_{C+1}] stacks the (K, CP) pixel payload
  over a constant selector that routes the count into channel C+1, and
  cvu_q = [wy-weights_q | y-validity_q] is a per-candidate lane vector.
  One matmul therefore produces all C value channels, the e^z norm channel
  AND the unweighted count channel of softsplat_count (softsplat_count_cp
  .py:39-50) for one (source row, target row) pair. Smooth flows touch 2-4
  target rows per source row.
* All bilinear weights are computed IN-KERNEL from the raw flow row (u
  lane-oriented, v lane-oriented), so the host prep is just the payload
  concat and a per-row [rmin, nrows-1] meta table (SMEM).
* Input payload and output stay pixel-major NHWC: no host-side transposes
  into or out of the kernel (v1 paid ~8 ms in relayouts at serving sizes).

Out-of-bounds semantics are exact and need no masking for the value/norm
channels: corners land in padded border cells (+1 shift) that the final
interior slice drops — the CUDA bounds check by construction. Pixels thrown
entirely off the padded grid are clamped with zeroed weights AND zeroed
count validities. The ONE fast-path restriction is |floor(y + v) - y| <= D
(vertical reach within the ring). The public entry checks it on-device and
lax.cond's to the XLA scatter backend when violated, so semantics stay
exact for arbitrary flows; D is a deployment knob.

Ring accumulation dtype: float32 when max_dy <= 16 (the ring fits VMEM),
else the compute dtype — at serving (bf16 payload) this matches the XLA
base backend's bf16 scatter accumulation.

Inference backend: training keeps the autodiff scatter ('scan'/'base'
backends in ops/softsplat.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_PER_STEP = 8  # source rows per grid step == output block rows
# Mosaic's scoped-vmem limit is 16 MiB; the kernel's footprint is the ring
# scratch PLUS the double-buffered pipeline blocks (vals/ut/vt in, out
# block out). Measured on v5e: fp32 ring 10.7 MB + blocks = 17.75 MB ->
# hard compile error (r5), so the budget models the whole footprint with
# ~1 MB headroom rather than the ring alone.
_VMEM_SCOPED_LIMIT = 15 * 1024 * 1024  # fall back to XLA beyond this


def _cdiv(a, b):
    return -(-a // b)


def _round8(a):
    return _cdiv(a, 8) * 8


def _splat_kernel(meta_ref, vals_ref, ut_ref, vt_ref, out_ref, ring, *,
                  H, W, D, LAG, RING, CP, C, LANES, K, nsteps, out_dtype,
                  acc_dtype):
    """Grid (B, nsteps + LAG + 1); the last LAG+1 steps only flush.

    meta_ref: (1, 1, 8, 2) i32 SMEM — per source row [rmin, nrows-1]
              (nrows-1 == -1 skips the row entirely).
    vals_ref: (1, 1, 8, K, CP) payload, pixel-major: channels
              [img*ez (C) | ez | 0] on lanes.
    ut_ref/vt_ref: (1, 1, 8, 1, K) f32 lane-oriented flow u / v rows
              (padding lanes carry u = 1e9 -> off-grid -> zero weights).
    out_ref:  (1, 8, LANES, CP) out_dtype — padded target rows
              [8*(j-LAG), 8*(j-LAG)+8) of this image, pixel-major.
    ring:     (RING, LANES, CP) acc_dtype VMEM scratch, RING % 8 == 0.
    """
    j = pl.program_id(1)

    ci = jax.lax.broadcasted_iota(jnp.int32, (LANES, K), 0)   # target col
    lane_cp = jax.lax.broadcasted_iota(jnp.int32, (K, CP), 1)

    @pl.when(j == 0)
    def _zero_ring():
        ring[...] = jnp.zeros((RING, LANES, CP), acc_dtype)

    @pl.when(j < nsteps)
    def _process():
        vdt = vals_ref.dtype
        onehot_cnt = jnp.where(lane_cp == C + 1, 1.0, 0.0).astype(vdt)

        def do_row(r, _):
            rmin = meta_ref[0, 0, r, 0]
            nrows_m1 = meta_ref[0, 0, r, 1]

            @pl.when(nrows_m1 >= 0)
            def _row():
                u = ut_ref[0, 0, r, 0:1, :].astype(jnp.float32)   # (1, K)
                v = vt_ref[0, 0, r, 0:1, :].astype(jnp.float32)
                gx = jax.lax.broadcasted_iota(
                    jnp.int32, (1, K), 1).astype(jnp.float32)
                srow = (j * ROWS_PER_STEP + r).astype(jnp.float32)

                fx = gx + u
                x0 = jnp.floor(fx)
                wx1 = fx - x0
                wx0 = 1.0 - wx1
                bad_x = (x0 < -1.0) | (x0 > float(W))
                zero = jnp.zeros_like(x0)
                one = jnp.ones_like(x0)
                wx0 = jnp.where(bad_x, zero, wx0)
                wx1 = jnp.where(bad_x, zero, wx1)
                vx = jnp.where(bad_x, zero, one)
                pos = jnp.where(bad_x, zero, x0 + 1.0).astype(jnp.int32)
                m0 = ci == pos
                m1 = ci == pos + 1
                St = jnp.where(m0, wx0, 0.0) + jnp.where(m1, wx1, 0.0)
                St2 = jnp.where(m0 | m1, vx, 0.0)
                Sb = jnp.concatenate([St, St2], axis=1).astype(vdt)

                fy = srow + v
                y0 = jnp.floor(fy)
                wy1 = fy - y0
                wy0 = 1.0 - wy1
                bad_y = (y0 < -1.0) | (y0 > float(H))
                wy0 = jnp.where(bad_y, zero, wy0)
                wy1 = jnp.where(bad_y, zero, wy1)
                uy = jnp.where(bad_y, zero, one)
                # belt + braces: even on a violated input (the caller routes
                # those to the XLA path) never write outside the ring window.
                y0c = jnp.clip(jnp.where(bad_y, srow, y0),
                               srow - float(D), srow + float(D))
                rel = y0c.astype(jnp.int32) - rmin                # (1, K)

                P = vals_ref[0, 0, r]                             # (K, CP)
                Ab = jnp.concatenate([P, onehot_cnt], axis=0)     # (2K, CP)

                def do_q(q, _):
                    cv = (jnp.where(rel == q, wy0, 0.0)
                          + jnp.where(rel == q - 1, wy1, 0.0))    # (1, K)
                    cu = (jnp.where(rel == q, uy, 0.0)
                          + jnp.where(rel == q - 1, uy, 0.0))
                    cvu = jnp.concatenate([cv, cu], axis=1).astype(vdt)
                    M = jnp.dot(Sb * cvu, Ab,
                                preferred_element_type=jnp.float32)
                    slot = jax.lax.rem(rmin + 1 + q, RING)
                    ring[pl.ds(slot, 1)] = (ring[pl.ds(slot, 1)]
                                            + M[None].astype(acc_dtype))
                    return 0

                # nrows_m1 + 2 row-slots: rows [rmin .. rmin+nrows-1] plus
                # the +1 bottom corner.
                jax.lax.fori_loop(0, nrows_m1 + 2, do_q, 0)
            return 0

        jax.lax.fori_loop(0, ROWS_PER_STEP, do_row, 0)

    # ---- flush this step's output block (rows 8*(j-LAG) .. +8) ----
    # RING % 8 == 0 and base_t % 8 == 0, so the 8 slots are one contiguous
    # ring slice. Target rows >= H+2 were never written and read zero.
    @pl.when(j >= LAG)
    def _flush():
        base_t = (j - LAG) * ROWS_PER_STEP
        slot0 = jax.lax.rem(base_t, RING)
        out_ref[0] = ring[pl.ds(slot0, ROWS_PER_STEP)].astype(out_dtype)
        ring[pl.ds(slot0, ROWS_PER_STEP)] = jnp.zeros(
            (ROWS_PER_STEP, LANES, CP), acc_dtype)


@functools.partial(jax.jit,
                   static_argnames=("max_dy", "compute_dtype", "interpret"))
def _splat_pallas_fast(img: jax.Array, flow: jax.Array, ez: jax.Array,
                       max_dy: int, compute_dtype,
                       interpret: bool = False):
    """The fast path (requires |floor(y+v) - y| <= max_dy for every pixel
    with nonzero contribution — see splat_fused_pallas). Returns
    (out, norm, count) like ops.softsplat._splat_fused_base."""
    B, H, W, C = img.shape
    assert H % ROWS_PER_STEP == 0, H
    D = max_dy
    LAG = _cdiv(D - 1, ROWS_PER_STEP)
    # alias-safety: at flush time of step j the newest reachable padded row
    # is 8j + D + 9; the flushed block starts at 8(j - LAG).
    RING = _round8(8 * LAG + D + 10)
    K = _round8(W)
    LANES = _round8(W + 3)          # padded cols [0..W+1] + pos+1 slack
    CP = C + 2
    nsteps = H // ROWS_PER_STEP
    cdt = jnp.dtype(compute_dtype) if compute_dtype is not None else img.dtype
    acc = jnp.float32 if (D <= 16 or cdt == jnp.float32) else cdt

    gx = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    fu = flow[..., 0].astype(jnp.float32)
    fv = flow[..., 1].astype(jnp.float32)

    # per-source-row meta: [rmin, nrows-1] over contributing pixels only
    x0 = jnp.floor(gx + fu)
    y0 = jnp.floor(gy + fv)
    bad_x = (x0 < -1.0) | (x0 > W)
    bad_y = (y0 < -1.0) | (y0 > H)
    srow = jnp.broadcast_to(gy, (B, H, W))
    y0c = jnp.clip(jnp.where(bad_y, srow, y0), srow - D, srow + D)
    good = ~bad_x & ~bad_y
    y0m = jnp.where(good, y0c, srow)
    rmin = jnp.min(y0m, axis=2).astype(jnp.int32)        # (B, H)
    rmax = jnp.max(y0m, axis=2).astype(jnp.int32)
    nrows_m1 = jnp.where(jnp.any(good, axis=2), rmax - rmin, -1)
    meta = jnp.stack([rmin, nrows_m1], axis=-1).reshape(B, nsteps,
                                                        ROWS_PER_STEP, 2)

    # payload, pixel-major: [img * ez | ez | 0]; W padded to K with zeros
    ezf = ez.astype(jnp.float32)
    pay = jnp.concatenate([
        img.astype(jnp.float32) * ezf, ezf,
        jnp.zeros((B, H, W, 1), jnp.float32)], axis=-1).astype(cdt)
    pay = jnp.pad(pay, ((0, 0), (0, 0), (0, K - W), (0, 0)))
    vals = pay.reshape(B, nsteps, ROWS_PER_STEP, K, CP)

    # flow rows, lane-oriented; u-padding 1e9 -> off-grid -> zero weights
    ut = jnp.pad(fu, ((0, 0), (0, 0), (0, K - W)), constant_values=1e9)
    vt = jnp.pad(fv, ((0, 0), (0, 0), (0, K - W)))
    ut = ut.reshape(B, nsteps, ROWS_PER_STEP, 1, K)
    vt = vt.reshape(B, nsteps, ROWS_PER_STEP, 1, K)

    out_dtype = img.dtype
    grid = (B, nsteps + LAG + 1)
    out_rows = (nsteps + 1) * ROWS_PER_STEP             # >= H + 2, 8-aligned

    out = pl.pallas_call(
        functools.partial(_splat_kernel, H=H, W=W, D=D, LAG=LAG, RING=RING,
                          CP=CP, C=C, LANES=LANES, K=K, nsteps=nsteps,
                          out_dtype=out_dtype, acc_dtype=acc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, ROWS_PER_STEP, 2),
                         lambda b, jj: (b, jnp.minimum(jj, nsteps - 1), 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, ROWS_PER_STEP, K, CP),
                         lambda b, jj: (b, jnp.minimum(jj, nsteps - 1),
                                        0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ROWS_PER_STEP, 1, K),
                         lambda b, jj: (b, jnp.minimum(jj, nsteps - 1),
                                        0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ROWS_PER_STEP, 1, K),
                         lambda b, jj: (b, jnp.minimum(jj, nsteps - 1),
                                        0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, ROWS_PER_STEP, LANES, CP),
            lambda b, jj: (b, jnp.maximum(jj - LAG, 0), 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, out_rows, LANES, CP), out_dtype),
        scratch_shapes=[pltpu.VMEM((RING, LANES, CP), acc)],
        interpret=interpret,
    )(meta, vals, ut, vt)

    inner = out[:, 1:H + 1, 1:W + 1, :]                 # (B, H, W, CP)
    return inner[..., :C], inner[..., C:C + 1], inner[..., C + 1:C + 2]


def _kernel_vmem_bytes(W, C, max_dy, compute_dtype, img_dtype):
    """Total scoped-VMEM footprint: ring scratch + double-buffered pipeline
    blocks (Mosaic pads the minor dim to 128 lanes, the next-minor to 8
    sublanes)."""
    D = max_dy
    LAG = _cdiv(D - 1, ROWS_PER_STEP)
    RING = _round8(8 * LAG + D + 10)
    K = _round8(W)
    LANES = _round8(W + 3)
    cdt = jnp.dtype(compute_dtype) if compute_dtype is not None else \
        jnp.dtype(img_dtype)
    acc = jnp.dtype(jnp.float32) if (D <= 16 or cdt == jnp.float32) else cdt
    out_dt = jnp.dtype(img_dtype)
    cp_pad = _cdiv(C + 2, 128) * 128
    k_pad = _cdiv(K, 128) * 128
    ring = RING * LANES * cp_pad * acc.itemsize
    vals_blk = ROWS_PER_STEP * K * cp_pad * cdt.itemsize
    flow_blk = 2 * ROWS_PER_STEP * 8 * k_pad * 4          # ut + vt, f32
    out_blk = ROWS_PER_STEP * LANES * cp_pad * out_dt.itemsize
    return ring + 2 * (vals_blk + flow_blk + out_blk)


def splat_violation(flow: jax.Array, max_dy: int) -> jax.Array:
    """Traced bool: does any pixel need vertical reach beyond +-max_dy?
    (Pixels thrown entirely off the padded grid don't count — they are
    dropped exactly like the CUDA kernel drops them.)"""
    B, H, W, _ = flow.shape
    gy = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    fy = gy + flow[..., 1].astype(jnp.float32)
    y0 = jnp.floor(fy)
    in_grid = (y0 >= -1.0) & (y0 <= H)
    return jnp.any(in_grid & (jnp.abs(y0 - gy) > max_dy))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def splat_fused_pallas(img, flow, z, max_dy: int = 32,
                       compute_dtype=None, interpret: bool = False):
    """Fused softmax+count splat, Pallas fast path with an exact XLA
    fallback for flows whose vertical reach exceeds +-max_dy (or whose
    ring accumulator would blow the VMEM budget — very wide frames).

    Same contract as ops.softsplat._splat_fused_base: returns
    (out, norm, count) with out = splat_sum(img * e^z), norm =
    splat_sum(e^z), count = unweighted corner hits. Inference-only:
    differentiating through it raises (custom_vjp below) instead of
    silently zeroing upstream gradients — training uses the autodiff
    scatter backends ('scan'/'base').
    """
    from motif_tpu.ops.softsplat import _splat_fused_base

    B, H, W, C = img.shape
    ez = jnp.exp(z)

    if (H % ROWS_PER_STEP != 0
            or _kernel_vmem_bytes(W, C, max_dy, compute_dtype, img.dtype)
            > _VMEM_SCOPED_LIMIT):
        return _splat_fused_base(img, flow, None, ez)

    def fast(args):
        i, f, e = args
        return _splat_pallas_fast(i, f, e, max_dy, compute_dtype,
                                  interpret=interpret)

    def slow(args):
        i, f, e = args
        out, norm, count = _splat_fused_base(i, f, None, e)
        return out, norm, count

    return jax.lax.cond(splat_violation(flow, max_dy), slow, fast,
                        (img, flow, ez))


def _splat_pallas_vjp_fwd(img, flow, z, max_dy, compute_dtype, interpret):
    return splat_fused_pallas(img, flow, z, max_dy, compute_dtype,
                              interpret), None


def _splat_pallas_vjp_bwd(max_dy, compute_dtype, interpret, res, g):
    raise NotImplementedError(
        "splat_method='pallas' is inference-only: the ring-sweep kernel has "
        "no VJP. Train with splat_method='scan' (memory-lean) or 'base' "
        "(autodiff scatter) — see ops/softsplat.py::splat_fused.")


splat_fused_pallas.defvjp(_splat_pallas_vjp_fwd, _splat_pallas_vjp_bwd)
