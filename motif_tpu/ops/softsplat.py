"""Forward (softmax) splatting — TPU-native replacement for the reference's
CuPy CUDA kernel trio (models/softsplat_cp.py, softsplat_max_cp.py,
softsplat_count_cp.py).

Semantics reproduced exactly:

* splat_sum (softsplat_cp.py:12-51): each source pixel p with target
  position q = p + flow(p) bilinearly scatter-adds input(p) * w_corner into
  the 4 integer corners around q; out-of-bounds corners are dropped.
  Gradients w.r.t. BOTH input and flow (softsplat_cp.py:54-157) fall out of
  JAX autodiff of this formulation analytically identically: the corner
  indices are floor() (piecewise-constant, zero grad) and the weights are
  bilinear in flow.
* splat_max (softsplat_max_cp.py): same addressing, atomicMax instead of
  add, and the output is initialised to ONES not zeros
  (softsplat_max_cp.py:254). Call sites detach the result (Ours.py:801,805)
  so this op is wrapped in stop_gradient.
* splat_count (softsplat_count_cp.py:14-51): splats a ones tensor with NO
  bilinear weighting — every in-bounds corner gets +1. Non-differentiable
  in the reference (backward returns None); stop_gradient here.
* softmax_splat (FunctionSoftsplat 'softmax' mode, softsplat_cp.py:320-347):
  splat_sum of [input * exp(z), exp(z)] and returns (splatted, normalizer)
  WITHOUT normalising (the reference model normalises after merging the two
  warp directions, Ours.py:810-824).

Layout: NHWC. flow (B, H, W, 2) with (u=x-disp, v=y-disp) in pixels. Source
and target grids have the same shape (as in the reference kernels).

Implementation: corner-decomposed scatter via jnp .at[].add/.max over a
flattened spatial axis. XLA lowers this to a single scatter op per
reduction; a fused Pallas kernel backend can be swapped in via
`set_backend` once profiled on real hardware.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _corner_data(flow: jax.Array, H: int, W: int):
    """Return per-corner (flat_idx, weight, valid) lists.

    flow: (B, H, W, 2). Targets: x = ix + u, y = iy + v.
    """
    gx = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    fx = gx + flow[..., 0]   # promotes to flow's dtype (fp64 parity path)
    fy = gy + flow[..., 1]

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    ix1 = ix0 + 1
    iy1 = iy0 + 1

    wx1 = fx - x0
    wy1 = fy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    corners = []
    for iy, ix, w in (
        (iy0, ix0, wy0 * wx0),  # northwest
        (iy0, ix1, wy0 * wx1),  # northeast
        (iy1, ix0, wy1 * wx0),  # southwest
        (iy1, ix1, wy1 * wx1),  # southeast
    ):
        valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        # clip for safe addressing; invalid lanes are masked to weight 0 and
        # routed to index 0.
        idx = jnp.where(valid, jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1), 0)
        corners.append((idx, w, valid))
    return corners


def splat_sum(values: jax.Array, flow: jax.Array) -> jax.Array:
    """Bilinear scatter-add forward warp. values (B,H,W,C), flow (B,H,W,2)."""
    B, H, W, C = values.shape
    corners = _corner_data(flow, H, W)
    idx = jnp.stack([c[0] for c in corners], 1).reshape(B, -1)          # (B, 4HW)
    w = jnp.stack([jnp.where(c[2], c[1], 0.0) for c in corners], 1)     # (B,4,H,W)
    vals = values[:, None] * w[..., None].astype(values.dtype)          # (B,4,H,W,C)
    vals = vals.reshape(B, -1, C)
    out = jnp.zeros((B, H * W, C), dtype=values.dtype)
    out = out.at[jnp.arange(B)[:, None], idx].add(vals)
    return out.reshape(B, H, W, C)


def splat_max(values: jax.Array, flow: jax.Array) -> jax.Array:
    """Bilinear scatter-max forward warp, output initialised to ONES.

    Matches softsplat_max_cp.py: out[q] = max(1.0, max_p values(p)*w(p,q)).
    The reference call sites detach the result, so we stop_gradient.
    """
    B, H, W, C = values.shape
    corners = _corner_data(flow, H, W)
    idx = jnp.stack([c[0] for c in corners], 1).reshape(B, -1)
    # invalid contributions must not affect the max: send -inf
    w = jnp.stack([c[1] for c in corners], 1)
    valid = jnp.stack([c[2] for c in corners], 1)
    vals = values[:, None] * w[..., None].astype(values.dtype)
    vals = jnp.where(valid[..., None], vals, -jnp.inf)
    vals = vals.reshape(B, -1, C)
    out = jnp.ones((B, H * W, C), dtype=values.dtype)
    out = out.at[jnp.arange(B)[:, None], idx].max(vals)
    return jax.lax.stop_gradient(out.reshape(B, H, W, C))


def splat_count(flow: jax.Array) -> jax.Array:
    """Unweighted corner-hit count (softsplat_count_cp.py): +1 per in-bounds
    corner per source pixel. Returns (B, H, W, 1). Non-differentiable."""
    B, H, W, _ = flow.shape
    corners = _corner_data(flow, H, W)
    idx = jnp.stack([c[0] for c in corners], 1).reshape(B, -1)
    ones = jnp.stack([c[2].astype(jnp.float32) for c in corners], 1).reshape(B, -1, 1)
    out = jnp.zeros((B, H * W, 1), dtype=jnp.float32)
    out = out.at[jnp.arange(B)[:, None], idx].add(ones)
    return jax.lax.stop_gradient(out.reshape(B, H, W, 1))


def _splat_fused_base(img, flow, z, ez, scatter_dtype=None):
    """Base-cell scatter backend: ONE scatter row per source pixel.

    XLA TPU scatter throughput is row-rate-bound (~4e7 rows/s measured on
    v5e, BASELINE.md), so the 4-corner decomposition pays 4x. Instead each
    source pixel scatters a single row holding all four corner payloads
    into its base cell (floor target + 1) of a (H+2, W+2) accumulator:

        A[y0+1, x0+1, slot_ab] += w_ab * [img*e^z | e^z | 1]

    and the true output is a dense shift-combine (4 slice adds):

        out[y, x] = A[y+1, x+1, s00] + A[y+1, x, s01]
                  + A[y, x+1, s10] + A[y, x, s11]

    Out-of-bounds corners need no masking: a corner beyond the image edge
    lands in a base cell the combine never reads from that slot, and wholly
    out-of-range sources get base indices outside the padded buffer, which
    scatter mode='drop' discards — exactly the CUDA kernel's bounds check
    (softsplat_cp.py:30-38). Per-corner count validity is likewise implied.

    ~4x the live memory of the scan backend (the slotted accumulator), so
    training keeps 'scan'; this is the inference/serving backend.

    scatter_dtype: accumulate the scatter in a narrower dtype (e.g.
    float16) — halves the scattered bytes. f16 keeps 10 mantissa bits and
    the splat sums are short (<= ~dozens of O(1) contributions; exp(z) <= 1
    whenever alpha <= 0), so the relative error stays ~1e-3; must be
    accuracy-gated per deployment like compute_dtype. None = img.dtype.
    """
    B, H, W, C = img.shape
    sdt = jnp.dtype(scatter_dtype) if scatter_dtype is not None else img.dtype
    gx = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    fx = gx + flow[..., 0]
    fy = gy + flow[..., 1]
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx1 = (fx - x0).astype(sdt)[..., None]
    wy1 = (fy - y0).astype(sdt)[..., None]
    wx0 = (1.0 - wx1.astype(jnp.float32)).astype(sdt)
    wy0 = (1.0 - wy1.astype(jnp.float32)).astype(sdt)

    ezf = ez.astype(sdt)
    u = jnp.concatenate([img.astype(sdt) * ezf, ezf], -1)          # (B,H,W,C+1)
    # One outer product builds all four corner payloads (vs a 12-piece
    # concat of per-corner multiplies — ~1.4 GB less elementwise traffic at
    # serving sizes). Counts (+1 per corner, unweighted — softsplat_count
    # semantics) ride as four trailing channels.
    w4 = jnp.concatenate([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1],
                         -1)                                       # (B,H,W,4)
    ones4 = jax.lax.stop_gradient(jnp.ones_like(w4))
    payload = jnp.concatenate([
        (u[..., None, :] * w4[..., :, None]).reshape(B, H, W, 4 * (C + 1)),
        ones4], -1)                                                # (B,H,W,4(C+1)+4)

    # The accumulator is flattened to one spatial axis, so per-axis bounds
    # must be checked explicitly (a row-only overflow would alias into the
    # next row); fully out-of-range sources are routed past the end and
    # dropped by the scatter.
    Wp = W + 2
    iy = y0.astype(jnp.int32) + 1
    ix = x0.astype(jnp.int32) + 1
    valid = (iy >= 0) & (iy <= H + 1) & (ix >= 0) & (ix <= W + 1)
    base = jnp.where(valid, iy * Wp + ix, (H + 2) * Wp)
    acc = jnp.zeros((B, (H + 2) * Wp, 4 * (C + 2)), sdt)
    acc = acc.at[jnp.arange(B)[:, None], base.reshape(B, -1)].add(
        payload.reshape(B, H * W, -1), mode="drop")
    accv = acc[..., :4 * (C + 1)].reshape(B, H + 2, Wp, 4, C + 1)
    accc = acc[..., 4 * (C + 1):].reshape(B, H + 2, Wp, 4, 1)

    def shift_combine(a):
        return (a[:, 1:H + 1, 1:W + 1, 0] + a[:, 1:H + 1, 0:W, 1]
                + a[:, 0:H, 1:W + 1, 2] + a[:, 0:H, 0:W, 3]).astype(img.dtype)

    comb = shift_combine(accv)
    out = comb[..., :C]
    norm = comb[..., C:C + 1]
    count = jax.lax.stop_gradient(shift_combine(accc))
    return out, norm, count


def _splat_max_scan(ez, flow, dtype):
    """Ones-initialised bilinear scatter-max of exp(z) (softsplat_max_cp.py)."""
    B, H, W, _ = flow.shape
    corners = _corner_data(flow, H, W)
    bidx = jnp.arange(B)[:, None]
    idx4 = jnp.stack([c[0].reshape(B, -1) for c in corners], 0)
    w4 = jnp.stack([c[1].reshape(B, -1) for c in corners], 0).astype(dtype)
    v4 = jnp.stack([c[2].reshape(B, -1) for c in corners], 0)
    ezm = ez.reshape(B, H * W).astype(dtype)

    def mbody(zm, args):
        ci, wi, vi = args
        mx = jnp.where(vi, ezm * wi, -jnp.inf)[..., None]
        return zm.at[bidx, ci].max(mx), None

    zm = jnp.ones((B, H * W, 1), dtype=dtype)
    zm, _ = jax.lax.scan(mbody, zm, (idx4, w4, v4))
    return zm.reshape(B, H, W, 1)


def splat_fused(img: jax.Array, flow: jax.Array, z: jax.Array,
                z_nonpositive: jax.Array | None = None,
                method: str = "scan", scatter_dtype=None,
                pallas_max_dy: int = 32, pallas_interpret: bool = False):
    """Fused softmax-splat + max-splat + count-splat sharing one corner
    computation (the reference launches three CuPy kernels; Ours.py:799-806).

    Returns (out, norm, z_max, count):
      out    = splat_sum(img * exp(z))            (B,H,W,C)
      norm   = splat_sum(exp(z))                  (B,H,W,1)
      z_max  = max(1, max-splat(exp(z) * w))      (B,H,W,1)  [stop-grad]
      count  = unweighted corner-hit count        (B,H,W,1)  [stop-grad]

    The count channel rides the same scatter-add as the sum (its update is
    the corner validity instead of the bilinear weight); the max reduction
    needs its own scatter — UNLESS z <= 0 everywhere, in which case
    exp(z)*w <= 1 and z_max == 1 identically (the max-splat output is
    initialised to ones, softsplat_max_cp.py:254). Pass `z_nonpositive`
    (a traced scalar bool, e.g. alpha <= 0 in MoTIF where z = relu(x)*alpha)
    to skip the max scatter at runtime via lax.cond — exact, saves ~25%
    of the splat cost in practice.

    method: 'scan' (memory-lean, 4 sequential corner scatters — the
    training default), 'base' (one scatter row per source pixel + dense
    shift-combine, ~4x fewer scatter rows but ~4x live memory), or 'pallas'
    (ring-sweep MXU-placement kernel, ops/softsplat_pallas.py — the fastest
    serving backend; inference-only, exact XLA fallback via lax.cond when
    any pixel's vertical reach exceeds ±pallas_max_dy).
    """
    B, H, W, C = img.shape
    ez = jnp.exp(z)

    if method == "pallas":
        from motif_tpu.ops.softsplat_pallas import splat_fused_pallas

        out, norm, count = splat_fused_pallas(
            img, flow, z, max_dy=pallas_max_dy,
            compute_dtype=scatter_dtype, interpret=pallas_interpret)

        if z_nonpositive is None:
            z_max = _splat_max_scan(ez, flow, img.dtype)
        else:
            z_max = jax.lax.cond(
                z_nonpositive,
                lambda _: jnp.ones((B, H, W, 1), img.dtype),
                lambda _: _splat_max_scan(ez, flow, img.dtype), operand=None)
        return (out, norm, jax.lax.stop_gradient(z_max),
                jax.lax.stop_gradient(count))

    if method == "base":
        out, norm, count = _splat_fused_base(img, flow, z, ez,
                                             scatter_dtype=scatter_dtype)

        def ones_zmax(_):
            return jnp.ones((B, H, W, 1), img.dtype)

        if z_nonpositive is None:
            z_max = _splat_max_scan(ez, flow, img.dtype)
        else:
            z_max = jax.lax.cond(
                z_nonpositive, ones_zmax,
                lambda _: _splat_max_scan(ez, flow, img.dtype), operand=None)
        return out, norm, jax.lax.stop_gradient(z_max), count

    corners = _corner_data(flow, H, W)
    bidx = jnp.arange(B)[:, None]

    # one scatter per corner, strictly sequential via lax.scan: the peak
    # temp is ONE (B, HW, C+2) vals buffer. An unrolled Python loop lets
    # XLA's scheduler keep all four corner buffers (and their remat clones)
    # alive at once — measured 5x1.75G live at batch 4 / GT 128, which
    # OOMed a single v5e; the scan form reuses one buffer per iteration.
    # The [img*ez | ez] stack is built directly in the flattened scatter
    # layout — materializing it in image layout too costs another full-size
    # buffer (a 1.75G layout copy at batch 4).
    idx4 = jnp.stack([c[0].reshape(B, -1) for c in corners], 0)       # (4,B,HW)
    w4 = jnp.stack([jnp.where(c[2], c[1], 0.0).reshape(B, -1)
                    for c in corners], 0).astype(img.dtype)
    v4 = jnp.stack([c[2].reshape(B, -1) for c in corners], 0)
    ezf = ez.reshape(B, H * W, 1)
    flat = jnp.concatenate([img.reshape(B, H * W, C) * ezf, ezf], -1)

    def body(acc, args):
        ci, wi, vi = args
        vals = flat * wi[..., None]
        cnt = jax.lax.stop_gradient(vi.astype(img.dtype))[..., None]
        vals = jnp.concatenate([vals, cnt], axis=-1)
        return acc.at[bidx, ci].add(vals), None

    acc = jnp.zeros((B, H * W, C + 2), dtype=img.dtype)
    acc, _ = jax.lax.scan(body, acc, (idx4, w4, v4))
    acc = acc.reshape(B, H, W, C + 2)
    out, norm, count = acc[..., :C], acc[..., C:C + 1], acc[..., C + 1:]

    def max_splat(_):
        ezm = ez.reshape(B, H * W)

        def mbody(zm, args):
            ci, wi, vi = args
            mx = jnp.where(vi, ezm * wi, -jnp.inf)[..., None]
            return zm.at[bidx, ci].max(mx), None

        zm = jnp.ones((B, H * W, 1), dtype=img.dtype)
        zm, _ = jax.lax.scan(mbody, zm, (idx4, w4, v4))
        return zm.reshape(B, H, W, 1)

    if z_nonpositive is None:
        z_max = max_splat(None)
    else:
        z_max = jax.lax.cond(z_nonpositive,
                             lambda _: jnp.ones((B, H, W, 1), img.dtype),
                             max_splat, operand=None)
    return out, norm, jax.lax.stop_gradient(z_max), jax.lax.stop_gradient(count)


def function_softsplat(img: jax.Array, flow: jax.Array, z: jax.Array | None,
                       mode: str = "softmax"):
    """The reference's four-mode API (FunctionSoftsplat,
    softsplat_cp.py:320-347). img (B,H,W,C), flow (B,H,W,2), z (B,H,W,1)
    (None allowed for 'summation'/'average').

      summation — plain splat_sum(img); returns (out, None)
      average   — splat [img | 1];       returns (out, normalizer)
      linear    — splat [img*z | z];     returns (out, normalizer)
      softmax   — splat [img*e^z | e^z]; returns (out, normalizer)

    Like the reference, the output is NOT normalised (the division is
    commented out there); the trailing channel is returned separately.
    """
    assert mode in ("summation", "average", "linear", "softmax")
    if mode == "summation":
        return splat_sum(img, flow), None
    if mode == "average":
        w = jnp.ones_like(img[..., :1])
    elif mode == "linear":
        assert z is not None and z.shape[-1] == 1
        w = z
    else:
        assert z is not None and z.shape[-1] == 1
        w = jnp.exp(z)
    out = splat_sum(jnp.concatenate([img * w, w], axis=-1), flow)
    return out[..., :-1], out[..., -1:]


def softmax_splat(img: jax.Array, flow: jax.Array, z: jax.Array):
    """Softmax-mode splat (reference Softsplat module, softsplat_cp.py:349).

    img (B,H,W,C), flow (B,H,W,2), z (B,H,W,1) importance metric.
    Returns (splatted_img, normalizer) — both UN-normalised, exactly like
    the reference (the trailing exp(z) channel is returned separately).
    """
    ez = jnp.exp(z)
    stacked = jnp.concatenate([img * ez, ez], axis=-1)
    out = splat_sum(stacked, flow)
    return out[..., :-1], out[..., -1:]
