"""Modulated deformable convolution v2 (DCNv2) — TPU-native replacement for
the reference's C++/CUDA torch extension (models/modules/DCNv2/src/).

The CUDA implementation does offset-guided bilinear im2col
(dcn_v2_im2col_cuda.cu:25-60) followed by a batched GEMM
(dcn_v2_cuda.cu:19-40). Here the same math is expressed as an XLA-friendly
composition: bilinear *gather* at (base grid + offsets) → modulation mask →
im2col tensor → one einsum with the weights (MXU). Gradients w.r.t. input,
offsets, mask, weight and bias come from JAX autodiff and match the CUDA
col2im backward analytically (the sampling weights are bilinear in the
offsets; out-of-bounds samples contribute zero exactly as the kernel's
`h > -1 && w > -1` guards do).

Offset/mask channel layout matches the CUDA kernel's addressing
(dcn_v2_im2col_cuda.cu: data_offset indexed [g, 2*k + {0(y),1(x)}], mask
[g, k]); the DCN_sep wrapper in models/pcd.py produces offsets with this
layout from its conv_offset_mask, mirroring dcn_v2.py:127-140.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Global backend override (None = per-call/platform choice). Used by
# tools/count_ref_flops.py: the 'gather' formulation's FLOPs match the
# reference CUDA im2col+GEMM math 1:1 (gathers are 0-FLOP in XLA's cost
# model, the im2col einsum IS the reference GEMM), giving an honest
# reference-workload count for bench.py's A100 estimate.
_BACKEND_OVERRIDE: str | None = None

# Window halo for the 'ywin' backend — |offset_y| beyond this triggers the
# exact fallback (lax.cond, see _sample_ywin). Trained PCD offsets are a
# few pixels; 8 keeps the window ~3x smaller than H at PCD-L1 sizes.
_YWIN_MAX_DY = 8


def set_backend(backend: str | None):
    global _BACKEND_OVERRIDE
    _BACKEND_OVERRIDE = backend


def dcn_v2(
    x: jax.Array,
    offset: jax.Array,
    mask: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None,
    kernel_size: int = 3,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    deformable_groups: int = 1,
    backend: str = "auto",
) -> jax.Array:
    """Modulated deformable conv — see module docstring for layouts.

    backend='pallas': the sampling stage runs as a Pallas TPU kernel
    (ops/dcn_pallas.py) that keeps the one-hot contraction intermediates in
    VMEM (the XLA einsum materializes ~1 GB per PCD-size call in HBM);
    backward is the shared analytic einsum VJP. backend='onehot': separable
    bilinear sampling as two one-hot XLA contractions — no gathers, ~5-10x
    faster than the gather formulation at PCD sizes; works on any backend.
    backend='gather' keeps the direct take_along_axis transcription (the
    test oracle's counterpart). 'auto' = onehot (see below).
    All are numerically identical to the CUDA kernel semantics.
    """
    backend = _BACKEND_OVERRIDE or backend
    if backend == "auto":
        # onehot everywhere: the Pallas sampler wins its microbench but
        # regresses the end-to-end encoder on v5e (104.6 ms vs 82 ms —
        # its custom call fences XLA's fusion across the sampling stage),
        # so it stays an explicit opt-in.
        backend = "onehot"
    if backend == "gather":
        return _dcn_v2_gather(x, offset, mask, weight, bias, kernel_size,
                              stride, padding, dilation, deformable_groups)
    sampler = backend if backend in ("pallas", "ywin") else "einsum"
    return _dcn_v2_onehot(x, offset, mask, weight, bias, kernel_size,
                          stride, padding, dilation, deformable_groups,
                          sampler=sampler)


def _sample_positions(offset, B, Ho, Wo, G, K, stride, padding, dilation):
    off = offset.reshape(B, Ho, Wo, G, K * K, 2)
    oy = jnp.arange(Ho, dtype=jnp.float32) * stride - padding
    ox = jnp.arange(Wo, dtype=jnp.float32) * stride - padding
    ky = jnp.arange(K, dtype=jnp.float32).repeat(K) * dilation
    kx = jnp.tile(jnp.arange(K, dtype=jnp.float32) * dilation, K)
    py = oy[None, :, None, None, None] + ky[None, None, None, None, :] + off[..., 0]
    px = ox[None, None, :, None, None] + kx[None, None, None, None, :] + off[..., 1]
    return py, px


def _hat(pos: jax.Array, size: int) -> jax.Array:
    """hat-function bilinear weights over source index s ∈ [0, size).
    pos (..., Q) → (..., Q, size). Reproduces the CUDA kernel's per-corner
    zero-padding exactly (including the whole-sample drop at pos <= -1 or
    >= size, where both hat corners have zero weight)."""
    s = jnp.arange(size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - s))


def _hat_grad(pos: jax.Array, size: int) -> jax.Array:
    """d hat / d pos, floor-corner convention matching the CUDA grads
    (dmcn_get_coordinate_weight): -1 on the floor corner (0 <= d < 1),
    +1 on the ceil corner (-1 <= d < 0), 0 elsewhere."""
    s = jnp.arange(size, dtype=jnp.float32)
    d = pos[..., None] - s
    return jnp.where((d >= 0.0) & (d < 1.0), -1.0,
                     jnp.where((d >= -1.0) & (d < 0.0), 1.0, 0.0))


@jax.custom_vjp
def _sample_onehot(x: jax.Array, py: jax.Array, px: jax.Array) -> jax.Array:
    """Bilinear sampling of grouped features at (py, px) via one-hot
    contractions, batched over deformable groups in single einsums.
    x (B,H,W,G*cg); py/px (B,G,Q) → val (B,Q,G,cg).

    custom_vjp: analytic backward with the same batched-matmul structure."""
    B, H, W, Cin = x.shape
    G, Q = py.shape[1], py.shape[2]
    cg = Cin // G
    # Hats are built in fp32 (sub-pixel positions are precision-bearing)
    # and quantized to the input dtype only at the MXU inputs, with fp32
    # accumulation — under bf16 this is what keeps the (B,G,Q,H*cg)
    # intermediate bf16 instead of silently promoting the whole sampling
    # stage (and its ~GB-scale t1) back to fp32.
    acc_t = jnp.promote_types(x.dtype, jnp.float32)    # fp32 acc, fp64 stays fp64
    vx = _hat(px, W).astype(x.dtype)                   # (B, G, Q, W)
    vy = _hat(py, H).astype(x.dtype)                   # (B, G, Q, H)
    # x → (B, G, W, H*cg)
    xp = x.reshape(B, H, W, G, cg).transpose(0, 3, 2, 1, 4).reshape(B, G, W, H * cg)
    t1 = jnp.einsum("bgqw,bgwk->bgqk", vx, xp)         # batched MXU matmul
    t1 = t1.reshape(B, G, Q, H, cg)
    val = jnp.einsum("bgqhc,bgqh->bgqc", t1, vy,
                     preferred_element_type=acc_t)
    return val.transpose(0, 2, 1, 3).astype(x.dtype)   # (B, Q, G, cg)


def _sample_onehot_fwd(x, py, px):
    return _sample_onehot(x, py, px), (x, py, px)


def _sample_onehot_bwd(res, g_val):
    x, py, px = res
    B, H, W, Cin = x.shape
    G, Q = py.shape[1], py.shape[2]
    cg = Cin // G
    acc_t = jnp.promote_types(x.dtype, jnp.float32)
    gv = g_val.transpose(0, 2, 1, 3).astype(x.dtype)   # (B, G, Q, cg)
    vx = _hat(px, W).astype(x.dtype)                   # (B, G, Q, W)
    vy = _hat(py, H).astype(x.dtype)                   # (B, G, Q, H)
    xg = x.reshape(B, H, W, G, cg)

    # t2[b,g,q,x,c] = sum_y vy X     (for dvx)
    xh = xg.transpose(0, 3, 1, 2, 4).reshape(B, G, H, W * cg)
    t2 = jnp.einsum("bgqy,bgyk->bgqk", vy, xh).reshape(B, G, Q, W, cg)
    dvx = jnp.einsum("bgqxc,bgqc->bgqx", t2, gv,
                     preferred_element_type=acc_t)
    dpx = jnp.sum(dvx * _hat_grad(px, W), axis=-1)     # (B, G, Q) fp32

    # t1[b,g,q,h,c] = sum_x vx X     (for dvy)
    xp = xg.transpose(0, 3, 2, 1, 4).reshape(B, G, W, H * cg)
    t1 = jnp.einsum("bgqw,bgwk->bgqk", vx, xp).reshape(B, G, Q, H, cg)
    dvy = jnp.einsum("bgqhc,bgqc->bgqh", t1, gv,
                     preferred_element_type=acc_t)
    dpy = jnp.sum(dvy * _hat_grad(py, H), axis=-1)

    # dX[b,y,x,g,c] = sum_q vy[b,g,q,y] vx[b,g,q,x] gv[b,g,q,c]
    u = (vx[..., None] * gv[:, :, :, None, :]).reshape(B, G, Q, W * cg)
    dx = jnp.einsum("bgqy,bgqk->bgyk", vy, u,
                    preferred_element_type=acc_t).reshape(B, G, H, W, cg)
    dx = dx.transpose(0, 2, 3, 1, 4).reshape(B, H, W, Cin).astype(x.dtype)
    return dx, dpy.astype(py.dtype), dpx.astype(px.dtype)


_sample_onehot.defvjp(_sample_onehot_fwd, _sample_onehot_bwd)


@jax.custom_vjp
def _sample_via_pallas(x: jax.Array, py: jax.Array, px: jax.Array) -> jax.Array:
    """Same contract as _sample_onehot; forward = the Pallas VMEM kernel,
    backward = the shared analytic einsum VJP."""
    from motif_tpu.ops.dcn_pallas import sample_pallas

    return sample_pallas(x, py, px)


def _sample_via_pallas_fwd(x, py, px):
    return _sample_via_pallas(x, py, px), (x, py, px)


_sample_via_pallas.defvjp(_sample_via_pallas_fwd, _sample_onehot_bwd)


def ywin_violation(py: jax.Array, H: int, row_len: int, pad: int,
                   dilation: int, K: int, max_dy: int) -> jax.Array:
    """Traced bool: does any sample have an IN-IMAGE bilinear corner row
    outside its output row's static y-window? (Out-of-image corners
    contribute exactly zero — the CUDA kernel's bounds guard — so they
    never count.) Guard for sample_pallas_ywin, mirroring
    softsplat_pallas.splat_violation.

    Checks the LOGICAL window ((K-1)*dil + 2*max_dy + 2 rows); the kernel's
    padded window (ywin_window: +1 sublane of slack, start aligned down to
    a sublane boundary) is a strict superset of it for every row, so
    passing this check guarantees in-window sampling in the kernel."""
    Q = py.shape[2]
    Hw = min(H, (K - 1) * dilation + 2 * max_dy + 2)
    rows = (jnp.arange(Q, dtype=jnp.int32) // row_len)[None, None]
    y0 = jnp.clip(rows - pad - max_dy, 0, H - Hw).astype(jnp.float32)
    c0 = jnp.floor(py)

    def bad(c):
        return (c >= 0.0) & (c <= H - 1.0) & ((c < y0) | (c > y0 + Hw - 1.0))

    return jnp.any(bad(c0) | bad(c0 + 1.0))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _sample_ywin(x, py, px, geom):
    """Row-windowed Pallas sampling with the exact one-hot fallback when
    any offset reaches beyond the window (same guard pattern as the Pallas
    splat, softsplat_pallas.py:318-353). geom = (row_len, pad, dilation,
    K, max_dy). Forward values are exact either way; backward is the
    shared analytic einsum VJP."""
    from motif_tpu.ops.dcn_pallas import sample_pallas_ywin

    row_len, pad, dilation, K, max_dy = geom
    H = x.shape[1]
    # interpret mode off-TPU so the CPU test lane executes the real cond
    # path; on TPU this compiles the Mosaic kernel.
    interp = jax.default_backend() != "tpu"

    def fast(args):
        return sample_pallas_ywin(*args, row_len=row_len, pad=pad,
                                  dilation=dilation, K=K, max_dy=max_dy,
                                  interpret=interp)

    def slow(args):
        return _sample_onehot(*args)

    return jax.lax.cond(
        ywin_violation(py, H, row_len, pad, dilation, K, max_dy),
        slow, fast, (x, py, px))


def _sample_ywin_fwd(x, py, px, geom):
    return _sample_ywin(x, py, px, geom), (x, py, px)


def _sample_ywin_bwd(geom, res, g_val):
    return _sample_onehot_bwd(res, g_val)


_sample_ywin.defvjp(_sample_ywin_fwd, _sample_ywin_bwd)


def _dcn_v2_onehot(x, offset, mask, weight, bias, K, stride, padding,
                   dilation, G, sampler="einsum"):
    B, H, W, Cin = x.shape
    cg = Cin // G
    Ho = (H + 2 * padding - (dilation * (K - 1) + 1)) // stride + 1
    Wo = (W + 2 * padding - (dilation * (K - 1) + 1)) // stride + 1
    py, px = _sample_positions(offset, B, Ho, Wo, G, K, stride, padding, dilation)
    # (B, Ho, Wo, G, KK) → (B, G, Q) with Q = Ho*Wo*KK
    Q = Ho * Wo * K * K
    py = py.transpose(0, 3, 1, 2, 4).reshape(B, G, Q)
    px = px.transpose(0, 3, 1, 2, 4).reshape(B, G, Q)

    if sampler == "ywin":
        # rows of py/px are already (Ho, Wo, KK) row-major → row_len = Wo*KK
        val = _sample_ywin(x, py, px,
                           (Wo * K * K, padding, dilation, K, _YWIN_MAX_DY))
    else:
        sample = _sample_via_pallas if sampler == "pallas" else _sample_onehot
        val = sample(x, py, px)                        # (B, Q, G, cg)
    val = val.reshape(B, Ho, Wo, K * K, G, cg).transpose(0, 1, 2, 4, 3, 5)
    val = val * mask.reshape(B, Ho, Wo, G, K * K, 1).astype(val.dtype)
    w = weight.reshape(K * K, G, cg, weight.shape[-1]).astype(val.dtype)
    out = jnp.einsum("bhwgkc,kgco->bhwo", val, w,
                     preferred_element_type=jnp.promote_types(x.dtype, jnp.float32))
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def _dcn_v2_gather(
    x: jax.Array,
    offset: jax.Array,
    mask: jax.Array,
    weight: jax.Array,
    bias: jax.Array | None,
    kernel_size: int = 3,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    deformable_groups: int = 1,
) -> jax.Array:
    """Modulated deformable conv.

    x:      (B, H, W, Cin)       NHWC input
    offset: (B, Ho, Wo, G*K*K*2) layout (g, k, [y, x]) fastest-last
    mask:   (B, Ho, Wo, G*K*K)   layout (g, k), already sigmoided
    weight: (K, K, Cin, Cout)    HWIO
    bias:   (Cout,) or None
    Returns (B, Ho, Wo, Cout).

    Only stride=1/padding=k//2 output geometry is exercised by the model but
    the general formula is implemented.
    """
    B, H, W, Cin = x.shape
    K = kernel_size
    G = deformable_groups
    assert Cin % G == 0, "input channels must divide deformable_groups"
    Ho = (H + 2 * padding - (dilation * (K - 1) + 1)) // stride + 1
    Wo = (W + 2 * padding - (dilation * (K - 1) + 1)) // stride + 1
    assert offset.shape == (B, Ho, Wo, G * K * K * 2), offset.shape
    assert mask.shape == (B, Ho, Wo, G * K * K), mask.shape

    off = offset.reshape(B, Ho, Wo, G, K * K, 2)
    off_y = off[..., 0]
    off_x = off[..., 1]

    # base sampling grid: p = out_pos * stride - pad + k * dilation + offset
    oy = jnp.arange(Ho, dtype=jnp.float32)[:, None] * stride - padding
    ox = jnp.arange(Wo, dtype=jnp.float32)[:, None] * stride - padding
    ky = jnp.arange(K, dtype=jnp.float32).repeat(K) * dilation        # (K*K,) row-major k = i*K+j
    kx = jnp.tile(jnp.arange(K, dtype=jnp.float32) * dilation, K)
    base_y = (oy + ky[None, :])[None, :, None, None, :]               # (1,Ho,1,1,KK)
    base_x = (ox + kx[None, :])[None, None, :, None, :]               # (1,1,Wo,1,KK)

    py = base_y + off_y                                               # (B,Ho,Wo,G,KK)
    px = base_x + off_x

    # bilinear gather with zero padding, per-corner validity like the CUDA
    # kernel (samples with any coordinate outside (-1, size) are zero; each
    # corner is additionally bounds-checked).
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    ly = py - y0
    lx = px - x0
    iy0 = y0.astype(jnp.int32)
    ix0 = x0.astype(jnp.int32)

    xg = x.reshape(B, H * W, G, Cin // G)

    def corner(iy, ix, w):
        valid = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
        idx = jnp.where(valid, jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1), 0)
        # gather per (B, Ho*Wo*KK, G): index into xg's spatial axis
        idxf = idx.transpose(0, 3, 1, 2, 4).reshape(B, G, -1)          # (B,G,Ho*Wo*KK)
        g = jnp.take_along_axis(
            xg.transpose(0, 2, 1, 3),                                  # (B,G,HW,cg)
            idxf[..., None], axis=2)                                   # (B,G,Ho*Wo*KK,cg)
        g = g.reshape(B, G, Ho, Wo, K * K, Cin // G).transpose(0, 2, 3, 1, 4, 5)
        wmask = (w * valid.astype(w.dtype))[..., None]                 # (B,Ho,Wo,G,KK,1)
        return g * wmask.astype(g.dtype)

    val = (
        corner(iy0, ix0, (1 - ly) * (1 - lx))
        + corner(iy0, ix0 + 1, (1 - ly) * lx)
        + corner(iy0 + 1, ix0, ly * (1 - lx))
        + corner(iy0 + 1, ix0 + 1, ly * lx)
    )                                                                  # (B,Ho,Wo,G,KK,cg)

    val = val * mask.reshape(B, Ho, Wo, G, K * K, 1).astype(val.dtype)

    # contract the im2col tensor with the weights on the MXU.
    # weight (K,K,Cin,Cout) → (KK, G, cg, Cout); val (B,Ho,Wo,G,KK,cg).
    w = weight.reshape(K * K, G, Cin // G, weight.shape[-1])
    out = jnp.einsum("bhwgkc,kgco->bhwo", val, w, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)
