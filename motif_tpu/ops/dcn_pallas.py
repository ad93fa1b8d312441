"""Pallas TPU kernel for the DCN bilinear sampling stage.

The XLA one-hot formulation (ops/dcn.py::_sample_onehot) is numerically
exact but materializes its (B, G, Q, H, cg) stage-1 intermediate in HBM —
~1 GB per PCD-size call, making each DCN ~2 ms on v5e. This kernel runs
the same two one-hot contractions per query tile with the intermediate
held in VMEM. Per query tile, for each deformable group g:

    vx[q, w]          = hat(px[q] - w)                    (VPU)
    t1[q, h*cg+c]     = vx @ X[g]  (X pre-laid (W, H*cg)) (MXU)
    vy_exp[q, h*cg+c] = hat(py[q] - h)                    (VPU, iota//cg)
    out[q, g*cg+c]    = (t1 * vy_exp) @ M                 (MXU, M block-select)

with M[j, c] = 1 iff j % cg == c (the strided channel-sum as a matmul, so
every stage keeps a lane-friendly layout). The group loop lives INSIDE the
kernel: one program per query tile, X for all groups resident in VMEM
(grid (B, qt) — program-boundary overhead dominated a (B, G, qt) grid).

Semantics identical to _sample_onehot (hat weights zero outside [-1, size]
— the CUDA kernel's bounds behavior, dcn_v2_im2col_cuda.cu:25-60). Exposed
through dcn_v2(backend="pallas"): forward = this kernel, backward = the
analytic einsum VJP shared with the one-hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 512  # query tile


def _kernel(px_ref, py_ref, x_ref, out_ref, *, mxu_dtype):
    G = x_ref.shape[1]
    W = x_ref.shape[2]
    HC = x_ref.shape[3]
    cg = out_ref.shape[-1] // G

    ji = jax.lax.broadcasted_iota(jnp.int32, (TQ, HC), 1)
    hj = (ji // cg).astype(jnp.float32)
    wi = jax.lax.broadcasted_iota(jnp.int32, (TQ, W), 1).astype(jnp.float32)
    ci = jax.lax.broadcasted_iota(jnp.int32, (HC, cg), 0)
    co = jax.lax.broadcasted_iota(jnp.int32, (HC, cg), 1)
    m = (ci % cg == co).astype(mxu_dtype)                   # (H*cg, cg)

    for g in range(G):
        px = px_ref[0, g, 0]                                # (TQ, 1)
        py = py_ref[0, g, 0]
        # bilinear hats decompose exactly in bf16+bf16: vx = hi + lo with
        # hi = bf16(vx) — but a single bf16 pass (mxu_dtype=bf16) already
        # matches XLA's DEFAULT f32 matmul semantics, which is what the
        # whole model runs under; accumulation stays fp32.
        vx = jnp.maximum(0.0, 1.0 - jnp.abs(px - wi))       # (TQ, W)
        t1 = jnp.dot(vx.astype(mxu_dtype), x_ref[0, g].astype(mxu_dtype),
                     preferred_element_type=jnp.float32)    # (TQ, H*cg)
        vy = jnp.maximum(0.0, 1.0 - jnp.abs(py - hj))       # (TQ, H*cg)
        prod = (t1 * vy).astype(mxu_dtype)
        out_ref[0, 0, :, g * cg:(g + 1) * cg] = jnp.dot(
            prod, m, preferred_element_type=jnp.float32).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "exact"))
def sample_pallas(x: jax.Array, py: jax.Array, px: jax.Array,
                  interpret: bool = False, exact: bool = False) -> jax.Array:
    """Bilinear one-hot sampling. x (B,H,W,G*cg); py/px (B,G,Q) →
    val (B,Q,G,cg) — same contract as ops/dcn.py::_sample_onehot."""
    B, H, W, Cin = x.shape
    G, Q = py.shape[1], py.shape[2]
    cg = Cin // G

    Qp = -(-Q // TQ) * TQ
    if Qp != Q:
        # hat() of -10 is zero everywhere → padded queries contribute 0
        pad = ((0, 0), (0, 0), (0, Qp - Q))
        py = jnp.pad(py, pad, constant_values=-10.0)
        px = jnp.pad(px, pad, constant_values=-10.0)
    qt = Qp // TQ

    # X → (B, G, W, H*cg); queries → (B, G, qt, TQ, 1) so each tile reads a
    # (TQ, 1) sublane-major block (no in-kernel relayout).
    xp = x.reshape(B, H, W, G, cg).transpose(0, 3, 2, 1, 4).reshape(B, G, W, H * cg)
    pyr = py.reshape(B, G, qt, TQ, 1).astype(jnp.float32)
    pxr = px.reshape(B, G, qt, TQ, 1).astype(jnp.float32)

    # exact=True keeps the MXU passes in the input dtype (for parity
    # tests); the default mirrors XLA's DEFAULT f32 precision (bf16 MXU
    # passes, fp32 accumulation) at ~3x the fp32-pass throughput.
    mxu_dtype = x.dtype if exact or x.dtype == jnp.bfloat16 else jnp.bfloat16

    out = pl.pallas_call(
        functools.partial(_kernel, mxu_dtype=mxu_dtype),
        grid=(B, qt),
        in_specs=[
            pl.BlockSpec((1, G, 1, TQ, 1), lambda b, q: (b, 0, q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, 1, TQ, 1), lambda b, q: (b, 0, q, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, W, H * cg), lambda b, q: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TQ, G * cg), lambda b, q: (b, q, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, qt, TQ, G * cg), x.dtype),
        interpret=interpret,
    )(pxr, pyr, xp)

    return out.reshape(B, Qp, G, cg)[:, :Q]                 # (B, Q, G, cg)


# ---------------------------------------------------------------------------
# Row-windowed sampler ("ywin"): the serving-path encoder lever.
#
# The kernel above still contracts every query tile against the FULL
# (W, H*cg) feature slab — one-hot exactness paid in H/Hw extra MXU work.
# DCN offsets on trained models are small (a few pixels), so the bilinear
# corners of all queries of one OUTPUT ROW live in a narrow y-window of the
# input. This kernel runs one output row per program, dynamically slices
# that window out of the VMEM-resident X (sublane slice — X is laid out
# (H, W*cg) per group so H is the sublane axis), and contracts vy-first:
#
#     Xw            = X[y0 : y0+Hw]                 (Hw, W*cg)   VMEM slice
#     t[q, w*cg+c]  = vy_win @ Xw                   (MXU, K-dim Hw << H)
#     vx_exp        = hat(px - lane//cg)            (VPU)
#     out[q, g*cg+c]= (t * vx_exp) @ M              (MXU, block-select)
#
# FLOPs drop by ~H/Hw on the dominant matmul (3.2x at PCD-L1 sizes). The
# window bound is enforced OUTSIDE by dcn.py's violation check + lax.cond
# exact fallback (the splat kernel's guard pattern, softsplat_pallas.py):
# results are exact for in-window offsets and the fallback keeps the op
# exact for arbitrary ones. Matches the CUDA sampling semantics
# (dcn_v2_im2col_cuda.cu:25-60) when no violation occurs.
# ---------------------------------------------------------------------------


_YWIN_QC = 512  # in-kernel query chunk: bounds the (W*cg, QC) fp32 temporaries

# All tensors in this kernel are TRANSPOSED relative to the v1 kernel above:
# queries ride the LANE axis (a (TQ, 1) layout pads lanes 1→128 and blew the
# 16 MB scoped-VMEM budget through the double-buffered pipeline), and every
# contraction is the dim0×dim0 (lhs-transposed) form the MXU executes
# natively, so no in-kernel relayouts are needed:
#     vyT[h, q]  = hat(py_row - hcol)                 (VPU broadcast)
#     tT[j, q]   = sum_h xw[h, j] vyT[h, q]           (MXU)
#     vxT[j, q]  = hat(px_row - wcol)                 (VPU)
#     outT[c, q] = sum_j m[j, c] (tT * vxT)[j, q]     (MXU block-select)


def _ywin_kernel(q_ref, x_ref, out_ref, *, mxu_dtype, Hw, pad, D):
    G = x_ref.shape[1]
    H = x_ref.shape[2]
    WC = x_ref.shape[3]
    GC = out_ref.shape[2]
    TQ_r = out_ref.shape[3]
    cg = GC // G
    QC = min(_YWIN_QC, TQ_r)
    dn = (((0,), (0,)), ((), ()))                           # lhsT @ rhs

    r = pl.program_id(1)
    # Mosaic needs the dynamic sublane-slice start provably 8-aligned:
    # round the window start DOWN to a sublane boundary (Hw already carries
    # the +8 slack, see ywin_window — the aligned window is a superset of
    # the logical one the violation guard checks).
    y0 = (jnp.clip(r - pad - D, 0, H - Hw) // 8) * 8

    wcol = (jax.lax.broadcasted_iota(jnp.int32, (WC, 1), 0)
            // cg).astype(jnp.float32)                      # sublane -> col
    hcol = jax.lax.broadcasted_iota(jnp.int32, (Hw, 1), 0).astype(
        jnp.float32) + y0.astype(jnp.float32)
    ci = jax.lax.broadcasted_iota(jnp.int32, (WC, cg), 0)
    co = jax.lax.broadcasted_iota(jnp.int32, (WC, cg), 1)
    m = (ci % cg == co).astype(mxu_dtype)                   # (W*cg, cg)

    for g in range(G):
        xw = (x_ref[0, g] if Hw == H else
              x_ref[0, g, pl.ds(y0, Hw), :]).astype(mxu_dtype)  # (Hw, W*cg)
        for q0 in range(0, TQ_r, QC):
            qc = min(QC, TQ_r - q0)
            py = q_ref[0, g, 0, 0:1, q0:q0 + qc]            # (1, qc)
            px = q_ref[0, g, 0, 1:2, q0:q0 + qc]
            vyT = jnp.maximum(0.0, 1.0 - jnp.abs(py - hcol))  # (Hw, qc)
            tT = jax.lax.dot_general(
                xw, vyT.astype(mxu_dtype), dn,
                preferred_element_type=jnp.float32)         # (W*cg, qc)
            vxT = jnp.maximum(0.0, 1.0 - jnp.abs(px - wcol))  # (W*cg, qc)
            prodT = (tT * vxT).astype(mxu_dtype)
            out_ref[0, 0, g * cg:(g + 1) * cg, q0:q0 + qc] = \
                jax.lax.dot_general(
                    m, prodT, dn,
                    preferred_element_type=jnp.float32).astype(out_ref.dtype)


def ywin_window(H: int, K: int, dilation: int, max_dy: int) -> int:
    """Static window height covering all bilinear corner rows of one output
    row when every |offset_y| <= max_dy (window start clamps to the image,
    so boundary rows reuse the interior window). Rounded up to a sublane
    multiple plus one sublane of slack so the kernel can align its dynamic
    slice start down to an 8-row boundary and still cover the logical
    window (Mosaic requires provably 8-aligned sublane starts)."""
    logical = (K - 1) * dilation + 2 * max_dy + 2
    return min(H, (-(-logical // 8) + 1) * 8)


@functools.partial(jax.jit, static_argnames=(
    "row_len", "pad", "dilation", "K", "max_dy", "interpret"))
def sample_pallas_ywin(x: jax.Array, py: jax.Array, px: jax.Array, *,
                       row_len: int, pad: int, dilation: int, K: int,
                       max_dy: int = 8, interpret: bool = False) -> jax.Array:
    """Row-windowed bilinear one-hot sampling. x (B,H,W,G*cg); py/px
    (B,G,Q) row-major with Q = Ho*row_len (row_len = Wo*K*K) → (B,Q,G,cg).
    ONLY exact when every sample's in-image corner rows fall inside the
    per-row window — callers must guard with `ywin_violation`."""
    B, H, W, Cin = x.shape
    G, Q = py.shape[1], py.shape[2]
    cg = Cin // G
    Ho = Q // row_len
    assert Ho * row_len == Q, (Q, row_len)
    Hw = ywin_window(H, K, dilation, max_dy)

    TQ_r = -(-row_len // 128) * 128
    # queries packed (py, px) along one sublane axis, lane-major over TQ —
    # a (TQ, 1) layout would pad lanes 1→128 (4 MB/pipeline buffer, the
    # scoped-VMEM blowup this kernel's transposed form exists to avoid).
    q = jnp.stack([py.reshape(B, G, Ho, row_len),
                   px.reshape(B, G, Ho, row_len)], axis=-2)
    if TQ_r != row_len:
        q = jnp.pad(q, ((0, 0),) * 4 + ((0, TQ_r - row_len),),
                    constant_values=-10.0)
    q = q.reshape(B, G, Ho, 2, TQ_r).astype(jnp.float32)

    # X → (B, G, H, W*cg): window slice rides the sublane axis.
    xp = x.reshape(B, H, W, G, cg).transpose(0, 3, 1, 2, 4).reshape(
        B, G, H, W * cg)

    mxu_dtype = jnp.bfloat16 if x.dtype != jnp.float64 else x.dtype

    out = pl.pallas_call(
        functools.partial(_ywin_kernel, mxu_dtype=mxu_dtype, Hw=Hw,
                          pad=pad, D=max_dy),
        grid=(B, Ho),
        in_specs=[
            pl.BlockSpec((1, G, 1, 2, TQ_r), lambda b, r: (b, 0, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, H, W * cg), lambda b, r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, G * cg, TQ_r), lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ho, G * cg, TQ_r), x.dtype),
        interpret=interpret,
    )(q, xp)

    # (B, Ho, G*cg, TQ_r) → crop the row padding → (B, Q, G, cg)
    return out[..., :row_len].transpose(0, 1, 3, 2).reshape(B, Q, G, cg)
