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
