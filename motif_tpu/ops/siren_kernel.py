"""Fused SIREN MLP as a Pallas TPU kernel.

The SIREN coordinate decoders (STINF/SINF/synthesis, reference
models/modules/SIREN.py) are chains of tiny matmuls (hidden dims 64..256)
over ~1e5-1e6 HR tokens. Executed layer-by-layer under XLA, every hidden
activation round-trips HBM (hundreds of MB per call). This kernel keeps all
layer weights resident in VMEM and streams token tiles through the whole
MLP in one pass: per tile, traffic is just the input row + output row.

Forward runs as the Pallas kernel; the backward pass falls back to JAX
autodiff of the composed formulation via custom_vjp (training cost is
dominated elsewhere; inference is where the fusion pays).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 512


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _composed(x, weights, biases, omega0, sine_last):
    """Reference (unfused) formulation — used for init, backward and CPU."""
    n = len(weights)
    for i, (w, b) in enumerate(zip(weights, biases)):
        x = jnp.einsum("...i,io->...o", x, w) + b
        if i < n - 1 or sine_last:
            x = jnp.sin(omega0 * x)
    return x


def _kernel(x_ref, *refs, n_layers: int, omega0: float, sine_last: bool):
    out_ref = refs[-1]
    wb = refs[:-1]
    h = x_ref[:]
    for i in range(n_layers):
        w = wb[2 * i][:]
        b = wb[2 * i + 1][:]
        h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        if i < n_layers - 1 or sine_last:
            h = jnp.sin(omega0 * h)
    out_ref[:] = h


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def siren_fused(x, weights, biases, omega0: float = 30.0, sine_last: bool = False):
    """x: (..., Cin); weights: list of (Ci, Co); biases: list of (Co,).
    sin(omega0 * layer(x)) between layers; last layer linear unless
    sine_last. Semantics identical to the composed Siren module."""
    return _forward(x, tuple(weights), tuple(biases), omega0, sine_last)


def _forward(x, weights, biases, omega0, sine_last):
    if x.ndim != 2:
        lead = x.shape[:-1]
        return _forward(x.reshape(-1, x.shape[-1]), weights, biases, omega0,
                        sine_last).reshape(*lead, -1)

    n_tok, cin = x.shape
    cout = weights[-1].shape[-1]
    n_layers = len(weights)

    # pad the token axis to a tile multiple and the in/out feature axes to
    # lane multiples; weight matrices pad with zeros (no effect on results —
    # padded input columns multiply zero weight rows).
    cin_p = _round_up(cin, 128)
    cout_p = _round_up(cout, 128)
    tok_p = _round_up(max(n_tok, 8), TILE)

    xp = jnp.zeros((tok_p, cin_p), x.dtype).at[:n_tok, :cin].set(x)
    ws, bs = [], []
    for i, (w, b) in enumerate(zip(weights, biases)):
        ci = cin_p if i == 0 else w.shape[0]
        co = cout_p if i == n_layers - 1 else w.shape[1]
        wp = jnp.zeros((ci, co), w.dtype).at[: w.shape[0], : w.shape[1]].set(w)
        bp = jnp.zeros((1, co), b.dtype).at[0, : b.shape[0]].set(b)
        ws.append(wp)
        bs.append(bp)

    grid = (tok_p // TILE,)
    in_specs = [pl.BlockSpec((TILE, cin_p), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    operands = [xp]
    for w, b in zip(ws, bs):
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.extend([w, b])

    out = pl.pallas_call(
        functools.partial(_kernel, n_layers=n_layers, omega0=omega0,
                          sine_last=sine_last),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE, cout_p), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tok_p, cout_p), x.dtype),
    )(*operands)
    return out[:n_tok, :cout]


def _fwd(x, weights, biases, omega0, sine_last):
    return _forward(x, tuple(weights), tuple(biases), omega0, sine_last), \
        (x, tuple(weights), tuple(biases))


def _bwd(omega0, sine_last, res, g):
    x, weights, biases = res
    _, vjp = jax.vjp(lambda xx, ww, bb: _composed(xx, ww, bb, omega0, sine_last),
                     x, list(weights), list(biases))
    dx, dw, db = vjp(g)
    return dx, dw, db


siren_fused.defvjp(_fwd, _bwd)
