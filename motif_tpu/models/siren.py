"""SIREN coordinate MLPs (reference models/modules/SIREN.py).

Init semantics reproduced exactly (SIREN.py:35-42,62-67):
 * first layer weight ~ U(-1/in, 1/in)
 * hidden layers     ~ U(-sqrt(6/in)/omega0, +sqrt(6/in)/omega0)
 * outermost linear   same uniform as hidden (when outermost_linear=True)
 * biases use torch nn.Linear defaults (U(-1/sqrt(in), 1/sqrt(in))) — the
   reference only overrides weights.

Forward: sin(omega0 * (W x + b)) per SineLayer; evaluated as token matmuls
(B, tokens, C) that map straight onto the MXU.

Module naming mirrors the torch tree for checkpoint porting: Sequential
index k becomes submodule "net_k"; SineLayers keep their inner "linear".
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from motif_tpu.models.layers import Linear


def _siren_first_init(key, shape, dtype=jnp.float32):
    fan_in = shape[0]
    return jax.random.uniform(key, shape, dtype, -1.0 / fan_in, 1.0 / fan_in)


def _siren_hidden_init(omega0: float):
    def init(key, shape, dtype=jnp.float32):
        bound = np.sqrt(6.0 / shape[0]) / omega0
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class SineLayer(nn.Module):
    """sin(omega0 * linear(x)) (SIREN.py:14-45)."""
    features: int
    is_first: bool = False
    omega_0: float = 30.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kinit = _siren_first_init if self.is_first else _siren_hidden_init(self.omega_0)
        x = Linear(self.features, kernel_init=kinit, name="linear")(x)
        return jnp.sin(self.omega_0 * x)


class Siren(nn.Module):
    """Siren MLP with per-layer hidden sizes (SIREN.py:49-79).

    hidden_layers counts the *intermediate* sine layers, exactly like the
    reference: layers = [first] + hidden_layers * [sine] + [out].

    fused=True evaluates the whole MLP as one Pallas kernel (weights
    resident in VMEM, tokens streamed in tiles — ops/siren_kernel.py);
    requires first_omega_0 == hidden_omega_0 (true for every reference
    instantiation). Falls back to the composed path during init.
    """
    hidden_features: Sequence[int]
    hidden_layers: int
    out_features: int
    outermost_linear: bool = True
    first_omega_0: float = 30.0
    hidden_omega_0: float = 30.0
    fused: bool = False
    # skip_first_linear=True means the caller already applied net_0's linear
    # (W x + b) — e.g. MoTIF's fused LIIF decode folds it through the
    # nearest-upsample / the splat — so net_0 reduces to sin(omega0 * x).
    # net_0's params still exist (created at init, where this flag is
    # ignored) and the caller reads them from the variable tree; apply-time
    # gradients flow through that read.
    skip_first_linear: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.skip_first_linear and not self.is_initializing():
            x = jnp.sin(self.first_omega_0 * x)
            for i in range(self.hidden_layers):
                x = SineLayer(self.hidden_features[i + 1],
                              omega_0=self.hidden_omega_0, name=f"net_{i + 1}")(x)
            last = self.hidden_layers + 1
            if self.outermost_linear:
                return Linear(self.out_features,
                              kernel_init=_siren_hidden_init(self.hidden_omega_0),
                              name=f"net_{last}")(x)
            return SineLayer(self.out_features, omega_0=self.hidden_omega_0,
                             name=f"net_{last}")(x)

        if self.fused and not self.is_initializing():
            from motif_tpu.ops.siren_kernel import siren_fused

            assert self.first_omega_0 == self.hidden_omega_0
            p = self.variables["params"]
            n = self.hidden_layers + 2
            weights, biases = [], []
            for i in range(n):
                node = p[f"net_{i}"]
                leaf = node["linear"] if "linear" in node else node
                weights.append(leaf["kernel"])
                biases.append(leaf["bias"])
            return siren_fused(x, weights, biases, self.hidden_omega_0,
                               sine_last=not self.outermost_linear)

        x = SineLayer(self.hidden_features[0], is_first=True,
                      omega_0=self.first_omega_0, name="net_0")(x)
        for i in range(self.hidden_layers):
            x = SineLayer(self.hidden_features[i + 1],
                          omega_0=self.hidden_omega_0, name=f"net_{i + 1}")(x)
        last = self.hidden_layers + 1
        if self.outermost_linear:
            x = Linear(self.out_features,
                       kernel_init=_siren_hidden_init(self.hidden_omega_0),
                       name=f"net_{last}")(x)
        else:
            x = SineLayer(self.out_features, omega_0=self.hidden_omega_0,
                          name=f"net_{last}")(x)
        return x
