"""Fused Pallas SIREN kernel vs the composed module (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from motif_tpu.models.siren import Siren
from motif_tpu.ops import siren_kernel


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    """Run pallas_call in interpreter mode on the CPU test platform."""
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(siren_kernel.pl, "pallas_call", patched)


def test_fused_matches_composed(rng):
    x = rng.standard_normal((700, 67)).astype(np.float32)  # non-tile-multiple
    m = Siren([64, 64, 256], 2, 3)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x[:4]))["params"]
    want = m.apply({"params": params}, jnp.asarray(x))

    mf = Siren([64, 64, 256], 2, 3, fused=True)
    got = mf.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-4)


def test_fused_leading_dims_and_grads(rng):
    x = rng.standard_normal((2, 130, 66)).astype(np.float32)
    m = Siren([64, 64, 256], 2, 64)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x[:1, :4]))["params"]
    mf = Siren([64, 64, 256], 2, 64, fused=True)

    got = mf.apply({"params": params}, jnp.asarray(x))
    want = m.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-4)

    # gradients flow through the custom_vjp fallback
    def loss(p):
        return jnp.sum(mf.apply({"params": p}, jnp.asarray(x)) ** 2)

    g = jax.grad(loss)(params)
    gref = jax.grad(lambda p: jnp.sum(m.apply({"params": p}, jnp.asarray(x)) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g), jax.tree_util.tree_leaves(gref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3)
