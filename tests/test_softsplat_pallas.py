"""Oracle tests for the Pallas ring-sweep splat kernel (interpret mode on
CPU) against the XLA base-scatter backend, which is itself oracle-tested
against the CUDA kernel semantics (tests/test_softsplat.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motif_tpu.ops.softsplat import _splat_fused_base, splat_fused
from motif_tpu.ops.softsplat_pallas import (_splat_pallas_fast,
                                            splat_fused_pallas,
                                            splat_violation)


def _mk(B=2, H=16, W=20, C=5, seed=0, flow_scale=3.0, dy_bias=0.0):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    flow = jnp.asarray(rng.standard_normal((B, H, W, 2)) * flow_scale,
                       jnp.float32)
    flow = flow.at[..., 1].add(dy_bias)
    z = jnp.asarray(rng.standard_normal((B, H, W, 1)) * 0.3, jnp.float32)
    return img, flow, z


def _oracle(img, flow, z):
    ez = jnp.exp(z)
    return _splat_fused_base(img, flow, z, ez)


@pytest.mark.parametrize("seed,flow_scale", [(0, 3.0), (1, 0.0), (2, 8.0)])
def test_pallas_splat_matches_base(seed, flow_scale):
    # max_dy=18 >= H+2: any in-grid vertical target is within the ring, so
    # the fast path alone is exact for arbitrary flows at H=16
    img, flow, z = _mk(seed=seed, flow_scale=flow_scale)
    assert not bool(splat_violation(flow, 18))
    out_o, norm_o, cnt_o = _oracle(img, flow, z)
    out_p, norm_p, cnt_p = _splat_pallas_fast(
        img, flow, jnp.exp(z), max_dy=18, compute_dtype=None, interpret=True)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_o),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(norm_p), np.asarray(norm_o),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(cnt_p), np.asarray(cnt_o))


def test_pallas_splat_exact_integer_and_oob():
    """Exact-integer landings (wx1 == 0) still count both corners; pixels
    pushed into the one-cell border land in padded cells and are dropped;
    pixels pushed far off-grid are dropped entirely."""
    B, H, W, C = 1, 8, 12, 3
    img = jnp.ones((B, H, W, C), jnp.float32)
    z = jnp.zeros((B, H, W, 1), jnp.float32)
    flow = jnp.zeros((B, H, W, 2), jnp.float32)
    # integer flow +2 in x; first row pushed above the grid entirely
    flow = flow.at[..., 0].set(2.0)
    flow = flow.at[:, 0, :, 1].set(-30.0)
    out_o, norm_o, cnt_o = _oracle(img, flow, z)
    out_p, norm_p, cnt_p = _splat_pallas_fast(
        img, flow, jnp.exp(z), max_dy=4, compute_dtype=None, interpret=True)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_o),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(cnt_p), np.asarray(cnt_o))


def test_pallas_splat_violation_fallback():
    """Vertical reach beyond max_dy must flip to the exact XLA path via
    lax.cond — results identical to the base backend either way."""
    img, flow, z = _mk(seed=3, flow_scale=2.0)
    flow_big = flow.at[:, 4, 3, 1].set(11.5)    # one pixel reaches +11 rows
    assert bool(splat_violation(flow_big, 8))
    assert not bool(splat_violation(flow, 8))
    out_o, norm_o, cnt_o = _oracle(img, flow_big, z)
    out_p, norm_p, cnt_p = splat_fused_pallas(img, flow_big, z, max_dy=8,
                                              interpret=True)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_o),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(cnt_p), np.asarray(cnt_o))


def test_pallas_splat_serving_shape():
    """A serving-shaped slice (rows multiple of 8, W not a lane multiple)."""
    img, flow, z = _mk(B=1, H=32, W=56, C=6, seed=4, flow_scale=5.0)
    out_o, norm_o, cnt_o = _oracle(img, flow, z)
    out_p, norm_p, cnt_p = splat_fused_pallas(img, flow, z, max_dy=16,
                                              interpret=True)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_o),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(norm_p), np.asarray(norm_o),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(cnt_p), np.asarray(cnt_o))


def test_pallas_splat_via_splat_fused_api():
    """splat_fused(method='pallas') returns the 4-tuple with the z<=0
    max-splat shortcut (z_max == 1)."""
    img, flow, z = _mk(B=1, H=16, W=24, C=4, seed=5, flow_scale=2.0)
    z = -jnp.abs(z)
    o, n, zm, c = splat_fused(img, flow, z, z_nonpositive=jnp.asarray(True),
                              method="pallas", pallas_interpret=True)
    oo, no, zmo, co = splat_fused(img, flow, z,
                                  z_nonpositive=jnp.asarray(True),
                                  method="base")
    np.testing.assert_allclose(np.asarray(o), np.asarray(oo),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(zm), np.asarray(zmo))
    np.testing.assert_array_equal(np.asarray(c), np.asarray(co))
