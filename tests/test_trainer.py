"""Trainer + parallel tests: sharded train step on the 8-virtual-device CPU
mesh (the multi-chip dry run), schedule parity vs the reference scheduler."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from motif_tpu import schedules


def test_cosine_restart_matches_reference_scheduler():
    """Compare against torch CosineAnnealingLR_Restart imported from the
    reference (pure torch, CPU)."""
    import sys
    import torch

    sys.path.insert(0, "/root/reference")
    try:
        from models.lr_scheduler import CosineAnnealingLR_Restart  # type: ignore
    finally:
        sys.path.remove("/root/reference")

    base_lr = 2e-4
    T_period = [100, 100, 100, 100]
    restarts = [100, 200, 300]
    weights = [1, 0.5, 0.5]
    opt = torch.optim.Adam([torch.zeros(3)], lr=base_lr)
    ref = CosineAnnealingLR_Restart(opt, T_period, eta_min=1e-7,
                                    restarts=restarts, weights=weights)
    sched = schedules.cosine_annealing_restart(base_lr, T_period, restarts,
                                               weights, eta_min=1e-7)
    got, want = [], []
    for step in range(400):
        want.append(opt.param_groups[0]["lr"])
        got.append(float(sched(step)))
        opt.step()
        ref.step()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-9)


@pytest.mark.slow
def test_multichip_dryrun():
    """The driver's dryrun_multichip contract on 8 virtual CPU devices."""
    import __graft_entry__ as g

    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    g.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-1] == 3
    assert bool(jnp.isfinite(out).all())
