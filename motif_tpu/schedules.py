"""Learning-rate schedules (reference models/lr_scheduler.py) as optax-style
step → lr functions."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def cosine_annealing_restart(base_lr: float, t_period, restarts=None,
                             restart_weights=None, eta_min: float = 1e-7):
    """CosineAnnealingLR_Restart (lr_scheduler.py:35-66) in closed form:
    lr(t) = eta_min + (base*w_seg - eta_min) * (1 + cos(pi*(t - t0)/T)) / 2
    with segment boundaries at `restarts` and per-segment periods/weights.

    test.yml uses T_period [150k]*4, restarts [150k, 300k, 450k], weights 1.
    """
    restarts = list(restarts or [])
    restart_weights = list(restart_weights or [1] * len(restarts))
    assert len(restarts) == len(restart_weights)
    bounds = np.array([0] + restarts, dtype=np.float64)
    weights = np.array([1.0] + restart_weights, dtype=np.float64)
    periods = np.array(list(t_period), dtype=np.float64)
    assert len(periods) >= len(bounds), "need a T_period per segment"

    def schedule(step):
        t = jnp.asarray(step, jnp.float32)
        seg = jnp.sum(t >= jnp.asarray(bounds[1:], jnp.float32).reshape(-1, 1), axis=0).reshape(())
        t0 = jnp.asarray(bounds, jnp.float32)[seg]
        T = jnp.asarray(periods[: len(bounds)], jnp.float32)[seg]
        w = jnp.asarray(weights, jnp.float32)[seg]
        cosv = jnp.cos(jnp.pi * (t - t0) / T)
        return eta_min + (base_lr * w - eta_min) * (1 + cosv) / 2.0

    return schedule


def multistep_restart(base_lr: float, milestones, gamma: float = 0.1,
                      restarts=None, restart_weights=None):
    """MultiStepLR_Restart (lr_scheduler.py:8-32)."""
    restarts = list(restarts or [0])
    restart_weights = list(restart_weights or [1])
    milestones = sorted(milestones)

    def schedule(step):
        t = jnp.asarray(step, jnp.float32)
        # weight of the last restart at or before t (default 1)
        w = jnp.asarray(1.0, jnp.float32)
        for r, rw in zip(restarts, restart_weights):
            w = jnp.where(t >= r, jnp.asarray(float(rw), jnp.float32), w)
        # decay: gamma^(number of milestones passed since last restart)
        last_r = jnp.asarray(0.0, jnp.float32)
        for r in restarts:
            last_r = jnp.where(t >= r, jnp.asarray(float(r), jnp.float32), last_r)
        n = jnp.asarray(0.0, jnp.float32)
        for m in milestones:
            n = n + jnp.where((t >= m) & (m > last_r), 1.0, 0.0)
        return base_lr * w * gamma ** n

    return schedule
