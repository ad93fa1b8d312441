"""Device mesh helpers (TPU-native replacement for DDP/NCCL process groups).

The reference shards work via torch.distributed with env-var rendezvous and
a DistIterSampler (data/data_sampler.py:30-65). Here a jax.sharding.Mesh
over the 'data' axis plays that role: batches are sharded on their leading
axis, params replicated; collectives ride ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def shard_batch(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding for array pytrees with a leading (global) batch axis."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def host_shard_indices(n_items: int, process_index: int | None = None,
                       process_count: int | None = None) -> np.ndarray:
    """Per-host strided sharding of a dataset index list — the multihost
    equivalent of DistIterSampler's rank striding (data_sampler.py:53-60)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return np.arange(pi, n_items, pc)


def epoch_permutation(n_items: int, epoch: int, ratio: int = 1) -> np.ndarray:
    """Epoch-seeded permutation over a ratio-enlarged dataset
    (DistIterSampler, data_sampler.py:38-52)."""
    g = np.random.default_rng(epoch)
    total = n_items * ratio
    return g.permutation(total) % n_items
