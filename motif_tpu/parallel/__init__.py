"""Parallelism: device meshes, sharded train/eval steps.

Replaces the reference's torch.distributed DDP + NCCL stack
(train.py:23-31, VideoSR_base_model.py:33-36, data/data_sampler.py) with a
single-controller jax.sharding data-parallel mesh: the batch axis is
sharded over 'data', parameters are replicated, and XLA inserts the
gradient all-reduce over ICI automatically.
"""

from motif_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    replicate,
    host_shard_indices,
    epoch_permutation,
)
