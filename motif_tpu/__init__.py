"""motif_tpu — a TPU-native C-STVSR framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of MoTIF
(sichun233746/MoTIF, ICCV 2023): continuous space-time video
super-resolution with reliability-aware softmax splatting, local implicit
neural functions and RAFT optical flow — designed TPU-first:

* NHWC layouts and static shapes everywhere so XLA tiles convs/matmuls
  onto the MXU,
* custom scatter/gather formulations (and Pallas kernels) replacing the
  reference's CuPy/CUDA kernels (softsplat trio, DCNv2, correlation),
* `jax.sharding.Mesh` + `shard_map` data parallelism replacing
  torch.distributed/NCCL,
* orbax checkpointing replacing torch .pth state dicts (with a porting
  bridge for reference checkpoints).

Layer map (mirrors reference SURVEY.md §1):
  ops/       L0/L1: kernels + op modules
  models/    L2/L3: flow estimators + network architectures
  parallel/  mesh + sharded train/eval steps
  data/      L5: dataset catalogs + host pipeline
  utils/     L7: config, metrics, logging
"""

__version__ = "0.1.0"
