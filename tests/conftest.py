"""Test configuration: force an 8-virtual-device CPU platform so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4).

Note: the environment's sitecustomize imports jax at interpreter start with
JAX_PLATFORMS=axon, so env vars are too late — use jax.config.update.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the heavy tests are dominated by XLA compiles of
# the full MoTIF graph; re-runs with unchanged graphs hit the cache.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
