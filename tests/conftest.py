"""Test harness configuration.

All tests run on CPU with 8 virtual XLA devices so that every pjit/shard_map
sharding path is exercised without TPU hardware (SURVEY.md §4).  Pallas
kernels run in interpret mode on CPU via golfaction_tpu.ops.pallas dispatch.
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is not enough: the axon TPU plugin registers itself
# regardless, so explicitly pin the platform (this is what actually works).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache: on this 1-core box compiles dominate suite
# wall time (measured 6x speedup on repeat runs).  Safe to share across runs —
# keys include jaxlib version + topology.
jax.config.update("jax_compilation_cache_dir", "/tmp/golfaction_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
