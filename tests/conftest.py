"""Test configuration: force an 8-virtual-device CPU platform.

All tests run on CPU with 8 virtual devices so multi-chip sharding
(mesh/all_to_all/shard_map paths) is exercised without TPU hardware, per the
distributed test strategy (SURVEY.md section 4, point 4).  Must be set before
jax initializes.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The env var alone is not honored when the axon TPU plugin is present; the
# explicit config update is (verified: devices() -> 8 CpuDevice).
jax.config.update("jax_platforms", "cpu")
