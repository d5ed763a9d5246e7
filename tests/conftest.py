"""Test configuration: force an 8-device virtual CPU platform so that
multi-chip sharding paths are exercised without TPU hardware, and so parity
tests run at full f32 matmul precision.

Note: the environment pre-imports jax (axon site hook), so setting env vars
is not enough — jax.config must be updated before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("TOKENIZERS_PARALLELISM", "false")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
