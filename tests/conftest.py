"""Test config: force JAX onto a virtual 8-device CPU platform so sharding
tests run without TPU hardware (the driver dry-runs multi-chip the same way).

Note: the axon TPU plugin ignores JAX_PLATFORMS, so we also set
JAX_PLATFORM_NAME and update jax.config before any test imports jax.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
