"""Test config: force the CPU backend with 8 virtual devices so sharding
tests exercise a real multi-device mesh without TPU hardware.

Note: the hosted 'axon' TPU plugin ignores the JAX_PLATFORMS env var, so we
must force the platform through jax.config before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
