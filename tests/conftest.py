"""Test harness: force CPU with a virtual 8-device mesh (SURVEY.md §4d).

The axon TPU plugin pins JAX_PLATFORMS=axon at the env level, so the platform
must be overridden via jax.config before first backend use.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
