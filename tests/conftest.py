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

# persistent compile cache: the suite re-traces the same tiny models often
import os as _os
_cache = _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), ".jax_cache")
_os.makedirs(_cache, exist_ok=True)
try:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass
