"""Subprocess worker for the multi-host (jax.distributed) tests.

Each worker is one "host" of a simulated 2-host pod: 4 virtual CPU devices
per process, jax.distributed over a localhost coordinator (passed through to
the product CLIs via their --coordinator_address/--num_processes/--process_id
flags). Mirrors tests/conftest.py's platform forcing: the axon plugin pins
JAX_PLATFORMS at the env level, so CPU must be selected via jax.config after
import. Underscore-named so pytest does not collect it.

Usage: python tests/_distributed_worker.py {finetune|typicality} <cli args...>
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass


def main():
    mode, rest = sys.argv[1], sys.argv[2:]
    if mode == "finetune":
        from diffmining_tpu.finetuning.ftt import main as cli
    elif mode == "typicality":
        from diffmining_tpu.typicality.compute import main as cli
    else:
        raise SystemExit(f"unknown worker mode {mode!r}")
    cli(rest)
    print("WORKER_OK", flush=True)


if __name__ == "__main__":
    main()
