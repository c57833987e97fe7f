"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests run anywhere, and make the repo importable without installation.

Must set env vars before the first jax import.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell presets JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent XLA compilation cache: decoder scans are expensive to compile on
# the CPU test platform; cache across pytest runs.
import jax  # noqa: E402

# This image's sitecustomize pre-imports jax and registers the axon TPU
# backend before env vars can take effect; the config update below is the
# reliable way to pin tests to the 8-virtual-device CPU platform.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

REFERENCE_PATH = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_PATH)
