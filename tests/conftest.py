"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests run anywhere, and make the repo importable without installation.

Must set env vars before the first jax import.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_PATH = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_PATH)
