"""Persistent XLA compilation cache.

TPU compiles of deep decode scans take tens of seconds (and are highly
variable under the remote-compile tunnel); caching them across processes
makes CLI/bench/driver restarts cheap."""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    if path is None:
        path = os.environ.get(
            "LDPC_TPU_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "ldpc_tpu_jax"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
