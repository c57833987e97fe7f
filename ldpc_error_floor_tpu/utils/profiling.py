"""Tracing / profiling helpers.

The reference has no profiling story beyond wall-clock phase timers written
to the performance log (SURVEY.md section 5, `main_Base.py:148,167`).  Here:

* `trace(dir)` — context manager around `jax.profiler.trace`; produces a
  TensorBoard/XProf trace of everything inside (kernel timings, HBM traffic,
  host gaps).  Enable on any run with LDPC_TPU_PROFILE_DIR=/path.
* `annotate(name)` — `jax.profiler.TraceAnnotation` wrapper so host-side
  phases (sampling loops, harvest drains) show up as named spans.
* `Timer` — the phase wall-clock timer the perf log uses, kept explicit.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(trace_dir: Optional[str] = None) -> Iterator[None]:
    """Profile the enclosed block to `trace_dir` (or $LDPC_TPU_PROFILE_DIR).

    No-op when neither is set, so call sites can wrap hot phases
    unconditionally."""
    trace_dir = trace_dir or os.environ.get("LDPC_TPU_PROFILE_DIR")
    if not trace_dir:
        yield
        return
    import jax
    with jax.profiler.trace(trace_dir):
        yield


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


class Timer:
    """Accumulating wall-clock phase timer (perf-log granularity)."""

    def __init__(self):
        self.seconds = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds += time.perf_counter() - self._t0
        self._t0 = None
        return False
