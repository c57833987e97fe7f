"""Profiling helpers."""

import os

import jax.numpy as jnp

from ldpc_error_floor_tpu.utils import Timer, annotate, trace


def test_trace_noop_without_dir(monkeypatch):
    monkeypatch.delenv("LDPC_TPU_PROFILE_DIR", raising=False)
    with trace():
        x = jnp.ones((4,)) + 1
    assert float(x.sum()) == 8.0


def test_trace_writes_profile(tmp_path, monkeypatch):
    d = str(tmp_path / "prof")
    with trace(d):
        with annotate("phase"):
            jnp.ones((8, 8)).sum().block_until_ready()
    assert os.path.isdir(d) and os.listdir(d)


def test_timer_accumulates():
    t = Timer()
    with t:
        pass
    with t:
        pass
    assert t.seconds >= 0.0
