"""Native (C++) host-runtime components, loaded via ctypes.

The TPU compute path is JAX/Pallas; these are the host-side hot paths —
currently the uncor-dataset text codec (see uncor_codec.cpp).  The shared
library is built lazily with g++ on first use and cached next to the
source; everything degrades gracefully to the NumPy implementations when a
toolchain is unavailable or ``LDPC_TPU_NO_NATIVE=1`` is set.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "uncor_codec.cpp")
_LIB_PATH = os.path.join(_DIR, "_uncor_codec.so")

_lock = threading.Lock()
_lib = None  # None = not tried; False = unavailable; else CDLL


def _cache_lib_path() -> str:
    """Per-user cache location, so the native fast path also works for
    read-only site-packages installs (the package dir is tried first)."""
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    return os.path.join(base, "ldpc_error_floor_tpu", "_uncor_codec.so")


def _build() -> str:
    last_err: Exception = RuntimeError("no build target")
    for target in (_LIB_PATH, _cache_lib_path()):
        try:
            os.makedirs(os.path.dirname(target), exist_ok=True)
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                   "-o", target + ".tmp", _SRC]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(target + ".tmp", target)
            return target
        except (OSError, subprocess.SubprocessError) as e:
            last_err = e
    raise last_err


def get_lib() -> Optional[ctypes.CDLL]:
    """The codec library, building it if needed; None if unavailable."""
    global _lib
    if _lib is False:
        return None
    if _lib is not None:
        return _lib
    with _lock:
        if _lib not in (None,):
            return _lib or None
        if os.environ.get("LDPC_TPU_NO_NATIVE"):
            _lib = False
            return None
        try:
            path = None
            for cand in (_LIB_PATH, _cache_lib_path()):
                if (os.path.exists(cand) and
                        os.path.getmtime(cand) >= os.path.getmtime(_SRC)):
                    path = cand
                    break
            if path is None:
                path = _build()
            lib = ctypes.CDLL(path)
            lib.uncor_count.restype = ctypes.c_long
            lib.uncor_count.argtypes = [ctypes.c_char_p,
                                        ctypes.POINTER(ctypes.c_long)]
            lib.uncor_parse.restype = ctypes.c_long
            lib.uncor_parse.argtypes = [
                ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
                ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_float]
            lib.uncor_write.restype = ctypes.c_int
            lib.uncor_write.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_float,
                ctypes.c_int]
            _lib = lib
        except Exception:
            _lib = False
            return None
    return _lib or None


def parse_table(path: str, skip_cols: int, scale: float) -> Optional[np.ndarray]:
    """Parse a tab-separated float table, dropping `skip_cols` leading
    columns and scaling values; returns [rows, cols] float32 or None if the
    native path is unavailable / the file needs the NumPy fallback."""
    lib = get_lib()
    if lib is None:
        return None
    cols = ctypes.c_long(0)
    rows = lib.uncor_count(path.encode(), ctypes.byref(cols))
    if rows < 0 or cols.value <= skip_cols:
        return None
    keep = cols.value - skip_cols
    out = np.empty((rows, keep), np.float32)
    got = lib.uncor_parse(path.encode(), skip_cols, cols.value,
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                          rows, ctypes.c_float(scale))
    if got != rows:
        return None  # malformed / raced; let the caller fall back
    return out


def write_table(path: str, data: np.ndarray, meta_cols: int, scale: float,
                append: bool) -> bool:
    """Write rows of (`meta_cols` zero columns + scaled values) in the
    reference's '%.1f' tab-separated format.  Returns False if the native
    path is unavailable (caller falls back)."""
    lib = get_lib()
    if lib is None:
        return False
    arr = np.ascontiguousarray(data, np.float32)
    rc = lib.uncor_write(path.encode(),
                         arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                         arr.shape[0], arr.shape[1], meta_cols,
                         ctypes.c_float(scale), 1 if append else 0)
    return rc == 0
