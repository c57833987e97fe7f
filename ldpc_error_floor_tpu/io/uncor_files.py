"""Uncorrected-word dataset I/O.

Format parity with the reference (`Print_Functions.py:6-10` reader,
`Print_Functions.py:120-126` writer, `Main_Functions.py:526-576` loader):
tab-separated text, one row per harvested frame; the first 3 columns are
metadata (zeros on write, dropped on read), the remaining N*z columns hold
the *negated* channel LLRs (p1/p0 convention is restored by negating on
read).

The hot path (harvest datasets run to 10^4-10^6 rows x ~580 columns) is
served by the native C++ codec (`native/uncor_codec.cpp`) when available,
with this module's NumPy implementation as the always-correct fallback —
both produce byte-identical files (tests/test_native_codec.py).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ldpc_error_floor_tpu import native


def read_uncor_file(path: str, max_rows: Optional[int] = None) -> np.ndarray:
    """Read harvested LLRs; returns [num_frames, N*z] float32 in p1/p0 LLRs."""
    data = native.parse_table(path, skip_cols=3, scale=-1.0)
    if data is None:
        data = np.loadtxt(path, dtype=np.float32, delimiter="\t")
        if data.ndim == 1:
            data = data[None, :]
        data = -data[:, 3:]  # drop metadata columns; stored negated
    if max_rows is not None:
        if data.shape[0] < max_rows:
            raise ValueError(
                f"{path}: has {data.shape[0]} rows, need {max_rows}")
        data = data[:max_rows]
    return data


def append_uncor_file(path: str, llrs: np.ndarray) -> None:
    """Append frames of p1/p0 LLRs [num, N*z]; stored negated with 3 zero
    metadata columns, '%.1f' formatting (reference `Print_Functions.py:125`)."""
    llrs = np.asarray(llrs, dtype=np.float32).reshape(llrs.shape[0], -1)
    if native.write_table(path, llrs, meta_cols=3, scale=-1.0, append=True):
        return
    rows = np.concatenate([np.zeros((llrs.shape[0], 3), np.float32), -llrs], axis=1)
    with open(path, "a") as f:
        np.savetxt(f, rows, fmt="%.1f", delimiter="\t")
