"""BPSK + AWGN channel sampling, on-device.

Capability parity with the reference's host-side NumPy sampler
(`create_mix_epoch`, `Print_Functions.py:29-72`), re-designed to run inside
jit on TPU with `jax.random` so Monte-Carlo sampling overlaps decoding and
never crosses the host boundary:

* all-zero codeword (the reference's generator-matrix branch is vestigial —
  `code_GM` is always passed `[]`, e.g. `main_Base.py:154`);
* BPSK maps bit b -> (-1)^(1-b), so bit 0 -> -1 (`Print_Functions.py:45`);
* LLR = 2y/sigma^2 in the **p1/p0 convention** — positive LLR asserts bit 1
  (`Print_Functions.py:46`);
* optional channel-LLR quantization for QMS (`Print_Functions.py:49-50`);
* punctured bits get LLR 0 (0.001 for sum-product training,
  `Print_Functions.py:53-57`); shortened bits get LLR -clip_llr (asserting
  bit 0 in this convention, `Print_Functions.py:59-60`);
* SNR-mix batching: the per-lane noise sigma cycles through the training SNR
  list across the batch (`Print_Functions.py:35-36`).

Layout: LLRs are returned ``[N*z, B]`` with the batch in the TPU lane
dimension, matching the decoder.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_error_floor_tpu.codes.protograph import Code
from ldpc_error_floor_tpu.models.nms import SP, QMS
from ldpc_error_floor_tpu.ops.ste import quantize_llr


def mix_sigma_lanes(sigmas: Sequence[float], batch: int) -> np.ndarray:
    """Per-lane sigma cycling through the SNR list (reference's mix epochs)."""
    s = np.asarray(sigmas, np.float32)
    return np.tile(s, batch // len(s) + 1)[:batch]


class AWGNChannel:
    """Zero-codeword BPSK+AWGN LLR sampler for a given code."""

    def __init__(self, code: Code, decoding_type: int = QMS, q_bit: int = 5,
                 clip_llr: float = 20.0):
        self.code = code
        self.decoding_type = decoding_type
        self.q_bit = q_bit
        self.clip_llr = clip_llr
        nz = code.n_full
        bit_idx = np.arange(1, nz + 1)  # 1-indexed bit positions
        ps, pe = code.punct
        ss, se = code.short
        self._punct = jnp.asarray(((bit_idx >= ps) & (bit_idx <= pe) & (ps > 0))
                                  .astype(np.float32))[:, None]
        self._short = jnp.asarray(((bit_idx >= ss) & (bit_idx <= se) & (ss > 0))
                                  .astype(np.float32))[:, None]

    def sample(self, key: jax.Array, sigma_lanes: jnp.ndarray) -> jnp.ndarray:
        """Sample a batch of channel LLRs [N*z, B]; sigma_lanes is [B]."""
        nz = self.code.n_full
        b = sigma_lanes.shape[0]
        noise = jax.random.normal(key, (nz, b), jnp.float32)
        y = -1.0 + noise * sigma_lanes[None, :]          # all-zero word, BPSK -1
        return self._llr(y, sigma_lanes)

    def sample_codewords(self, key: jax.Array, sigma_lanes: jnp.ndarray,
                         bits: jnp.ndarray) -> jnp.ndarray:
        """Channel LLRs for explicit codeword bits [N*z, B] in {0,1} — the
        reference's vestigial generator-matrix branch
        (`Print_Functions.py:41-45`, `code_GM=[]` at `main_Base.py:154`)
        made real; pair with `codes.encoder.Encoder`."""
        nz = self.code.n_full
        b = sigma_lanes.shape[0]
        noise = jax.random.normal(key, (nz, b), jnp.float32)
        s = 2.0 * bits.astype(jnp.float32) - 1.0         # bit b -> (-1)^(1-b)
        y = s + noise * sigma_lanes[None, :]
        return self._llr(y, sigma_lanes)

    def _llr(self, y: jnp.ndarray, sigma_lanes: jnp.ndarray) -> jnp.ndarray:
        llr = 2.0 * y / (sigma_lanes[None, :] ** 2)       # p1/p0 LLR
        if self.decoding_type == QMS:
            llr = quantize_llr(llr, self.q_bit)
        punct_val = 0.001 if self.decoding_type == SP else 0.0
        llr = llr * (1.0 - self._punct) + punct_val * self._punct
        llr = llr * (1.0 - self._short) + (-self.clip_llr) * self._short
        return llr
