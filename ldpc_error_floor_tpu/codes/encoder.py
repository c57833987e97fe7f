"""GF(2) systematic encoder for the lifted code.

The reference carries a generator-matrix channel branch but never uses it:
`create_mix_epoch` only exercises the all-zero-codeword path and `code_GM`
is always passed `[]` (`Print_Functions.py:41-45`, `main_Base.py:154`).
Here the encoder is real: a reduced-row-echelon decomposition of the lifted
parity-check matrix H yields a systematic map from k = n - rank(H) free
message bits to full codewords, evaluated on device as one GF(2) matmul
(an MXU-friendly f32 matmul followed by mod 2 — exact for k < 2^24).

Main uses:
* random-codeword Monte-Carlo — validates the all-zero-codeword symmetry
  assumption end-to-end instead of taking it on faith;
* generating labelled non-zero training batches (the reference's
  `train_on_zero_word=False` configuration, `main_Base.py:70`).
"""

from __future__ import annotations

from functools import cached_property
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_error_floor_tpu.codes.graph import TannerGraph


def gf2_rref(H: np.ndarray) -> Tuple[np.ndarray, list]:
    """Reduced row-echelon form of a binary matrix over GF(2).

    Returns (R [rank, n] uint8, pivot column list).  Vectorized row
    elimination: O(rank * m * n) byte ops — < a few seconds for the largest
    bundled code (n_dec=2304).
    """
    A = (np.asarray(H) % 2).astype(np.uint8).copy()
    m, n = A.shape
    pivots = []
    r = 0
    for c in range(n):
        if r == m:
            break
        rows = np.nonzero(A[r:, c])[0]
        if len(rows) == 0:
            continue
        p = r + int(rows[0])
        if p != r:
            A[[r, p]] = A[[p, r]]
        elim = np.nonzero(A[:, c])[0]
        elim = elim[elim != r]
        if len(elim):
            A[elim] ^= A[r]
        pivots.append(c)
        r += 1
    return A[:r], pivots


class Encoder:
    """Systematic GF(2) encoder over a lifted Tanner graph's H."""

    def __init__(self, graph: TannerGraph):
        self.graph = graph
        self.code = graph.code
        n = self.code.n_full
        H = graph.H
        # shortened bits are known-zero in every transmitted word (the
        # channel asserts LLR -clip there); constrain them to pivots by
        # augmenting H with unit rows, so k is the true shortened-code
        # dimension and encode() always zeroes those positions
        ss, se = self.code.short
        if ss > 0:
            rows = np.zeros((se - ss + 1, n), np.uint8)
            rows[np.arange(se - ss + 1), np.arange(ss - 1, se)] = 1
            H = np.vstack([H.astype(np.uint8), rows])
        R, pivots = gf2_rref(H)
        self.rank = len(pivots)
        self.k = n - self.rank
        piv = np.asarray(pivots, np.int32)
        free = np.setdiff1d(np.arange(n, dtype=np.int32), piv)
        self._piv = jnp.asarray(piv)
        self._free = jnp.asarray(free)
        # x_piv = S @ x_free (mod 2), from RREF rows:
        # x_{pivots[i]} + sum_f R[i, f] * x_f = 0
        self._S = jnp.asarray(R[:, free].astype(np.float32))

    def encode(self, msgs: jnp.ndarray) -> jnp.ndarray:
        """msgs [k, B] in {0,1} -> codeword bits [n_full, B] in {0,1}."""
        m = msgs.astype(jnp.float32)
        xp = jnp.mod(self._S @ m, 2.0)
        n = self.code.n_full
        x = jnp.zeros((n, msgs.shape[-1]), jnp.float32)
        x = x.at[self._free].set(m)
        x = x.at[self._piv].set(xp)
        return x

    def random_messages(self, key: jax.Array, batch: int) -> jnp.ndarray:
        return jax.random.bernoulli(key, 0.5, (self.k, batch)).astype(
            jnp.float32)

    def random_codewords(self, key: jax.Array, batch: int) -> jnp.ndarray:
        return self.encode(self.random_messages(key, batch))

    @cached_property
    def _H_dev(self):
        return jnp.asarray(self.graph.H.astype(np.float32))

    def syndrome_ok(self, bits: jnp.ndarray) -> jnp.ndarray:
        """[B] bool — H*bits == 0 (device-side validity check)."""
        return jnp.all(jnp.mod(self._H_dev @ bits.astype(jnp.float32), 2.0)
                       == 0.0, axis=0)
