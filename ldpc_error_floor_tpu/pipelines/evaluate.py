"""Epoch evaluator — the reference's `compute_results`
(`Print_Functions.py:130-165`) as a first-class API.

Per SNR point, decodes `sample_num` frames (fresh AWGN noise, or batches of
a harvested uncorrected-word dataset) and accumulates the four metric rows
BER_last / FER_last / genie-FER / loss.  Optionally appends every
never-corrected frame to an Uncor file (the sampling_type=2 collection
path, `Print_Functions.py:147-156`)."""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_error_floor_tpu.channel.awgn import AWGNChannel, mix_sigma_lanes
from ldpc_error_floor_tpu.io.uncor_files import append_uncor_file
from ldpc_error_floor_tpu.models.nms import NMSDecoder
from ldpc_error_floor_tpu.models.weights import Params
from ldpc_error_floor_tpu.training.losses import multi_iteration_loss


class Evaluator:
    """`compute_loss=False` skips the per-iteration APP stack entirely and
    evaluates through ``collect='stats'`` — on TPU, pair it with a
    ``backend='pallas'`` decoder for fused-kernel evaluation speed (the loss
    row of the metrics then reads 0; all-zero labels assumed, which is the
    only case the reference's evaluator ever sees)."""

    def __init__(self, decoder: NMSDecoder, channel: AWGNChannel,
                 loss_type: int, t_lo: int = 0, batch: int = 0,
                 compute_loss: bool = True):
        self.decoder = decoder
        self.channel = channel
        self.batch = batch
        self.loss_type = loss_type
        self.t_lo = t_lo
        self.compute_loss = compute_loss

        def step(params: Params, llr, labels, etha):
            if not self.compute_loss:
                res = decoder.apply(params, llr, collect="stats")
                be_last = jnp.sum(res.bit_errors[-1]).astype(jnp.int32)
                fe_last = jnp.sum(res.err_flags[-1]).astype(jnp.int32)
                uncor = res.uncor_mask
                return (be_last, fe_last,
                        jnp.sum(uncor).astype(jnp.int32),
                        jnp.float32(0.0), uncor)
            res = decoder.apply(params, llr, labels=labels, collect="apps")
            apps = res.apps
            wrong = (apps >= 0) != (labels[None] >= 0.5)      # [T, tz, B]
            err_t = jnp.any(wrong, axis=1)                    # [T, B]
            uncor = jnp.all(err_t, axis=0)                    # [B]
            be_last = jnp.sum(wrong[-1]).astype(jnp.int32)
            fe_last = jnp.sum(err_t[-1]).astype(jnp.int32)
            fe_genie = jnp.sum(uncor).astype(jnp.int32)
            loss = multi_iteration_loss(apps, labels, loss_type, etha,
                                        t_start=t_lo)
            return be_last, fe_last, fe_genie, loss, uncor

        self._step = jax.jit(step)

    def run(self, params: Params, snr_sigmas, sample_num: int, etha: float,
            key: Optional[jax.Array] = None,
            data: Optional[np.ndarray] = None,
            collect_uncor_path: Optional[str] = None):
        """Returns (results [4, n_snr], seconds).  `data` (harvested LLRs
        [num, N*z]) replaces fresh noise when given; `snr_sigmas` then
        typically has a single dummy entry."""
        t0 = time.perf_counter()
        snr_sigmas = np.atleast_1d(np.asarray(snr_sigmas, np.float32))
        n_snr = snr_sigmas.size
        batch = self.batch
        batch_num = sample_num // batch
        if batch_num == 0:
            raise ValueError(f"sample_num {sample_num} < batch {batch}")
        results = np.zeros((4, n_snr), np.float64)
        nbits = self.decoder.target * self.decoder.z
        labels = jnp.zeros((nbits, batch), jnp.float32)
        etha = jnp.float32(etha)
        for bi in range(batch_num):
            for si in range(n_snr):
                if data is None:
                    key, sub = jax.random.split(key)
                    llr = self.channel.sample(
                        sub, jnp.full((batch,), snr_sigmas[si], jnp.float32))
                else:
                    rows = data[bi * batch:(bi + 1) * batch]
                    llr = jnp.asarray(rows.T, jnp.float32)
                be, fe, fg, loss, uncor = self._step(params, llr, labels, etha)
                if collect_uncor_path is not None:
                    mask = np.asarray(uncor)
                    if mask.any():
                        append_uncor_file(collect_uncor_path,
                                          np.asarray(llr)[:, mask].T)
                results[0, si] += be / (batch * nbits) / batch_num
                results[1, si] += fe / batch / batch_num
                results[2, si] += fg / batch / batch_num
                results[3, si] += loss / batch_num
        return results, time.perf_counter() - t0
