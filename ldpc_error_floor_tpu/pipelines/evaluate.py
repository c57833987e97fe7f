"""Epoch evaluator — the reference's `compute_results`
(`Print_Functions.py:130-165`) as a first-class API.

Per SNR point, decodes `sample_num` frames (fresh AWGN noise, or batches of
a harvested uncorrected-word dataset) and accumulates the four metric rows
BER_last / FER_last / genie-FER / loss.  Optionally appends every
never-corrected frame to an Uncor file (the sampling_type=2 collection
path, `Print_Functions.py:147-156`).

TPU-native design: the whole (batches x SNRs) sweep runs as ONE on-device
`lax.scan` dispatch per call (`_fused_*` below) — the reference dispatches
one `sess.run` per (batch, SNR) pair (`Print_Functions.py:144-151`), and
over a tunneled/remote accelerator those host round-trips dominate eval
wall time.  The per-batch host loop is kept only for the uncor-collection
path (which must drain per-frame hits to the host) and as the reference
semantics twin for the step-identity test
(tests/test_evaluator_fused.py).  With a `mesh`, batch lanes shard over
the data axis and counters reduce over ICI.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh

from ldpc_error_floor_tpu.channel.awgn import AWGNChannel
from ldpc_error_floor_tpu.io.uncor_files import append_uncor_file
from ldpc_error_floor_tpu.models.nms import NMSDecoder
from ldpc_error_floor_tpu.models.weights import Params
from ldpc_error_floor_tpu.parallel.mesh import batch_constraint
from ldpc_error_floor_tpu.training.losses import multi_iteration_loss


class Evaluator:
    """`compute_loss=False` skips the per-iteration APP stack entirely and
    evaluates through ``collect='stats'`` — on TPU, pair it with a
    ``backend='pallas'`` decoder for fused-kernel evaluation speed (the loss
    row of the metrics then reads 0; all-zero labels assumed, which is the
    only case the reference's evaluator ever sees)."""

    def __init__(self, decoder: NMSDecoder, channel: AWGNChannel,
                 loss_type: int, t_lo: int = 0, batch: int = 0,
                 compute_loss: bool = True, mesh: Optional[Mesh] = None,
                 data_axis: str = "data", fused: bool = True):
        self.decoder = decoder
        self.channel = channel
        self.batch = batch
        self.loss_type = loss_type
        self.t_lo = t_lo
        self.compute_loss = compute_loss
        # LDPC_EVAL_FUSED=0 falls back to per-batch dispatches — escape
        # hatch for remote-compiler crashes on the big fused sweep program
        # (observed round 3: MACKAY_N96 sweeps SIGSEGV tpu_compile_helper)
        self.fused = fused and os.environ.get("LDPC_EVAL_FUSED", "1") != "0"
        self._shard = batch_constraint(mesh, data_axis)
        self._fused_cache: Dict[Tuple, callable] = {}

        def metrics(params: Params, llr, labels, etha):
            """(be_last, fe_last, fe_genie, loss, uncor_mask) for one batch."""
            llr = self._shard(llr)
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

        self._metrics = metrics
        self._step = jax.jit(metrics)

    # ----- fused on-device sweeps ------------------------------------------------
    def _get_fused(self, batch_num: int, n_snr: int, data_mode: bool):
        """One jitted scan over all (batch, SNR) pairs, cached per shape.

        Key-split order matches the host loop exactly (split once per
        (bi, si) pair in row-major order), so fused and per-batch paths
        produce identical counters from the same starting key."""
        cache_key = (batch_num, n_snr, data_mode)
        fn = self._fused_cache.get(cache_key)
        if fn is not None:
            return fn
        batch = self.batch
        metrics = self._metrics

        if data_mode:
            def fused(params, data, sigmas, labels, etha):
                def outer(_, bi):
                    llr = lax.dynamic_slice_in_dim(data, bi * batch, batch,
                                                   axis=0).T

                    def inner(_, si):
                        be, fe, fg, loss, _u = metrics(params, llr, labels,
                                                       etha)
                        return 0, (jnp.stack([be, fe, fg]), loss)

                    _, out = lax.scan(inner, 0, jnp.arange(n_snr))
                    return 0, out

                _, (ints, losses) = lax.scan(outer, 0, jnp.arange(batch_num))
                return ints, losses
        else:
            def fused(params, key, sigmas, labels, etha):
                def outer(key, _bi):
                    def inner(key, si):
                        key, sub = jax.random.split(key)
                        sig = jnp.full((batch,), sigmas[si], jnp.float32)
                        llr = self.channel.sample(sub, sig)
                        be, fe, fg, loss, _u = metrics(params, llr, labels,
                                                       etha)
                        return key, (jnp.stack([be, fe, fg]), loss)

                    key, out = lax.scan(inner, key, jnp.arange(n_snr))
                    return key, out

                _, (ints, losses) = lax.scan(outer, key,
                                             jnp.arange(batch_num))
                # ints: [batch_num, n_snr, 3]; losses: [batch_num, n_snr].
                # Returned per-batch (unsummed): the int32 per-batch counters
                # can't overflow (one batch of bits < 2^31), but their sum
                # over thousands of batches can — the host reduces in float64
                # like the reference's NumPy accumulation.
                return ints, losses

        fn = jax.jit(fused)
        self._fused_cache[cache_key] = fn
        return fn

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
        nbits = self.decoder.target * self.decoder.z
        labels = jnp.zeros((nbits, batch), jnp.float32)
        etha = jnp.float32(etha)

        if self.fused and collect_uncor_path is None:
            try:
                fn = self._get_fused(batch_num, n_snr, data is not None)
                sigmas = jnp.asarray(snr_sigmas)
                if data is not None:
                    rows = jnp.asarray(data[:batch_num * batch], jnp.float32)
                    ints, losses = fn(params, rows, sigmas, labels, etha)
                else:
                    ints, losses = fn(params, key, sigmas, labels, etha)
            except (ValueError, TypeError):
                # argument/shape errors are user-caused — surface them
                raise
            except Exception as e:
                # the big fused sweep program failed to compile or crashed
                # the (remote) compiler — observed as tpu_compile_helper
                # SIGSEGV (INTERNAL), VMEM RESOURCE_EXHAUSTED, and Mosaic
                # lowering exceptions on some codes.  Degrade permanently to
                # per-batch dispatches rather than kill a multi-hour
                # training run — but log the FULL traceback, since this
                # broad except would otherwise also mask a genuine bug in
                # the fused path (the fallback never re-exercises it)
                import traceback
                import warnings
                warnings.warn("fused evaluator sweep failed "
                              f"({type(e).__name__}: "
                              f"{str(e).splitlines()[0][:120]}); falling "
                              "back to per-batch evaluation. Full "
                              f"traceback:\n{traceback.format_exc()}")
                self.fused = False
            else:
                # per-batch [batch_num, n_snr, {3,}] -> float64 totals
                ints = np.asarray(ints, np.float64).sum(axis=0)  # [n_snr, 3]
                losses = np.asarray(losses, np.float64).sum(axis=0)
                results = np.zeros((4, n_snr), np.float64)
                results[0] = ints[:, 0] / (batch * nbits) / batch_num
                results[1] = ints[:, 1] / batch / batch_num
                results[2] = ints[:, 2] / batch / batch_num
                results[3] = losses / batch_num
                return results, time.perf_counter() - t0

        # per-batch host loop: collection mode (must drain hits) and the
        # reference-semantics twin for tests
        results = np.zeros((4, n_snr), np.float64)
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
