"""Uncorrected-word harvesting (the boosting pipeline's data collection).

Capability parity with the reference's sampling_type=2 path
(`Print_Functions.py:120-126,147-156`; SURVEY.md section 3.3): decode fresh noise
at a single SNR and keep every frame whose genie flag says it was wrong at
*every* iteration.  Those LLR frames become the post-decoder's training set.

TPU-native design: the decode step returns the per-frame uncor mask and the
channel LLRs; the host only pulls the (tiny) mask each batch and fetches the
LLR payload when the mask is non-empty — at error-floor SNRs that is rare,
so harvesting runs at full decode throughput.  Under a mesh, each device
harvests its own shard and masks/LLRs are gathered per batch.
"""

from __future__ import annotations

import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ldpc_error_floor_tpu.channel.awgn import AWGNChannel
from ldpc_error_floor_tpu.io.uncor_files import append_uncor_file
from ldpc_error_floor_tpu.models.nms import NMSDecoder
from ldpc_error_floor_tpu.models.weights import Params


class UncorHarvester:
    def __init__(self, decoder: NMSDecoder, channel: AWGNChannel,
                 batch: int = 1024, mesh: Optional[Mesh] = None,
                 data_axis: str = "data"):
        self.decoder = decoder
        self.channel = channel
        self.batch = batch
        self.mesh = mesh
        self.data_axis = data_axis

        def body(params, key, sigma, local_batch):
            llr = channel.sample(key, jnp.full((local_batch,), sigma, jnp.float32))
            res = decoder.apply(params, llr, collect="stats")
            return res.uncor_mask, llr

        if mesh is None:
            self._step = jax.jit(lambda p, k, s: body(p, k, s, batch))
        else:
            local = batch // mesh.shape[data_axis]

            def sharded(params, key, sigma):
                idx = jax.lax.axis_index(data_axis)
                return body(params, jax.random.fold_in(key, idx), sigma, local)

            self._step = jax.jit(shard_map(
                sharded, mesh=mesh, in_specs=(P(), P(), P()),
                out_specs=(P(data_axis), P(None, data_axis)),
                check_vma=False))

    def collect(self, params: Params, snr_db: float, key: jax.Array,
                target_words: int, max_frames: int = 1_000_000_000,
                out_file: Optional[str] = None,
                log_every: Optional[int] = None) -> np.ndarray:
        """Harvest at one SNR until `target_words` failures; returns the
        harvested LLRs [num, N*z] (p1/p0) and optionally appends them to
        `out_file` in the reference Uncor format."""
        sigma = jnp.float32(self.channel.code.snr_sigmas([snr_db])[0])
        words: List[np.ndarray] = []
        n_words = 0
        frames = 0
        t0 = time.perf_counter()
        while n_words < target_words and frames < max_frames:
            key, sub = jax.random.split(key)
            mask, llr = self._step(params, sub, sigma)
            frames += self.batch
            mask_np = np.asarray(mask)
            cnt = int(mask_np.sum())
            if cnt:
                got = np.asarray(llr)[:, mask_np].T  # [cnt, N*z]
                words.append(got)
                n_words += cnt
                if out_file is not None:
                    append_uncor_file(out_file, got)
            if log_every and frames % log_every == 0:
                dt = time.perf_counter() - t0
                print(f"harvest: {n_words}/{target_words} words, "
                      f"{frames} frames, {frames/dt:.0f} fps")
        if not words:
            return np.zeros((0, self.channel.code.n_full), np.float32)
        return np.concatenate(words, axis=0)
