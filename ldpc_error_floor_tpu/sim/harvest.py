"""Uncorrected-word harvesting (the boosting pipeline's data collection).

Capability parity with the reference's sampling_type=2 path
(`Print_Functions.py:120-126,147-156`; SURVEY.md section 3.3): decode fresh noise
at a single SNR and keep every frame whose genie flag says it was wrong at
*every* iteration.  Those LLR frames become the post-decoder's training set.

TPU-native design (SURVEY.md section 7, hard part (e) — rare-event harvesting
must not ship bulk data across the host boundary): the decode step compacts
the failing frames **on device** with a fixed-capacity `jnp.nonzero` gather,
so the host transfer per batch is one scalar count plus at most
``cap`` LLR columns (~100 KB) instead of the full [N*z, batch] tensor
(~300 MB at batch 131072).  At error-floor SNRs hits are rare and
harvesting runs at full fused-decoder throughput.  Under a mesh, each
device compacts its own shard and the per-device buffers are gathered.
"""

from __future__ import annotations

import os
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


def _truncate_rows(path: str, n_rows: int) -> None:
    """Truncate a text file to its first `n_rows` lines, in place."""
    keep = 0
    with open(path, "rb") as f:
        for _ in range(n_rows):
            line = f.readline()
            if not line:
                break
            keep += len(line)
    with open(path, "r+b") as f:
        f.truncate(keep)


class UncorHarvester:
    """Harvests never-corrected frames at one SNR.

    `cap` bounds how many failing frames are kept per batch *per device*;
    batches with more hits than `cap` keep the first `cap` (the true count
    is still reported, so overflow is visible in the accounting).
    """

    def __init__(self, decoder: NMSDecoder, channel: AWGNChannel,
                 batch: int = 1024, mesh: Optional[Mesh] = None,
                 data_axis: str = "data", cap: int = 512):
        self.decoder = decoder
        self.channel = channel
        self.batch = batch
        self.mesh = mesh
        self.data_axis = data_axis
        self.cap = cap

        def body(params, key, sigma, local_batch):
            llr = channel.sample(key, jnp.full((local_batch,), sigma,
                                               jnp.float32))
            res = decoder.apply(params, llr, collect="stats")
            mask = res.uncor_mask
            count = jnp.sum(mask).astype(jnp.int32)
            # on-device compaction: column indices of the (rare) hits
            idx = jnp.nonzero(mask, size=cap, fill_value=local_batch - 1)[0]
            picked = jnp.take(llr, idx, axis=1)           # [N*z, cap]
            return count, picked

        if mesh is None:
            self._step = jax.jit(lambda p, k, s: body(p, k, s, batch))
        else:
            local = batch // mesh.shape[data_axis]

            def sharded(params, key, sigma):
                i = jax.lax.axis_index(data_axis)
                count, picked = body(params, jax.random.fold_in(key, i),
                                     sigma, local)
                return count[None], picked

            self._step = jax.jit(shard_map(
                sharded, mesh=mesh, in_specs=(P(), P(), P()),
                out_specs=(P(data_axis), P(None, data_axis)),
                check_vma=False))

    def _drain(self, count, picked) -> List[np.ndarray]:
        """Pull this batch's compacted hits to the host (device->host
        traffic is at most cap columns per device).

        Multi-process safe: only this process's *addressable* shards are
        read (a multi-host global array cannot be np.asarray'd wholesale),
        so each host drains exactly the hits its own devices found."""
        out: List[np.ndarray] = []
        if self.mesh is None:
            c = int(count)
            if c:
                out.append(np.asarray(picked[:, :min(c, self.cap)]).T)
            return out
        # count is [ndev] sharded over devices; picked is [N*z, ndev*cap]
        # sharded over axis 1.  Map device ordinal -> local picked block.
        blocks = {(s.index[1].start or 0): np.asarray(s.data)
                  for s in picked.addressable_shards}
        for s in count.addressable_shards:
            d0 = s.index[0].start or 0
            for off, c in enumerate(np.asarray(s.data).ravel()):
                c = int(c)
                if not c:
                    continue
                blk = blocks[(d0 + off) * self.cap]
                out.append(blk[:, :min(c, self.cap)].T)
        return out

    def collect(self, params: Params, snr_db: float, key: jax.Array,
                target_words: int, max_frames: int = 1_000_000_000,
                out_file: Optional[str] = None,
                log_every: Optional[int] = None,
                ckpt_path: Optional[str] = None,
                ckpt_every_s: float = 60.0) -> np.ndarray:
        """Harvest at one SNR until `target_words` failures; returns the
        harvested LLRs [num, N*z] (p1/p0) and optionally appends them to
        `out_file` in the reference Uncor format.

        `ckpt_path`: JSON resume file for long harvests (collecting at a
        1e-7-FER operating point is hours of decoding).  Counters and the
        RNG position are checkpointed after the hits of each accounted
        batch have been appended to `out_file`; the checkpoint also records
        the row count `out_file` had at checkpoint time, and a resumed run
        first truncates `out_file` back to that count — so batches appended
        after the last checkpoint (which the resumed RNG will regenerate)
        are never duplicated in the file, and no frame is double-counted.
        The returned array then holds only the words found since the
        resume (the rest are already in `out_file`)."""
        from ldpc_error_floor_tpu.sim.fer import (_key_to_list, _load_ckpt,
                                                  _save_ckpt)
        sigma = jnp.float32(self.channel.code.snr_sigmas([snr_db])[0])
        if jax.process_count() > 1:
            # per-host output/resume files: harvesting rare large payloads
            # must not gather across hosts (SURVEY.md section 5.8);
            # concatenate the .part* files (or re-split them) afterwards
            if out_file is not None:
                out_file = f"{out_file}.part{jax.process_index()}"
            if ckpt_path is not None:
                ckpt_path = f"{ckpt_path}.part{jax.process_index()}"
        words: List[np.ndarray] = []
        n_words = 0
        frames = 0
        resumed = _load_ckpt(ckpt_path, snr_db)
        file_rows = 0
        if out_file is not None and os.path.exists(out_file):
            with open(out_file, "rb") as f:
                file_rows = sum(1 for _ in f)
        if resumed is not None:
            n_words = int(resumed["n_words"])
            frames = int(resumed["frames"])
            key = jnp.asarray(np.asarray(resumed["key"], np.uint32))
            ck_rows = resumed.get("file_rows")
            if out_file is not None and ck_rows is not None \
                    and file_rows > int(ck_rows):
                # rows appended after the last checkpoint: the resumed RNG
                # regenerates those batches, so drop them before continuing
                _truncate_rows(out_file, int(ck_rows))
                file_rows = int(ck_rows)
        t0 = time.perf_counter()
        t_ckpt = t0
        while n_words < target_words and frames < max_frames:
            key, sub = jax.random.split(key)
            count, picked = self._step(params, sub, sigma)
            frames += self.batch
            got = self._drain(count, picked)
            for g in got:
                words.append(g)
                n_words += g.shape[0]
                if out_file is not None:
                    append_uncor_file(out_file, g)
                    file_rows += g.shape[0]
            now = time.perf_counter()
            if ckpt_path and now - t_ckpt >= ckpt_every_s:
                t_ckpt = now
                # `key` (post-split) regenerates everything after this
                # batch, whose hits are already appended on disk
                _save_ckpt(ckpt_path, {"snr_db": float(snr_db),
                                       "frames": frames, "n_words": n_words,
                                       "file_rows": file_rows,
                                       "key": _key_to_list(key)})
            if log_every and frames % log_every == 0:
                dt = time.perf_counter() - t0
                print(f"harvest: {n_words}/{target_words} words, "
                      f"{frames} frames, {frames/dt:.0f} fps")
        if not words:
            return np.zeros((0, self.channel.code.n_full), np.float32)
        return np.concatenate(words, axis=0)
