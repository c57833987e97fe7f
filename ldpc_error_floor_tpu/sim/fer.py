"""Monte-Carlo BER/FER simulation engine.

Capability parity with the reference evaluator (`compute_results`
`Print_Functions.py:130-165`, `calc_ber_fer` `Print_Functions.py:100-118`),
with the metric definitions preserved:

* **BER_last** — bit errors at the final iteration / decoded bits;
* **FER_last** — frames wrong at the final iteration / frames;
* **FER** (genie early-termination) — frames wrong at *every* iteration /
  frames: a frame counts as decoded if its APP matched the codeword at any
  iteration (`np.min` over per-iteration flags in the reference).

TPU-native design: channel sampling and decoding are fused in one jitted
step; with a `jax.sharding.Mesh` the batch lanes are sharded over the
``data`` axis via `shard_map`, each device draws an independent RNG stream
(`jax.random.fold_in` on its axis index), and the scalar counters are
`psum`-reduced over ICI — the host only ever sees five scalars per batch.
Early stopping at a target frame-error count makes deep error-floor sweeps
(FER 1e-8 and below) tractable.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ldpc_error_floor_tpu.channel.awgn import AWGNChannel
from ldpc_error_floor_tpu.models.nms import NMSDecoder
from ldpc_error_floor_tpu.models.weights import Params


@dataclass
class SimCounters:
    frames: int = 0
    bit_errors_last: int = 0
    frame_errors_last: int = 0
    frame_errors_genie: int = 0

    def add(self, frames, be, fel, feg):
        self.frames += int(frames)
        self.bit_errors_last += int(be)
        self.frame_errors_last += int(fel)
        self.frame_errors_genie += int(feg)


@dataclass
class FERPoint:
    snr_db: float
    frames: int
    ber_last: float
    fer_last: float
    fer_genie: float
    seconds: float
    frames_per_sec: float


class FERSimulator:
    """Fused sample+decode Monte-Carlo engine for one (decoder, channel)."""

    def __init__(self, decoder: NMSDecoder, channel: AWGNChannel,
                 batch: int = 1024, mesh: Optional[Mesh] = None,
                 data_axis: str = "data", inner_steps: int = 1):
        self.decoder = decoder
        self.channel = channel
        self.batch = batch
        self.mesh = mesh
        self.data_axis = data_axis
        # Device-side inner loop: each host round-trip runs `inner_steps`
        # fused sample+decode batches under one lax.scan and returns summed
        # counters.  Over a tunneled/remote TPU the per-dispatch host sync
        # otherwise dominates at high throughput.  int32 counter headroom
        # bounds it: inner_steps*batch*nbits must stay < 2^31.
        if inner_steps < 1:
            raise ValueError("inner_steps must be >= 1")
        nbits = decoder.target * decoder.z
        self.inner_steps = min(inner_steps,
                               max(1, (2 ** 31 - 1) // max(batch * nbits, 1)))
        if mesh is not None:
            n_dev = mesh.shape[data_axis]
            if batch % n_dev != 0:
                raise ValueError(f"batch {batch} not divisible by mesh axis "
                                 f"{data_axis}={n_dev}")
        self._step = self._build_step()

    def _local_step(self, params: Params, key: jax.Array, sigma: jnp.ndarray,
                    local_batch: int):
        llr = self.channel.sample(key, jnp.full((local_batch,), sigma,
                                                jnp.float32))
        res = self.decoder.apply(params, llr, collect="stats")
        be = jnp.sum(res.bit_errors[-1]).astype(jnp.int32)
        fel = jnp.sum(res.err_flags[-1]).astype(jnp.int32)
        feg = jnp.sum(res.uncor_mask).astype(jnp.int32)
        return be, fel, feg, llr, res.uncor_mask

    def _inner_loop(self, body: Callable) -> Callable:
        """Wrap a single-batch counter step into an on-device scan over
        `inner_steps` independent subkeys, returning summed counters."""
        if self.inner_steps == 1:
            return body

        def looped(params, key, sigma):
            subs = jax.random.split(key, self.inner_steps)

            def scan_body(acc, sub):
                be, fel, feg = body(params, sub, sigma)
                return (acc[0] + be, acc[1] + fel, acc[2] + feg), None

            zero = jnp.int32(0)
            (be, fel, feg), _ = jax.lax.scan(scan_body, (zero, zero, zero),
                                             subs)
            return be, fel, feg

        return looped

    def _build_step(self) -> Callable:
        if self.mesh is None:
            def step(params, key, sigma):
                be, fel, feg, _, _ = self._local_step(params, key, sigma,
                                                      self.batch)
                return be, fel, feg
            return jax.jit(self._inner_loop(step))

        axis = self.data_axis
        local_batch = self.batch // self.mesh.shape[axis]

        def device_body(params, key, sigma):
            be, fel, feg, _, _ = self._local_step(params, key, sigma,
                                                  local_batch)
            return be, fel, feg

        looped = self._inner_loop(device_body)

        def sharded_body(params, key, sigma):
            idx = jax.lax.axis_index(axis)
            key = jax.random.fold_in(key, idx)
            be, fel, feg = looped(params, key, sigma)
            return (jax.lax.psum(be, axis), jax.lax.psum(fel, axis),
                    jax.lax.psum(feg, axis))

        smapped = shard_map(
            sharded_body, mesh=self.mesh,
            in_specs=(P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,  # scan carries start unvarying (zeros)
        )
        return jax.jit(smapped)

    def run_point(self, params: Params, snr_db: float, key: jax.Array,
                  max_frames: int = 10_000_000,
                  target_frame_errors: Optional[int] = 100,
                  min_frames: int = 0,
                  progress: Optional[Callable[[SimCounters], None]] = None,
                  ) -> FERPoint:
        """Simulate one SNR point until `target_frame_errors` genie frame
        errors or `max_frames` frames."""
        sigma = jnp.float32(self.channel.code.snr_sigmas([snr_db])[0])
        c = SimCounters()
        t0 = time.perf_counter()
        frames_per_step = self.batch * self.inner_steps
        i = 0
        # One step is kept in flight past the host-side counter fetch, so
        # the device never idles on the (possibly tunneled) host round-trip.
        pending = None
        if max_frames > 0:
            key, sub = jax.random.split(key)
            pending = self._step(params, sub, sigma)
        while pending is not None:
            nxt = None
            if c.frames + 2 * frames_per_step <= max_frames:
                key, sub = jax.random.split(key)
                nxt = self._step(params, sub, sigma)
            be, fel, feg = pending
            c.add(frames_per_step, be, fel, feg)
            pending = nxt
            i += 1
            if progress is not None and i % 50 == 0:
                progress(c)
            if (target_frame_errors is not None and c.frames >= min_frames
                    and c.frame_errors_genie >= target_frame_errors):
                break
        dt = time.perf_counter() - t0
        nbits = self.decoder.target * self.decoder.z
        return FERPoint(
            snr_db=float(snr_db), frames=c.frames,
            ber_last=c.bit_errors_last / (c.frames * nbits),
            fer_last=c.frame_errors_last / c.frames,
            fer_genie=c.frame_errors_genie / c.frames,
            seconds=dt, frames_per_sec=c.frames / dt if dt > 0 else 0.0)

    def run_curve(self, params: Params, snrs_db: Sequence[float],
                  key: jax.Array, **kw) -> List[FERPoint]:
        out = []
        for s in snrs_db:
            key, sub = jax.random.split(key)
            out.append(self.run_point(params, s, sub, **kw))
        return out
