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

import json
import os
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
    # syndrome ("deploy") stop mode extras
    frame_errors_undetected: int = 0
    iters_sum: int = 0

    def add(self, frames, be, fel, feg):
        self.frames += int(frames)
        self.bit_errors_last += int(be)
        self.frame_errors_last += int(fel)
        self.frame_errors_genie += int(feg)

    def add_deploy(self, frames, be, fe, undet, iters):
        """Syndrome-stop counters: `fe`/`be` are frame/bit errors at each
        frame's own stop iteration; `undet` are wrong frames whose syndrome
        was satisfied (miscorrections); `iters` is total iterations run."""
        self.frames += int(frames)
        self.bit_errors_last += int(be)
        self.frame_errors_last += int(fe)
        self.frame_errors_undetected += int(undet)
        self.iters_sum += int(iters)


def _key_to_list(key) -> list:
    a = np.asarray(key)
    if a.dtype != np.uint32:  # new-style typed key
        a = np.asarray(jax.random.key_data(key))
    return [int(x) for x in a.ravel()]


def _save_ckpt(path: str, obj: dict) -> None:
    """Atomic JSON write (tmp + rename) so a crash never corrupts it."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def _load_ckpt(path: Optional[str], snr_db: float) -> Optional[dict]:
    if not path or not os.path.exists(path):
        return None
    with open(path) as f:
        obj = json.load(f)
    if obj.get("snr_db") != float(snr_db):
        return None
    return obj


@dataclass
class FERPoint:
    snr_db: float
    frames: int
    ber_last: float
    fer_last: float
    fer_genie: float
    seconds: float
    frames_per_sec: float
    # populated only by stop='syndrome' runs
    fer_undetected: Optional[float] = None
    avg_iters: Optional[float] = None


class FERSimulator:
    """Fused sample+decode Monte-Carlo engine for one (decoder, channel)."""

    def __init__(self, decoder: NMSDecoder, channel: AWGNChannel,
                 batch: int = 1024, mesh: Optional[Mesh] = None,
                 data_axis: str = "data", inner_steps: int = 1,
                 stop: str = "genie", codewords: str = "zero"):
        if stop not in ("genie", "syndrome"):
            raise ValueError(f"bad stop mode {stop!r}")
        if codewords not in ("zero", "random"):
            raise ValueError(f"bad codewords mode {codewords!r}")
        # codewords='random': encode fresh random messages each batch
        # (codes/encoder.py) and transmit them instead of the all-zero word.
        # The decode itself runs on sign-folded LLRs vs the zero word —
        # exact for continuous channels (under QMS, zero-LLR tie-breaking
        # follows the reference's zero-word semantics; see
        # tests/test_encoder.py) — so both backends and all stop modes work
        # unchanged while the encoder+modulator path is genuinely exercised.
        self.codewords = codewords
        if codewords == "random":
            from ldpc_error_floor_tpu.codes.encoder import Encoder
            self._encoder = Encoder(decoder.graph)
        self.decoder = decoder
        self.channel = channel
        self.batch = batch
        self.mesh = mesh
        self.data_axis = data_axis
        # stop='genie': the reference's metric definitions (fixed iteration
        # count; FER counts frames wrong at every iteration).  'syndrome':
        # deployable early termination — each frame stops at its first
        # H*x == 0 iteration; reports FER at stop, undetected-error rate and
        # average iterations (see models.nms.DeployResult).
        self.stop = stop
        self._n_counters = 4 if stop == "syndrome" else 3
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
        """Returns (counter tuple, llr, failure mask) for one local batch."""
        sig = jnp.full((local_batch,), sigma, jnp.float32)
        if self.codewords == "random":
            kb, kn = jax.random.split(key)
            bits = self._encoder.random_codewords(kb, local_batch)
            llr = self.channel.sample_codewords(kn, sig, bits)
            llr = llr * (1.0 - 2.0 * bits)  # symmetry fold -> zero-word ref
        else:
            llr = self.channel.sample(key, sig)
        if self.stop == "syndrome":
            res = self.decoder.apply(params, llr, collect="deploy")
            counters = (jnp.sum(res.bit_errors).astype(jnp.int32),
                        jnp.sum(res.wrong).astype(jnp.int32),
                        jnp.sum(res.undetected).astype(jnp.int32),
                        jnp.sum(res.iters).astype(jnp.int32))
            return counters, llr, res.wrong
        res = self.decoder.apply(params, llr, collect="stats")
        counters = (jnp.sum(res.bit_errors[-1]).astype(jnp.int32),
                    jnp.sum(res.err_flags[-1]).astype(jnp.int32),
                    jnp.sum(res.uncor_mask).astype(jnp.int32))
        return counters, llr, res.uncor_mask

    def _inner_loop(self, body: Callable) -> Callable:
        """Wrap a single-batch counter step into an on-device scan over
        `inner_steps` independent subkeys, returning summed counters."""
        if self.inner_steps == 1:
            return body

        def looped(params, key, sigma):
            subs = jax.random.split(key, self.inner_steps)

            def scan_body(acc, sub):
                c = body(params, sub, sigma)
                return tuple(a + x for a, x in zip(acc, c)), None

            zeros = tuple(jnp.int32(0) for _ in range(self._n_counters))
            acc, _ = jax.lax.scan(scan_body, zeros, subs)
            return acc

        return looped

    def _build_step(self) -> Callable:
        if self.mesh is None:
            def step(params, key, sigma):
                counters, _, _ = self._local_step(params, key, sigma,
                                                  self.batch)
                return counters
            return jax.jit(self._inner_loop(step))

        axis = self.data_axis
        local_batch = self.batch // self.mesh.shape[axis]

        def device_body(params, key, sigma):
            counters, _, _ = self._local_step(params, key, sigma, local_batch)
            return counters

        looped = self._inner_loop(device_body)

        def sharded_body(params, key, sigma):
            idx = jax.lax.axis_index(axis)
            key = jax.random.fold_in(key, idx)
            counters = looped(params, key, sigma)
            return tuple(jax.lax.psum(c, axis) for c in counters)

        spec = tuple(P() for _ in range(self._n_counters))
        smapped = shard_map(
            sharded_body, mesh=self.mesh,
            in_specs=(P(), P(), P()),
            out_specs=spec,
            check_vma=False,  # scan carries start unvarying (zeros)
        )
        return jax.jit(smapped)

    @staticmethod
    def _ckpt_obj(snr_db: float, c: SimCounters, key, done: bool = False):
        return {"snr_db": float(snr_db), "frames": c.frames,
                "bit_errors_last": c.bit_errors_last,
                "frame_errors_last": c.frame_errors_last,
                "frame_errors_genie": c.frame_errors_genie,
                "frame_errors_undetected": c.frame_errors_undetected,
                "iters_sum": c.iters_sum,
                "key": _key_to_list(key), "done": done}

    def run_point(self, params: Params, snr_db: float, key: jax.Array,
                  max_frames: int = 10_000_000,
                  target_frame_errors: Optional[int] = 100,
                  min_frames: int = 0,
                  progress: Optional[Callable[[SimCounters], None]] = None,
                  ckpt_path: Optional[str] = None,
                  ckpt_every_s: float = 60.0) -> FERPoint:
        """Simulate one SNR point until `target_frame_errors` genie frame
        errors or `max_frames` frames.

        `ckpt_path`: JSON counter+RNG checkpoint for long sweeps (deep
        error-floor points run for hours; the reference has no resumption
        story at all).  The file is written atomically at most every
        `ckpt_every_s` seconds; re-running with the same path resumes the
        accumulated counters and RNG position exactly — the in-flight
        batch at crash time is simply re-simulated, so a resumed run
        counts every frame exactly once.  A completed point's checkpoint is
        rewritten with its final counters (marked ``"done"``); re-running
        the same command then returns those counters immediately instead of
        silently extending the point — the stop conditions are evaluated
        against the resumed counters *before* any work is launched, so only
        genuinely raised limits (more `max_frames`, a higher
        `target_frame_errors`) simulate further.

        `max_frames` is a strict bound: the point runs whole
        ``batch * inner_steps`` chunks and never accounts more than
        `max_frames` frames (a `max_frames` below one chunk is an error)."""
        sigma = jnp.float32(self.channel.code.snr_sigmas([snr_db])[0])
        c = SimCounters()
        resumed = _load_ckpt(ckpt_path, snr_db)
        if resumed is not None:
            for f in ("frames", "bit_errors_last", "frame_errors_last",
                      "frame_errors_genie", "frame_errors_undetected",
                      "iters_sum"):
                setattr(c, f, int(resumed.get(f, 0)))
            key = jnp.asarray(np.asarray(resumed["key"], np.uint32))
        frames0 = c.frames
        t0 = time.perf_counter()
        t_ckpt = t0
        frames_per_step = self.batch * self.inner_steps
        if max_frames < frames_per_step and c.frames == 0:
            raise ValueError(
                f"max_frames {max_frames} below one simulation chunk "
                f"(batch {self.batch} * inner_steps {self.inner_steps}); "
                f"raise max_frames or shrink the batch")
        syndrome = self.stop == "syndrome"

        def target_met() -> bool:
            stop_errors = (c.frame_errors_last if syndrome
                           else c.frame_errors_genie)
            return (target_frame_errors is not None
                    and c.frames >= min_frames
                    and stop_errors >= target_frame_errors)

        i = 0
        # One step is kept in flight past the host-side counter fetch, so
        # the device never idles on the (possibly tunneled) host round-trip.
        # `key_unacc` is the RNG position that regenerates every batch not
        # yet folded into the counters — what a resume must restart from.
        pending = None
        key_unacc = key
        if c.frames + frames_per_step <= max_frames and not target_met():
            key, sub = jax.random.split(key)
            pending = self._step(params, sub, sigma)
        while pending is not None:
            nxt = None
            key_next = key
            if c.frames + 2 * frames_per_step <= max_frames:
                key, sub = jax.random.split(key)
                nxt = self._step(params, sub, sigma)
            if syndrome:
                c.add_deploy(frames_per_step, *pending)
            else:
                c.add(frames_per_step, *pending)
            pending = nxt
            key_unacc = key_next
            i += 1
            if progress is not None and i % 50 == 0:
                progress(c)
            now = time.perf_counter()
            if ckpt_path and now - t_ckpt >= ckpt_every_s:
                t_ckpt = now
                _save_ckpt(ckpt_path, self._ckpt_obj(snr_db, c, key_unacc))
            if target_met():
                break
        if ckpt_path:
            # final record: a re-run of the same command reports the point
            # done (via the pre-launch stop check) instead of resuming a
            # stale intermediate state and silently extending it
            _save_ckpt(ckpt_path,
                       self._ckpt_obj(snr_db, c, key_unacc, done=True))
        dt = time.perf_counter() - t0
        nbits = self.decoder.target * self.decoder.z
        return FERPoint(
            snr_db=float(snr_db), frames=c.frames,
            ber_last=c.bit_errors_last / (c.frames * nbits),
            fer_last=c.frame_errors_last / c.frames,
            fer_genie=(float("nan") if syndrome
                       else c.frame_errors_genie / c.frames),
            seconds=dt,
            frames_per_sec=(c.frames - frames0) / dt if dt > 0 else 0.0,
            fer_undetected=(c.frame_errors_undetected / c.frames
                            if syndrome else None),
            avg_iters=c.iters_sum / c.frames if syndrome else None)

    def run_curve(self, params: Params, snrs_db: Sequence[float],
                  key: jax.Array, ckpt_prefix: Optional[str] = None,
                  **kw) -> List[FERPoint]:
        """`ckpt_prefix`: per-SNR resume files `{prefix}_snr{s}.json` (a
        killed multi-point sweep restarts mid-point, not from scratch)."""
        out = []
        for s in snrs_db:
            key, sub = jax.random.split(key)
            ckpt = f"{ckpt_prefix}_snr{s}.json" if ckpt_prefix else None
            out.append(self.run_point(params, s, sub, ckpt_path=ckpt, **kw))
        return out
