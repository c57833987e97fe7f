"""Fused Pallas TPU kernel for the NMS decoder's simulation/inference path.

Motivation: the `lax.scan` decoder (models/nms.py) streams [N*Dv*z, B]-sized
message tensors through HBM on every decoding iteration — at batch 2048 the
whole 20-iteration decode moves ~100x more HBM bytes than the channel LLRs
themselves.  This kernel holds the complete decoder state (C->V messages,
channel LLRs, previous APP) in VMEM for the full iteration loop, so HBM
traffic is one read of the LLR block and one write of the APP/stat blocks
per batch tile: the decode becomes VPU-bound instead of HBM-bound.

Mapping of the Tanner graph onto the TPU (no gathers, no dense lifts):

* the Monte-Carlo batch is the lane dimension (tiles are [zp, TB] with
  zp = z rounded up to the 8-sublane boundary, TB batch lanes);
* each proto edge e owns one [zp, TB] tile of C->V message state in VMEM;
* circulant lifting is a *static* sublane rotation of each edge tile by its
  shift (reference `Lift_Matrix1/2`, `Main_Functions.py:56-77`, were dense
  [E*z, E*z] one-hot matmuls);
* check/variable updates are static Python loops over the proto graph,
  unrolled into straight-line VPU code inside a `fori_loop` over iterations;
* the check-node extrinsic min uses the classic min1/min2 running reduction
  (the hardware formulation) instead of the reference's O(E^2) tile-mask
  trick (`Main_Functions.py:231-254`).

Semantics are identical to `NMSDecoder._decode_impl` with
``collect='stats'`` and all-zero labels (the only case the Monte-Carlo
engine and harvester use): MS / QMS / MS_RAW / SP decoding, all weight
sharing modes, UCN detection, systematic target restriction, and the
reference's zero-message epsilon handling (`Main_Functions.py:229-250`).
This module's kernels are forward-only; training runs through their
custom-VJP twins in ops/pallas_train.py (FusedTrainKernel subclasses
FusedNMSKernel and reuses the graph tables, rolls, packing and the
weighting chain defined here).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ldpc_error_floor_tpu.codes.graph import TannerGraph
from ldpc_error_floor_tpu.models.nms import (MS, MS_RAW, QMS, SP, DecoderConfig,
                                             _EPS_MSG, _PAD_MAG)
from ldpc_error_floor_tpu.models.weights import WeightSpec
from ldpc_error_floor_tpu.ops.ste import qms_grid


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _atanh(p):
    """atanh via logs: Mosaic has no TPU lowering for the atanh
    primitive (measured round 5: 'Unimplemented primitive ... atanh').
    Inputs are pre-clipped to +-(1 - 1e-7), so the quotient is finite."""
    return 0.5 * jnp.log((1.0 + p) / (1.0 - p))


#: The Mosaic compiler's DEFAULT scoped-VMEM limit for one Pallas kernel
#: invocation.  16 MiB was measured on v5e via compile errors (round 3);
#: round 4 discovered it is only a compiler default, raisable per kernel
#: with CompilerParams(vmem_limit_bytes=...) up to the physical VMEM.
#: Override with LDPC_SCOPED_VMEM (bytes).
SCOPED_VMEM_BYTES = int(os.environ.get("LDPC_SCOPED_VMEM", 16 * 2 ** 20))

#: Hard cap when RAISING the scoped limit (bytes).  v5e has 128 MiB of
#: VMEM per core; 96 MiB leaves headroom for XLA's own buffers.  Measured
#: working: the z=64 5G full-overlap backward (16.55 MiB actual) compiles
#: and runs at a 24 MiB limit.  Override with LDPC_VMEM_CAP.
VMEM_CAP_BYTES = int(os.environ.get("LDPC_VMEM_CAP", 96 * 2 ** 20))


def kernel_vmem_limit(model_bytes: int) -> int:
    """Scoped-VMEM limit to request from Mosaic for a kernel whose modeled
    footprint is ``model_bytes``: the compiler default when the model fits
    it, else the model plus a calibration margin (the model tracks actual
    scoped allocation within ~10% on the measured configs; 25% + 2 MiB
    covers that error band)."""
    if model_bytes <= SCOPED_VMEM_BYTES:
        return SCOPED_VMEM_BYTES
    return int(model_bytes * 1.25) + 2 * 2 ** 20


def vmem_fits(model_bytes: int) -> bool:
    """Whether a kernel with this modeled footprint can be compiled at all
    (its raised limit stays under the physical-VMEM cap)."""
    return kernel_vmem_limit(model_bytes) <= VMEM_CAP_BYTES


def _as_graph(code_or_graph) -> TannerGraph:
    if isinstance(code_or_graph, TannerGraph):
        return code_or_graph
    return TannerGraph(code_or_graph)


def kernel_vmem_bytes(code_or_graph, tb: int, n_iters: int = 20,
                      mode: str = "stats", ucn: bool = False,
                      target: int = 0, overlap: bool = False) -> int:
    """Model of a fused kernel's peak VMEM footprint (bytes).

    Replaces round 3's hand-tuned ``E*zp <= 3000`` eligibility constant
    (which lived in three places and was re-discovered by compile failure
    whenever a new code crossed it).  Terms, per batch tile of ``tb``
    lanes with ``tile = zp*tb*4`` bytes:

    * explicit scratch buffers (the in-place [E, zp, tb] edge state; the
      APP scratch for UCN/deploy/train modes; the backward's second edge
      buffer and cotangent tiles);
    * pipeline blocks: Pallas double-buffers each VMEM in/out block
      across grid steps (2x the llr input and the kernel outputs);
    * live loop temporaries: the weighted-channel tile list (N) plus the
      deg-sized per-check working set of the min1/min2 reduction, scaled
      by a margin for Mosaic's register spills / scheduling slack, plus
      UCN's parity tiles (N) and masks (M) when enabled.

    Calibrated against measured v5e compile results (round 4) in
    tests/test_vmem_budget.py; `auto_tb` consults it to pick the largest
    fitting tile, so new codes/hardware pick their knee from the model
    instead of a magic number."""
    g = _as_graph(code_or_graph)
    code = g.code
    z = max(int(code.z), 1)
    zp = _round_up(z, 8)
    E, N, M = int(g.E), int(code.N), int(code.M)
    Dc = int(g.Dc)
    tile = zp * tb * 4
    Tp = _round_up(max(n_iters, 1), 8)
    tgt = target if target and target > 0 else N
    ucn_extra = (N + M) * tile if ucn else 0
    if mode == "stats" or mode == "deploy":
        scratch = E * tile
        if ucn or mode == "deploy":
            scratch += N * tile
        io = 2 * N * tile + 2 * N * tile          # llr in, app out
        io += 2 * 2 * Tp * tb * 4 if mode == "stats" else 2 * 8 * tb * 4
        live = (N + 3 * Dc + 6) * tile + ucn_extra
    elif mode == "train_fwd":
        # `overlap`: ping-pong edge-state buffers + double APP/residual
        # stages, so the per-iteration checkpoint DMAs overlap the compute.
        # cres: the round-5 per-check residual stream (m1/m2/neg_tot
        # + u_mask rows) staged per iteration
        cres = (4 if ucn else 3) * M
        scratch = ((2 * E + 2 * tgt + 2 * cres) if overlap
                   else (E + tgt + cres)) * tile
        io = 2 * N * tile                         # llr in (hist/apps are HBM)
        live = (N + 3 * Dc + 6) * tile + ucn_extra
    elif mode in ("train_bwd", "train"):
        # two edge buffers (v2c_pre + cotangent carry), residual landing
        # buffers, pre-clip APP + cotangent tiles, and a wider per-check
        # working set (amag/sgn/g_mags/is_m1/is_m2 + the rolled
        # cotangent).  `overlap`: the hist/cres/pre/gapp input landing
        # buffers double so the next iteration's DMAs prefetch during
        # compute
        cres = (4 if ucn else 3) * M
        scratch = ((3 * E + 4 * tgt + 2 * cres) if overlap
                   else (2 * E + 2 * tgt + cres)) * tile
        io = 2 * N * tile + 3 * 2 * Tp * 512 * 4  # llr in + grad rows
        # 14*Dc + 4*N: the backward keeps g_mags/is_m1/is_m2/amag/sgn plus
        # the hoisted qr/gm/p candidate tiles live per check, and Mosaic's
        # VMEM stack spill was measured well above the round-3 6*Dc term —
        # calibration points: wman tb256 bwd_db fails at 18.87M actual
        # (13.8M under the old model), z64 tb128 bwd_db fails at 16.55M
        # actual (15.4M under the 2*N model) while z64 tb128 plain and
        # wman tb256 plain both compile
        live = (4 * N + 14 * Dc + 8) * tile + ucn_extra
    else:
        raise ValueError(f"bad mode {mode!r}")
    return scratch + io + live + 512 * 1024       # fixed Mosaic overhead


def auto_tb(code_or_graph, local_batch: int, mode: str = "stats",
            ucn: bool = False, target: int = 0, n_iters: int = 20,
            limit: Optional[int] = None) -> Optional[int]:
    """Largest batch-tile width (lanes) whose modeled VMEM footprint fits
    the scoped-VMEM budget and which divides ``local_batch``.

    ``mode``: 'stats' / 'deploy' / 'train' (= the train pair, bounded by
    its backward kernel).  Returns ``None`` when no tile fits — callers
    fall back to the scan backend.

    Round 4: a kernel whose modeled footprint exceeds the compiler's
    16 MiB default now RAISES its scoped limit (kernel_vmem_limit), so
    "fits" means the raised limit stays under the physical-VMEM cap.
    Tile-order heuristics, both measured on v5e:

    * small lift (zp <= 32): tb 256 first (wman stats 3.61M cw/s at 256
      vs 3.52M at 128); large lift: tb 128 first (z72 stats 732k at 128
      vs 582k at 256 — the [zp, 256] per-edge tiles of a big-zp code
      spill Mosaic's scheduler);
    * for the train pair, a tile whose DMA-overlap (double-buffered)
      variant fits beats a larger single-buffer tile (wman: 858k with
      full overlap at 128 vs 653k partial at 256; 859k at 256 full)."""
    cap = VMEM_CAP_BYTES if limit is None else limit
    g = _as_graph(code_or_graph)
    z = max(int(g.code.z), 1)
    zp = _round_up(z, 8)
    pack = max(1, zp // z)   # sublane packing: each tile holds pack*tb words
    tiles = (256, 128) if zp <= 32 else (128, 256)

    def fits(tb, overlap=False):
        if local_batch % (tb * pack) != 0:
            return False
        v = kernel_vmem_bytes(code_or_graph, tb, n_iters=n_iters, mode=mode,
                              ucn=ucn, target=target, overlap=overlap)
        return kernel_vmem_limit(v) <= cap

    if mode in ("train", "train_bwd"):
        for overlap in (True, False):
            for tb in tiles:
                if fits(tb, overlap):
                    return tb
        return None
    for tb in tiles:
        if fits(tb):
            return tb
    return None


class FusedNMSKernel:
    """Code-generated fused decode kernel for one (graph, config, spec).

    ``decode_stats(stacked, llr)`` returns ``(app_last [N*z, B],
    err_flags [T, B] bool, bit_errors [T, B] int32)`` — per-iteration
    frame-wrong flags and bit-error counts against the all-zero codeword,
    matching `NMSDecoder.decode(collect='stats')`.
    """

    def __init__(self, graph: TannerGraph, cfg: DecoderConfig, spec: WeightSpec,
                 tb: int = 256, interpret: Optional[bool] = None,
                 early_stop: bool = False, mode: str = "stats",
                 unroll: Optional[int] = None, prescale: bool = True):
        if cfg.decoding_type not in (SP, MS, QMS, MS_RAW):
            raise ValueError(f"bad decoding_type {cfg.decoding_type}")
        if mode not in ("stats", "deploy"):
            raise ValueError(f"bad kernel mode {mode!r}")
        # mode='deploy': syndrome-based early termination (the deployable
        # variant — no genie knowledge).  Each batch lane freezes its APP /
        # error stats at the first iteration whose hard decisions satisfy
        # H*x == 0; the iteration loop ends once every lane in the tile has
        # stopped (or at T).  See `decode_deploy`.
        self.mode = mode
        self.graph = graph
        self.cfg = cfg
        self.spec = spec
        self.tb = tb
        # Early stop: end the iteration loop for a batch tile once every lane
        # has decoded correctly at least once.  Genie-FER / uncor masks are
        # exact (skipped iterations count as correct, which they are by the
        # genie definition); FER_last/BER_last then refer to the stop
        # iteration rather than iteration T-1.
        self.early_stop = early_stop
        code = graph.code
        self.N, self.M, self.z = code.N, code.M, code.z
        self.zp = _round_up(self.z, 8)
        # Sublane packing (round 5): a z < 8 code would waste zp - z of the
        # 8 sublanes in every tile (z=1 MacKay/BCH/Polar: 7 of 8).  Instead
        # pack P = zp // z INDEPENDENT batch groups into the sublanes — each
        # tile row block [g*z, (g+1)*z) carries batch group g, circulant
        # rolls rotate within each group, and the per-lane stats become
        # per-(group, lane).  One kernel invocation then decodes P * TB
        # codewords per tile at the same op count.
        self.P = max(1, self.zp // max(self.z, 1))
        # perf-attribution diagnostic: measure the pre-round-5 padded
        # layout (1 codeword per lane, zp - z dead sublanes)
        if os.environ.get("LDPC_KERNEL_NOPACK") == "1":
            self.P = 1
        self.prows = self.P * self.z          # valid (non-pad) rows per tile
        self.stat_rows = _round_up(4 * self.P, 8)  # deploy-mode stat block
        self.T = spec.n_iters
        self.target = cfg.target_node if cfg.target_node > 0 else self.N
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        # All QMS grids have power-of-two steps (ops/ste.py), so the decode
        # kernel stores messages PRE-SCALED by 1/step: quantization becomes
        # a bare round+clamp (no scale/unscale multiplies), bit-exactly —
        # scaling a float by a power of two commutes exactly with IEEE
        # rounding, and the APP block is scaled back by `step` once at its
        # final write.  The train kernel (ops/pallas_train.py) keeps real
        # LLR units (its VJP residuals/cotangents are in LLR units) and
        # passes prescale=False.
        self.prescaled = prescale and cfg.decoding_type == QMS
        if self.prescaled:
            step, clip = qms_grid(cfg.q_bit)
            self.scale = 1.0 / step
            assert self.scale == 2.0 ** round(np.log2(self.scale)), \
                "QMS pre-scaling requires a power-of-two grid step"
            self.qclip_s = clip * self.scale          # quantizer clip, scaled
        else:
            self.scale = 1.0
            self.qclip_s = None
        self.clip_s = cfg.clip_llr * self.scale       # APP/message clip, scaled
        self.eps_s = _EPS_MSG * self.scale            # zero-nudge, scaled
        # iteration-loop unroll factor (fori_loop pipeline overhead shows up
        # in the roofline); unroll >= T switches to a fully static Python
        # loop.  Default measured in round 4; override with
        # LDPC_KERNEL_UNROLL.
        if unroll is None:
            unroll = int(os.environ.get("LDPC_KERNEL_UNROLL", "1"))
        self.unroll = max(1, unroll)
        # static graph tables
        self.edge_cn = [int(v) for v in graph.edge_cn]
        self.edge_vn = [int(v) for v in graph.edge_vn]
        self.edge_shift = [int(v) % self.z for v in graph.edge_shift]
        self.cn_order = [int(v) for v in graph.cn_order_of_edge]
        self.E = graph.E
        self.vn_edges = [[] for _ in range(self.N)]
        for e in range(self.E):
            self.vn_edges[self.edge_vn[e]].append(e)
        self.cn_edges = [[] for _ in range(self.M)]
        for e in graph.edge_of_cn_order:  # row-major: slot order per check
            self.cn_edges[self.edge_cn[e]].append(int(e))
        # scoped-VMEM limit this kernel requests from Mosaic (raised above
        # the 16 MiB default when the modeled footprint needs it)
        self.vmem_limit = kernel_vmem_limit(kernel_vmem_bytes(
            graph, tb, n_iters=spec.n_iters, mode=self.mode,
            ucn=spec.ucn_enabled, target=cfg.target_node))

    # ----- kernel building blocks ------------------------------------------------

    def _roll(self, tile, s: int):
        """Rotate each z-row batch group of a [zp, TB] tile by -s (check-side
        slot h reads variable-side slot (h+s) mod z), group-confined so the
        P packed batch groups never mix; pad rows don't matter."""
        z, zp = self.z, self.zp
        s = s % z if z else 0
        if s == 0 or z == 1:
            return tile
        # perf-attribution diagnostic ONLY (breaks numerics): measure the
        # kernel with all circulant rotations elided
        if os.environ.get("LDPC_KERNEL_NOROLL") == "1":
            return tile
        # (measured round 3: pltpu.roll — the Mosaic hardware rotate — is
        # NOT faster than this two-slice concatenate on v5e, 2.36M vs
        # 2.38M cw/s on the wman stats kernel; re-measured round 4 after
        # the scaled-arithmetic rewrite via LDPC_KERNEL_ROLL=pltpu)
        if os.environ.get("LDPC_KERNEL_ROLL") == "pltpu" and zp == z:
            return pltpu.roll(tile, shift=z - s, axis=0)
        parts = []
        for g in range(self.P):
            o = g * z
            parts += [tile[o + s:o + z], tile[o:o + s]]
        if zp > self.prows:
            parts.append(tile[self.prows:zp])
        return jnp.concatenate(parts, axis=0)

    def _group_sum(self, tile):
        """Sublane reduction respecting the packed layout: [zp, TB] ->
        [P, TB], row g = sum over batch group g's z rows.  Caller masks pad
        rows first (when zp > prows)."""
        if self.z == 1:
            return tile if self.zp == self.P else tile[:self.P]
        if self.P == 1:
            return jnp.sum(tile, axis=0, keepdims=True)
        z = self.z
        return jnp.concatenate(
            [jnp.sum(tile[g * z:(g + 1) * z], axis=0, keepdims=True)
             for g in range(self.P)], axis=0)

    def _expand_groups(self, x):
        """Inverse broadcast of `_group_sum`: [P, TB] -> [zp, TB], every row
        of batch group g reads x[g] (pad rows read 0)."""
        if self.z == 1 and self.zp == self.P:
            return x
        parts = [jnp.broadcast_to(x[g:g + 1], (self.z, x.shape[1]))
                 for g in range(self.P)]
        if self.zp > self.prows:
            parts.append(jnp.zeros((self.zp - self.prows, x.shape[1]),
                                   x.dtype))
        return jnp.concatenate(parts, axis=0)

    def _unroll(self, tile, s: int):
        """Inverse rotation (variable-side slot g reads check-side (g-s) mod z)."""
        return self._roll(tile, (-s) % self.z if self.z else 0)

    def _quantize(self, x):
        """STE quantizer forward in real LLR units (train-kernel path)."""
        step, clip = qms_grid(self.cfg.q_bit)
        return jnp.clip(jnp.round(x * (1.0 / step)) * step, -clip, clip)

    def _quantize_s(self, x):
        """STE quantizer forward in pre-scaled units: round to the integer
        grid and clamp.  Bit-exact vs round(x/step)*step then clip — the
        power-of-two pre-scale commutes with IEEE rounding."""
        # perf-attribution diagnostic ONLY (breaks numerics): measure the
        # kernel with the quantize chain reduced to a clamp
        if os.environ.get("LDPC_KERNEL_NOQUANT") == "1":
            return jnp.clip(x, -self.qclip_s, self.qclip_s)
        return jnp.clip(jnp.round(x), -self.qclip_s, self.qclip_s)

    def _mag_clip(self, x):
        """Message clip/quantize for the V->C update (step 3), where ``x``
        is ALWAYS a channel-plus-messages sum.

        Round-5 attribution measured the STE round chains at 31% of the
        decode step (benchmarks/runs/round5/ATTRIBUTION.json), and this is
        the E-sized one — but here the round is provably the identity:
        under QMS every addend of ``x`` is already on the quantizer grid
        (the channel tile is quantized at kernel entry or at the step-1
        weighting, and every C->V message passed through `_weighted_mag`'s
        round), sums of grid points are exact in f32 at these magnitudes,
        and round-to-nearest-even of a grid point is itself.  So the STE
        quantize collapses to its clamp.  Bit-exactness is pinned by the
        kernel-vs-scan parity suites."""
        if self.cfg.decoding_type == QMS:
            if self.prescaled:       # grid = integers
                return jnp.clip(x, -self.qclip_s, self.qclip_s)
            step, clip = qms_grid(self.cfg.q_bit)   # grid = step multiples
            return jnp.clip(x, -clip, clip)
        return jnp.clip(x, -self.cfg.clip_llr, self.cfg.clip_llr)

    def _weighted_mag(self, wmag):
        """ReLU + clip/quantize of a weighted CN magnitude (reference
        308-313).  wmag's ReLU and the quantizer's lower clamp merge into
        one clamp-to-[0, clip]: max(x,0) commutes with round."""
        if self.cfg.decoding_type == QMS:
            if self.prescaled:
                if os.environ.get("LDPC_KERNEL_NOQUANT") == "1":
                    return jnp.clip(wmag, 0.0, self.qclip_s)
                return jnp.clip(jnp.round(wmag), 0.0, self.qclip_s)
            step, clip = qms_grid(self.cfg.q_bit)
            return jnp.clip(jnp.round(wmag * (1.0 / step)) * step,
                            0.0, clip)
        return jnp.clip(wmag, 0.0, self.cfg.clip_llr)

    # ----- the kernel -------------------------------------------------------------

    def _kernel(self, *refs):
        cfg, spec = self.cfg, self.spec
        N, M, z, zp, E, T = self.N, self.M, self.z, self.zp, self.E, self.T
        TB = self.tb
        cn_mode, ucn_mode, vn_mode = spec.sharing
        ucn = spec.ucn_enabled
        deploy = self.mode == "deploy"

        it = iter(refs)
        llr_ref = next(it)
        w_cn_ref = next(it) if cn_mode > 0 else None
        w_ucn_ref = next(it) if ucn else None
        w_vn_ref = next(it) if vn_mode > 0 else None
        app_out = next(it)
        if deploy:
            stat_out = next(it)
            err_out = nerr_out = None
        else:
            err_out = next(it)
            nerr_out = next(it)
        c2v_scr = next(it)
        app_scr = next(it) if (ucn or deploy) else None

        sp = cfg.decoding_type == SP
        qms = cfg.decoding_type == QMS
        nudge = cfg.decoding_type in (MS, QMS)
        # messages live in pre-scaled units (see __init__); scale the LLR
        # block once on entry instead of inside every quantize.  When there
        # are no per-iteration VN weights the channel quantization is
        # iteration-invariant too, so it is also applied here once.
        pre_q = qms and vn_mode == 0
        if self.scale != 1.0 or pre_q:
            pre = llr_ref[...]
            if self.scale != 1.0:
                pre = pre * self.scale
            if pre_q:
                pre = self._quantize_s(pre)
            llr_ref[...] = pre
        inv_scale = 1.0 / self.scale  # = the grid step; exact power of two

        # valid-row mask (pad sublanes excluded from reductions); with
        # packing, rows < P*z are valid (P batch groups of z rows each)
        if zp > self.prows:
            row = jax.lax.broadcasted_iota(jnp.int32, (zp, TB), 0)
            valid = (row < self.prows).astype(jnp.float32)
        else:
            valid = None
        P_ = self.P

        c2v_scr[...] = jnp.zeros((E, zp, TB), jnp.float32)
        if app_scr is not None:
            app_scr[...] = jnp.zeros((N, zp, TB), jnp.float32)
        if self.early_stop and not deploy:
            # skipped iterations must read as "decoded" in the stat outputs
            err_out[...] = jnp.zeros_like(err_out)
            nerr_out[...] = jnp.zeros_like(nerr_out)

        def llr_tile(j):
            return llr_ref[j * zp:(j + 1) * zp, :]

        def iteration(t):
            """One full decoding iteration (steps 1-7 + APP/stat compute).

            VMEM design (round 4): the per-edge state buffer `c2v_scr` is
            updated IN PLACE through the iteration's three phases — it
            holds the previous iteration's C->V messages entering the VN
            phase, the check-aligned V->C messages between the VN and CN
            phases, and the new (VN-aligned) C->V messages afterwards.
            Each edge belongs to exactly one VN and one CN, and each phase
            reads a node's edges before overwriting them, so this is safe
            — and it collapses what used to be three live E-sized tile
            sets (state, xc dict, c2v_new dict) into one, which is what
            lets the big codes (z=64/z=72 5G) fit the 16 MiB scoped-VMEM
            budget that excluded them in round 3.

            Writes the new C->V state to `c2v_scr`; returns the per-VN APP
            tiles plus per-lane bit-error count / frame-wrong flags,
            leaving output/freeze bookkeeping to the mode-specific loop."""
            # (1) weighted (and quantized) channel input — reference 164-177
            llr_w = []
            for j in range(N):
                x = llr_tile(j)
                if vn_mode > 0:
                    wv = w_vn_ref[t, j] if vn_mode in (2, 5) else w_vn_ref[t, 0]
                    x = x * wv
                # quantized regardless of vn_mode, matching the scan backend
                # (models/nms.py step 1) and reference Main_Functions.py:176-177
                # so raw (unquantized) LLR inputs decode identically on both
                # backends (already applied on entry when vn_mode == 0)
                if qms and not pre_q:
                    x = self._quantize_s(x)
                llr_w.append(x)

            # (2) UCN detection from the previous APP — reference 180-209
            if ucn:
                is0 = (t == 0)
                pm = []  # per-bit parity +-1 tiles
                for j in range(N):
                    src = jnp.where(is0, llr_w[j], app_scr[j])
                    pm.append(1.0 - 2.0 * (src >= 0.0).astype(jnp.float32))
                u_mask = []
                for i in range(M):
                    prod = None
                    for e in self.cn_edges[i]:
                        pe = self._roll(pm[self.edge_vn[e]], self.edge_shift[e])
                        prod = pe if prod is None else prod * pe
                    u_mask.append((prod < 0.0).astype(jnp.float32))

            # (3) VN update: channel + extrinsic C->V sums — reference
            # 212-230; (4) route to check alignment (circulant shift).
            # c2v_scr[e] transitions: prev C->V  ->  check-aligned V->C.
            for j in range(N):
                edges_j = self.vn_edges[j]
                s_j = None
                for e in edges_j:
                    c = c2v_scr[e]
                    s_j = c if s_j is None else s_j + c
                tot = llr_w[j] if s_j is None else llr_w[j] + s_j
                vs = []
                for e in edges_j:
                    v = tot - c2v_scr[e]
                    v = self._mag_clip(v)
                    if nudge:
                        v = jnp.where(v == 0.0, self.eps_s, v)
                    vs.append(self._roll(v, self.edge_shift[e]))
                for e, v in zip(edges_j, vs):
                    c2v_scr[e] = v

            # (5) CN update + (6) neural weighting + (7) route back —
            # reference 231-316.  c2v_scr[e]: V->C  ->  new VN-aligned C->V.
            for i in range(M):
                edges = self.cn_edges[i]
                if sp:
                    xs = [c2v_scr[e] for e in edges]
                    tt = [jnp.where(v == 0.0, 1.0, v) for v in
                          (jnp.tanh(-0.5 * x) for x in xs)]
                    deg = len(edges)
                    fwd = [None] * deg  # product of tt[:k]
                    bwd = [None] * deg  # product of tt[k+1:]
                    acc = None
                    for k in range(deg):
                        fwd[k] = acc
                        acc = tt[k] if acc is None else acc * tt[k]
                    acc = None
                    for k in range(deg - 1, -1, -1):
                        bwd[k] = acc
                        acc = tt[k] if acc is None else tt[k] * acc
                    for k, e in enumerate(edges):
                        if fwd[k] is None:
                            p = bwd[k] if bwd[k] is not None \
                                else jnp.ones_like(tt[k])
                        elif bwd[k] is None:
                            p = fwd[k]
                        else:
                            p = fwd[k] * bwd[k]
                        p = jnp.clip(p, -1.0 + 1e-7, 1.0 - 1e-7)
                        out = -2.0 * _atanh(p)
                        y = self._weight_edge(
                            t, i, e, jnp.abs(out), jnp.sign(out),
                            w_cn_ref, w_ucn_ref,
                            u_mask[i] if ucn else None)
                        c2v_scr[e] = self._unroll(y, self.edge_shift[e])
                else:
                    # perf-attribution diagnostic ONLY (breaks numerics):
                    # elide the sequential min1/min2 reduction chain
                    nomin = os.environ.get("LDPC_KERNEL_NOMIN") == "1"
                    m1 = m2 = None
                    sgn_tot = None
                    mags, sgns = {}, {}
                    for e in edges:
                        x = c2v_scr[e]
                        # the eps nudge guarantees x != 0 for MS/QMS, so the
                        # reference's zero->sentinel guard is only needed
                        # when the nudge is off (MS_RAW)
                        a = jnp.abs(x) if nudge else \
                            jnp.where(x == 0.0, _PAD_MAG, jnp.abs(x))
                        s_ = jnp.where(x > 0.0, -1.0, 1.0)
                        mags[e], sgns[e] = a, s_
                        if m1 is None:
                            m1, m2 = a, jnp.full_like(a, _PAD_MAG)
                            sgn_tot = s_
                        elif nomin:
                            sgn_tot = sgn_tot * s_
                        else:
                            m2 = jnp.minimum(m2, jnp.maximum(m1, a))
                            m1 = jnp.minimum(m1, a)
                            sgn_tot = sgn_tot * s_
                    def store(e, y):
                        c2v_scr[e] = self._unroll(y, self.edge_shift[e])

                    self._cn_weight_store(
                        t, i, edges, m1, m2, -sgn_tot, mags, sgns,
                        w_cn_ref, w_ucn_ref, u_mask[i] if ucn else None,
                        store)

            # (8) APP + per-lane stats — reference 317-335.  The APPs are
            # returned UNCLIPPED in pre-scaled units (clipping cannot change
            # a sign, so the error stats are exact); clip + scale-back
            # happen once at whichever write actually leaves the kernel.
            # The per-lane bit-error count accumulates one [zp, TB]
            # indicator tile across VNs and does a single sublane reduction
            # per iteration instead of one per VN.
            wrong_acc = None
            apps = []
            # perf-attribution diagnostic ONLY (breaks counters): elide the
            # per-lane error-stat reduction, keep the APP sums
            nostats = os.environ.get("LDPC_KERNEL_NOSTATS") == "1"
            for j in range(N):
                app_j = None
                for e in self.vn_edges[j]:
                    c = c2v_scr[e]
                    app_j = c if app_j is None else app_j + c
                base = llr_tile(j)
                if qms and not pre_q:
                    base = self._quantize_s(base)
                app_j = base if app_j is None else base + app_j
                apps.append(app_j)
                if j < self.target and not nostats:
                    wrong = (app_j >= 0.0).astype(jnp.float32)
                    wrong_acc = wrong if wrong_acc is None \
                        else wrong_acc + wrong
            if nostats:
                wrong_acc = apps[0]
            elif valid is not None:
                wrong_acc = wrong_acc * valid
            nerr_tot = self._group_sum(wrong_acc)                 # [P, TB]
            wrong_any = (nerr_tot > 0.0).astype(jnp.float32)
            return apps, wrong_any, nerr_tot

        def write_app(j, app_j):
            a = jnp.clip(app_j, -self.clip_s, self.clip_s)
            if inv_scale != 1.0:
                a = a * inv_scale
            app_out[j * zp:(j + 1) * zp, :] = a

        def stats_step(t, final=None):
            """One iteration + stat writes.  `final`: None = write the APP
            block every call (early-stop path — the last executed iteration
            must leave its APPs behind); True/False = statically known
            last-iteration flag (unrolled loop); a traced t compares
            against T-1 at run time (fori path)."""
            apps, wrong_any, nerr_tot = iteration(t)
            if ucn:
                for j in range(N):
                    app_scr[j] = apps[j]
            if final is None or final is True:
                for j in range(N):
                    write_app(j, apps[j])
            elif final is not False:
                @pl.when(final)
                def _():
                    for j in range(N):
                        write_app(j, apps[j])
            err_out[pl.ds(t * P_, P_), :] = wrong_any
            nerr_out[pl.ds(t * P_, P_), :] = nerr_tot
            return wrong_any

        if deploy:
            def synd_ok(apps):
                """[P, TB] 1.0 where the hard decisions satisfy every lifted
                parity check (the real early-termination test a deployed
                decoder runs — no genie / codeword knowledge)."""
                pm = [1.0 - 2.0 * (a >= 0.0).astype(jnp.float32) for a in apps]
                unsat = None
                for i in range(M):
                    prod = None
                    for e in self.cn_edges[i]:
                        pe = self._roll(pm[self.edge_vn[e]], self.edge_shift[e])
                        prod = pe if prod is None else prod * pe
                    bad = (prod < 0.0).astype(jnp.float32)
                    if valid is not None:
                        bad = bad * valid
                    s_ = self._group_sum(bad)
                    unsat = s_ if unsat is None else unsat + s_
                return (unsat == 0.0).astype(jnp.float32)

            # Per-lane running stats live in the stat_out VMEM ref (rows
            # [0,P) err, [P,2P) nerr, [2P,3P) iters, [3P,4P) run-mask) —
            # vector while_loop carries trip Mosaic relayout between
            # replicated inits and lane-varying body outputs, so the carry
            # holds only scalars.
            stat_out[...] = jnp.zeros((self.stat_rows, TB), jnp.float32)
            stat_out[3 * P_:4 * P_, :] = jnp.ones((P_, TB), jnp.float32)

            def cond(carry):
                t, nrun = carry
                return jnp.logical_and(t < T, nrun > 0.0)

            def dbody(carry):
                t, _ = carry
                run = stat_out[3 * P_:4 * P_, :]          # [P, TB]
                apps, wrong_any, nerr_tot = iteration(t)
                # freeze each lane's outputs at its own stop iteration
                run_rows = self._expand_groups(run)
                for j in range(N):
                    a = jnp.clip(apps[j], -self.clip_s, self.clip_s)
                    app_scr[j] = jnp.where(run_rows > 0.0, a, app_scr[j])
                keep = 1.0 - run
                stat_out[0:P_, :] = run * wrong_any + keep * stat_out[0:P_, :]
                stat_out[P_:2 * P_, :] = (run * nerr_tot
                                          + keep * stat_out[P_:2 * P_, :])
                stat_out[2 * P_:3 * P_, :] = stat_out[2 * P_:3 * P_, :] + run
                run = run * (1.0 - synd_ok(apps))
                stat_out[3 * P_:4 * P_, :] = run
                return t + 1, jnp.sum(run)

            jax.lax.while_loop(cond, dbody, (0, jnp.float32(P_ * TB)))
            for j in range(N):
                a = app_scr[j]
                if inv_scale != 1.0:
                    a = a * inv_scale
                app_out[j * zp:(j + 1) * zp, :] = a
        elif self.early_stop:
            def cond(carry):
                t, still_wrong = carry
                return jnp.logical_and(t < T, jnp.sum(still_wrong) > 0.0)

            def wbody(carry):
                t, still_wrong = carry
                return t + 1, still_wrong * stats_step(t)

            jax.lax.while_loop(cond, wbody,
                               (0, jnp.ones((P_, TB), jnp.float32)))
        elif self.unroll >= T:
            # fully static iteration loop: weight reads/stat stores become
            # static offsets and Mosaic schedules across iterations
            for t in range(T):
                stats_step(t, final=(t == T - 1))
        else:
            jax.lax.fori_loop(
                0, T, lambda t, c: (stats_step(t, final=(t == T - 1)), c)[1],
                0, unroll=self.unroll)

    def _eps_fix(self, mg):
        """Reference's sentinel un-mapping (`Main_Functions.py:250`);
        mg >= 0 always (a min of absolute values or _PAD_MAG), so the
        reference's |mg| test needs no abs."""
        return jnp.where(mg <= self.eps_s, mg - self.eps_s, mg)

    def _check_weight_eff(self, t, i, e0, w_cn_ref, w_ucn_ref, u_i):
        """Effective CN weight for one check under per-check/scalar sharing
        (cn_mode 0/2/3/5): a scalar, or a [zp, TB] tile when UCN blending
        is on.  `e0` is any edge of the check (unused by these modes)."""
        cn_mode = self.spec.sharing[0]
        if cn_mode == 0:
            return None
        w = self._read_cn_w(w_cn_ref, t, i, e0, cn_mode)
        if u_i is not None:
            wu = self._read_cn_w(w_ucn_ref, t, i, e0, self.spec.sharing[1])
            w = w * (1.0 - u_i) + wu * u_i
        return w

    def _cn_weight_store(self, t, i, edges, m1, m2, neg_tot, amag, sgn,
                         w_cn_ref, w_ucn_ref, u_i, store):
        """Neural weighting + sign re-attach for every edge of one check;
        `store(e, y)` receives the weighted check-aligned output.

        For per-check/scalar/absent weights (cn_mode 0/2/3/5) every edge of
        the check shares one weight, so the whole eps-fix -> weight -> ReLU
        -> clip/quantize chain runs ONCE per check on the two candidate
        magnitudes (min1/min2) and each edge just selects its extrinsic and
        re-attaches its sign — elementwise chains commute with the select,
        so this is bit-exact vs the per-edge form (which remains for
        per-edge sharing 1/4)."""
        cn_mode = self.spec.sharing[0]
        # perf-attribution diagnostic ONLY (breaks numerics): elide the
        # neural weighting chain (weight read + blend + multiply)
        if os.environ.get("LDPC_KERNEL_NOWEIGHT") == "1":
            cn_mode = 0
        if cn_mode in (0, 2, 3, 5):
            m1f, m2f = self._eps_fix(m1), self._eps_fix(m2)
            w = None if cn_mode == 0 else \
                self._check_weight_eff(t, i, edges[0], w_cn_ref, w_ucn_ref,
                                       u_i)
            if w is None:
                m1w, m2w = m1f, m2f
            elif self.cfg.neural_mode == "offset":
                ws = w * self.scale if self.scale != 1.0 else w
                m1w, m2w = m1f - ws, m2f - ws
            else:
                m1w, m2w = m1f * w, m2f * w
            m1q = self._weighted_mag(m1w)
            m2q = self._weighted_mag(m2w)
            for e in edges:
                wmag = jnp.where(amag[e] == m1, m2q, m1q)
                store(e, wmag * (neg_tot * sgn[e]))
        else:
            for e in edges:
                mag = self._eps_fix(jnp.where(amag[e] == m1, m2, m1))
                y = self._weight_edge(t, i, e, mag, neg_tot * sgn[e],
                                      w_cn_ref, w_ucn_ref, u_i)
                store(e, y)

    def _weight_edge(self, t, i, e, mag, out_sgn, w_cn_ref, w_ucn_ref, u_i):
        """Apply CN/UCN weighting + ReLU + clip/quantize + sign re-attach
        to one edge's extrinsic magnitude (reference 267-316)."""
        cn_mode = self.spec.sharing[0]
        if cn_mode > 0:
            w = self._read_cn_w(w_cn_ref, t, i, e, cn_mode)
            if u_i is not None:
                wu = self._read_cn_w(w_ucn_ref, t, i, e, self.spec.sharing[1])
                w = w * (1.0 - u_i) + wu * u_i
            if self.cfg.neural_mode == "offset":
                # offsets are in LLR units — scale them into the kernel's
                # pre-scaled message units (scalar op, exact: power of two)
                wmag = mag - (w * self.scale if self.scale != 1.0 else w)
            else:
                wmag = mag * w
        else:
            wmag = mag
        wmag = self._weighted_mag(wmag)
        return wmag * jnp.sign(out_sgn) if self.cfg.decoding_type == SP \
            else wmag * out_sgn

    def _read_cn_w(self, ref, t, i, e, mode):
        if mode in (1, 4):      # per-edge, CN-order enumeration
            return ref[t, self.cn_order[e]]
        if mode in (2, 5):      # per check node
            return ref[t, i]
        return ref[t, 0]        # per-iteration scalar

    # ----- host-side wrapper ------------------------------------------------------

    @functools.cached_property
    def _call(self):
        N, zp, TB = self.N, self.zp, self.tb
        # stat rows: P per iteration, padded to the sublane boundary
        Tp = _round_up(self.T * self.P, 8)
        spec = self.spec
        cn_mode, _, vn_mode = spec.sharing
        deploy = self.mode == "deploy"

        in_specs = [pl.BlockSpec((N * zp, TB), lambda b: (0, b),
                                 memory_space=pltpu.VMEM)]
        w_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        if cn_mode > 0:
            in_specs.append(w_spec)
        if spec.ucn_enabled:
            in_specs.append(w_spec)
        if vn_mode > 0:
            in_specs.append(w_spec)

        out_specs = [
            pl.BlockSpec((N * zp, TB), lambda b: (0, b), memory_space=pltpu.VMEM),
        ]
        if deploy:
            out_specs.append(pl.BlockSpec((self.stat_rows, TB),
                                          lambda b: (0, b),
                                          memory_space=pltpu.VMEM))
        else:
            out_specs += [
                pl.BlockSpec((Tp, TB), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Tp, TB), lambda b: (0, b),
                             memory_space=pltpu.VMEM),
            ]
        scratch = [pltpu.VMEM((self.E, zp, TB), jnp.float32)]
        if spec.ucn_enabled or deploy:
            scratch.append(pltpu.VMEM((N, zp, TB), jnp.float32))

        flops_per_block = self.T * self.E * zp * TB * 16
        kernel = functools.partial(FusedNMSKernel._kernel, self)

        def call(llr_pad, *weights):
            B = llr_pad.shape[-1]
            grid = (B // TB,)
            out_shape = [
                jax.ShapeDtypeStruct((N * zp, B), jnp.float32),  # app (padded z)
            ]
            if deploy:
                out_shape.append(jax.ShapeDtypeStruct((self.stat_rows, B),
                                                      jnp.float32))
            else:
                out_shape += [
                    jax.ShapeDtypeStruct((Tp, B), jnp.float32),  # err flags
                    jax.ShapeDtypeStruct((Tp, B), jnp.float32),  # bit errors
                ]
            return pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=in_specs,
                out_shape=out_shape,
                out_specs=out_specs,
                scratch_shapes=scratch,
                interpret=self.interpret,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=self.vmem_limit),
                cost_estimate=pl.CostEstimate(
                    flops=flops_per_block * grid[0],
                    bytes_accessed=llr_pad.size * 8,
                    transcendentals=0),
            )(llr_pad, *weights)

        return call

    def _pack_llr(self, llr):
        """[N*z, B] -> [N*zp, B/P]: batch group g of B/P lanes lands in tile
        rows [g*z, (g+1)*z); leftover pad rows get -clip (decode as bit 0,
        never counted — the valid mask excludes them)."""
        N, z, zp, P = self.N, self.z, self.zp, self.P
        B = llr.shape[-1]
        if B % (self.tb * P) != 0:
            raise ValueError(f"batch {B} not a multiple of kernel tile "
                             f"{self.tb} x pack factor {P}")
        bl = B // P
        x = llr.reshape(N, z, P, bl).transpose(0, 2, 1, 3)
        x = x.reshape(N, P * z, bl)
        if zp > P * z:
            x = jnp.pad(x, ((0, 0), (0, zp - P * z), (0, 0)),
                        constant_values=-self.cfg.clip_llr)
        return x.reshape(N * zp, bl)

    def _unpack_app(self, app_pad):
        """[N*zp, B/P] -> [N*z, B], inverse of `_pack_llr`."""
        N, z, zp, P = self.N, self.z, self.zp, self.P
        bl = app_pad.shape[-1]
        a = app_pad.reshape(N, zp, bl)[:, :P * z, :]
        a = a.reshape(N, P, z, bl).transpose(0, 2, 1, 3)
        return a.reshape(N * z, P * bl)

    def _unpack_stats(self, rows):
        """[>=T*P, B/P] stat rows -> [T, B] (row t*P+g = iteration t of
        batch group g)."""
        T, P = self.T, self.P
        bl = rows.shape[-1]
        return rows[:T * P].reshape(T, P * bl)

    def _prep_inputs(self, stacked, llr):
        x = self._pack_llr(llr)
        weights = []
        for kind, mode in zip(("cn", "ucn", "vn"), self.spec.sharing):
            if kind == "ucn" and not self.spec.ucn_enabled:
                continue
            if mode > 0:
                weights.append(stacked[kind])
        return x, weights

    def decode_stats(self, stacked: Dict[str, Optional[jnp.ndarray]],
                     llr: jnp.ndarray):
        """llr: [N*z, B] p1/p0 channel LLRs; B must be a multiple of `tb`.

        Returns (app_last [N*z, B], err_flags [T, B] bool,
        bit_errors [T, B] int32) vs the all-zero codeword.
        """
        if self.mode != "stats":
            raise ValueError("decode_stats requires a mode='stats' kernel")
        x, weights = self._prep_inputs(stacked, llr)
        app_pad, err, nerr = self._call(x, *weights)
        return (self._unpack_app(app_pad),
                self._unpack_stats(err) > 0.5,
                self._unpack_stats(nerr).astype(jnp.int32))

    def decode_deploy(self, stacked: Dict[str, Optional[jnp.ndarray]],
                      llr: jnp.ndarray):
        """Syndrome-early-terminated decode (the deployable mode).

        Returns ``(app [N*z, B], wrong [B] bool, bit_errors [B] int32,
        iters [B] int32, detected_fail [B] bool)`` where every quantity is
        frozen at each lane's first syndrome-satisfied iteration (or at
        iteration T-1 with ``detected_fail`` set if the syndrome was never
        satisfied).  ``wrong & ~detected_fail`` are *undetected* errors
        (convergence to a wrong codeword) — the metric a deployed decoder's
        CRC layer has to catch.
        """
        if self.mode != "deploy":
            raise ValueError("decode_deploy requires a mode='deploy' kernel")
        P = self.P
        x, weights = self._prep_inputs(stacked, llr)
        app_pad, stat = self._call(x, *weights)
        app = self._unpack_app(app_pad)
        bl = stat.shape[-1]
        row = lambda i: stat[i * P:(i + 1) * P].reshape(P * bl)
        return (app, row(0) > 0.5, row(1).astype(jnp.int32),
                row(2).astype(jnp.int32), row(3) > 0.5)
