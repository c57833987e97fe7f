"""Neural min-sum (NMS) message-passing decoder as a `lax.scan` over iterations.

Re-design of the reference's unrolled TF1 decoder graph
(`Main_Functions.py:157-385`, one Python-built graph layer per iteration):

* one scan step = one decoding iteration (VN update -> circulant routing ->
  CN min/sign or sum-product update -> CN/UCN/VN neural weighting -> APP);
* Tanner-graph routing is two static row gathers (see codes/graph.py), not
  dense [E*z, E*z] lift matmuls;
* check-node extrinsic min/sign (and sum-product extrinsic tanh-product) use
  exclusive forward/backward cumulative scans over the padded check-degree
  axis instead of the reference's O(E^2) tile-mask trick
  (`Main_Functions.py:231-254`);
* the Monte-Carlo batch is the trailing axis (TPU lane dimension), so the
  whole decoder is trivially data-parallel under shard_map/pjit.

Semantics parity notes (the sign-convention minefield, SURVEY.md section 2.4):
LLRs are log(p1/p0) — positive LLR means bit 1; hard decision / bit error is
``APP >= 0`` against the all-zero codeword; the CN sign recursion is
``out_sign = -prod_extrinsic(where(v2c > 0, -1, +1))``; zero-magnitude
messages are nudged to 1e-4 before the extrinsic min and squashed back after
(reference `Main_Functions.py:229-250`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ldpc_error_floor_tpu.codes.graph import TannerGraph
from ldpc_error_floor_tpu.codes.protograph import Code
from ldpc_error_floor_tpu.models.weights import Params, WeightSpec, stack_weights
from ldpc_error_floor_tpu.ops.ste import clip_tf_grad, quantize_ste

# decoding types, matching the reference's `decoding_type` codes
SP = 0   # sum-product (tanh/atanh)
MS = 1   # min-sum with zero-message epsilon handling
QMS = 2  # quantized min-sum (STE quantizer)
MS_RAW = 3  # min-sum without the zero-message epsilon nudge

_PAD_MAG = 1.0e4  # magnitude sentinel excluded from extrinsic mins
_EPS_MSG = 1.0e-4  # zero-message nudge


@dataclass(frozen=True)
class DecoderConfig:
    """Static decoder configuration (everything that shapes the jitted graph)."""

    decoding_type: int = QMS
    q_bit: int = 5
    clip_llr: float = 20.0
    neural_mode: str = "scale"  # 'scale': multiplicative CN/UCN weights (the
    #   reference's NMS, Main_Functions.py:267-316); 'offset': trainable
    #   additive offsets, wmag = relu(mag - beta) — neural offset min-sum
    #   (arXiv:1701.05931), the variant fixed-point hardware prefers.  Uses
    #   the same sharing/UCN machinery; VN weights stay multiplicative.
    target_node: int = 0  # >0: restrict outputs/metrics to first `target_node`
    #                        proto columns (systematic option, main_Base.py:29)
    remat: bool = False  # checkpoint each scan step (for deep training runs)
    unroll: int = 1  # lax.scan unroll factor: >1 lets XLA fuse across
    #   decoding iterations (fewer HBM round-trips of the carry) at the
    #   cost of a bigger program; the fused Pallas kernel is the forward-
    #   only extreme of the same idea
    track_syndrome: bool = False  # also emit per-iteration syndrome-satisfied flags
    backend: str = "xla"  # "xla" (lax.scan, differentiable) or "pallas" (fused
    #                        VMEM-resident kernel for collect='stats', fwd-only)
    pallas_tb: int = 256  # batch lanes per Pallas kernel tile
    pallas_early_stop: bool = False  # stop a tile once all lanes have decoded
    #   correctly at least once; genie-FER/uncor exact, FER_last then refers
    #   to the stop iteration (see ops/pallas_decoder.py)
    pallas_app_t0: int = 0  # fused-train APP window: the train kernel
    #   emits/streams per-iteration APPs only for t >= pallas_app_t0
    #   (collect='apps' then returns [T - t0, target*z, B]).  The training
    #   pipeline sets t0 = T-1 when eta is statically 0 (last-iteration
    #   loss): iterations below the window have structurally-zero APP
    #   cotangents, so gradients are bit-identical while the APP stack
    #   HBM traffic (~1.5 GB/step at batch 32k) drops by T x

    def __post_init__(self):
        if self.decoding_type not in (SP, MS, QMS, MS_RAW):
            raise ValueError(f"bad decoding_type {self.decoding_type}")
        if self.neural_mode not in ("scale", "offset"):
            raise ValueError(f"bad neural_mode {self.neural_mode!r}")
        if self.backend not in ("xla", "pallas"):
            raise ValueError(f"bad backend {self.backend!r}")
        if self.backend == "pallas" and self.track_syndrome:
            raise ValueError("track_syndrome requires the xla backend")


class DecodeResult(NamedTuple):
    app_last: jnp.ndarray                 # [N*z, B] final-iteration APP LLRs
    err_flags: Optional[jnp.ndarray]      # [T, B] bool — frame wrong at iter t
    bit_errors: Optional[jnp.ndarray]     # [T, B] int32 — bit errors at iter t
    apps: Optional[jnp.ndarray]           # [T, target*z, B] per-iteration APPs
    syndrome_ok: Optional[jnp.ndarray]    # [T, B] bool — H*bits == 0 at iter t

    @property
    def uncor_mask(self) -> jnp.ndarray:
        """[B] bool — wrong at *every* iteration (the genie-FER failure flag,
        reference `Print_Functions.py:105-111`)."""
        return jnp.all(self.err_flags, axis=0)


class DeployResult(NamedTuple):
    """Per-frame results of a syndrome-early-terminated ("deploy") decode.

    Every field is frozen at the frame's first iteration whose hard
    decisions satisfy H*x == 0 (or at iteration T-1 with `detected_fail`
    set if the syndrome was never satisfied).  This is the deployable
    early-termination the reference lacks — its genie-FER stops on codeword
    knowledge (`Print_Functions.py:105-111`), which no real decoder has.
    """

    app: jnp.ndarray            # [N*z, B] APP LLRs at the stop iteration
    wrong: jnp.ndarray          # [B] bool — frame wrong at its stop iteration
    bit_errors: jnp.ndarray     # [B] int32 — bit errors at its stop iteration
    iters: jnp.ndarray          # [B] int32 — iterations executed
    detected_fail: jnp.ndarray  # [B] bool — syndrome never satisfied

    @property
    def undetected(self) -> jnp.ndarray:
        """[B] bool — converged to a *wrong* codeword (CRC territory)."""
        return jnp.logical_and(self.wrong, jnp.logical_not(self.detected_fail))


@jax.custom_vjp
def _extrinsic_min_slots(amag: jnp.ndarray) -> jnp.ndarray:
    """Per-slot extrinsic min over axis 1: out[.., d, ..] = min over j != d of
    amag[.., j, ..].  Forward uses the cheap min1/min2 construction; backward
    reproduces the reference's `tf.reduce_min` gradient over the masked
    [E, E] tile (`Main_Functions.py:248-250`), which SPLITS the gradient
    EQUALLY AMONG TIES.  Ties are the common case under QMS (values live on
    a 0.5-step grid), so tie handling is part of training parity — verified
    against executed-reference gradients in tests/test_reference_trace.py."""
    return _ext_min_fwd(amag)


def _ext_min_fwd(amag):
    m1 = jnp.min(amag, axis=1, keepdims=True)
    i1 = jnp.argmin(amag, axis=1)
    slot = jnp.arange(amag.shape[1]).reshape((1, -1) + (1,) * (amag.ndim - 2))
    is_first = slot == i1[:, None]
    m2 = jnp.min(jnp.where(is_first, _PAD_MAG, amag), axis=1, keepdims=True)
    return jnp.where(is_first, m2, m1)


def _ext_min_vjp_fwd(amag):
    return _ext_min_fwd(amag), amag


def _ext_min_vjp_bwd(amag, g):
    m1 = jnp.min(amag, axis=1, keepdims=True)
    i1 = jnp.argmin(amag, axis=1)
    slot = jnp.arange(amag.shape[1]).reshape((1, -1) + (1,) * (amag.ndim - 2))
    is_first = slot == i1[:, None]
    m2 = jnp.min(jnp.where(is_first, _PAD_MAG, amag), axis=1, keepdims=True)
    is_m1 = amag == m1
    is_m2 = amag == m2
    c1 = jnp.sum(is_m1, axis=1, keepdims=True).astype(g.dtype)
    c2 = jnp.maximum(jnp.sum(is_m2, axis=1, keepdims=True), 1).astype(g.dtype)
    g_above = jnp.sum(jnp.where(is_m1, 0.0, g), axis=1, keepdims=True)
    g_min = jnp.sum(jnp.where(is_m1, g, 0.0), axis=1, keepdims=True)
    multi = c1 > 1.0
    # slots tied at m1: each of the other c1-1 tied rows selects this slot
    # (weight 1/(c1-1)); every strictly-larger row selects all c1 tied slots
    # (weight 1/c1).  Unique-min slot: selected once by every other row.
    tied_recv = jnp.where(multi,
                          g_above / c1 +
                          (g_min - g) / jnp.maximum(c1 - 1.0, 1.0),
                          g_above)
    # slots at m2 matter only when the min is unique (its own row selects them)
    m2_recv = jnp.where(multi, 0.0, g_min / c2)
    out = jnp.where(is_m1, tied_recv, jnp.where(is_m2, m2_recv, 0.0))
    return (out,)


_extrinsic_min_slots.defvjp(_ext_min_vjp_fwd, _ext_min_vjp_bwd)


def _perm_router(idx_fwd: jnp.ndarray, idx_bwd: jnp.ndarray):
    """Row gather ``y = x_pad[idx_fwd]`` whose backward is the *inverse
    gather* (``idx_bwd``) instead of XLA's default scatter-add.

    Valid because the two lifted routing maps (codes/graph.py cn_in_idx /
    vn_in_idx) are mutual inverse permutations on real edge slots: each real
    row is read by exactly one output slot, structural pads read the
    sentinel (last) row, and the sentinel's primal is a constant zero
    concat — so its (dropped) cotangent never reaches a differentiable
    input.  TPU scatters serialize on the sparse core / VPU; this keeps the
    whole decoder backward as vectorized gathers."""

    @jax.custom_vjp
    def route(x_pad):
        return x_pad[idx_fwd]

    def fwd(x_pad):
        return x_pad[idx_fwd], None

    def bwd(_, g):
        zero = jnp.zeros((1,) + g.shape[1:], g.dtype)
        g_pad = jnp.concatenate([g, zero], axis=0)
        cot = g_pad[idx_bwd]
        return (jnp.concatenate([cot, zero], axis=0),)

    route.defvjp(fwd, bwd)
    return route


def _extrinsic_prod(x: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """For each slot d: product over all other slots along `axis` (identity 1)."""
    ident = jnp.ones_like(lax.slice_in_dim(x, 0, 1, axis=axis))
    inc_f = lax.cumprod(x, axis=axis)
    inc_b = lax.cumprod(x, axis=axis, reverse=True)
    f = jnp.concatenate([ident, lax.slice_in_dim(inc_f, 0, x.shape[axis] - 1,
                                                 axis=axis)], axis=axis)
    b = jnp.concatenate([lax.slice_in_dim(inc_b, 1, x.shape[axis], axis=axis),
                         ident], axis=axis)
    return f * b


class NMSDecoder:
    """Weighted/neural min-sum decoder over a lifted QC-LDPC Tanner graph.

    The decoder is functional: `decode(params, llr)` where `llr` is
    ``[N*z, B]`` (batch last = TPU lanes) of p1/p0 channel LLRs.
    """

    def __init__(self, code: Code, cfg: DecoderConfig, spec: WeightSpec,
                 graph: Optional[TannerGraph] = None):
        self.code = code
        self.cfg = cfg
        self.spec = spec
        self.graph = graph if graph is not None else TannerGraph(code)
        g = self.graph
        self.N, self.M, self.z = code.N, code.M, code.z
        self.Dv, self.Dc = g.Dv, g.Dc
        self.target = cfg.target_node if cfg.target_node > 0 else self.N
        # device-side index maps (jit constants)
        self._cn_in = jnp.asarray(g.cn_in_idx)
        self._vn_in = jnp.asarray(g.vn_in_idx)
        self._cn_vn = jnp.asarray(g.cn_vn_idx)
        self._cn_edge_idx = jnp.asarray(g.cn_slot_edge_idx)
        # scatter-free routing (backward = the inverse permutation's gather)
        self._route_cn = _perm_router(self._cn_in, self._vn_in)
        self._route_vn = _perm_router(self._vn_in, self._cn_in)
        self._fused = None  # lazily-built Pallas kernels (backend='pallas')
        self._fused_deploy = None
        self._fused_train = None
        self._decode_jit = jax.jit(self._decode_impl,
                                   static_argnames=("collect",))

    # ----- weight broadcasting -------------------------------------------------
    def _cn_weight(self, w_t: jnp.ndarray, mode: int) -> jnp.ndarray:
        """Per-iteration CN/UCN weight row -> broadcastable [M, Dc, 1, 1]."""
        if mode in (1, 4):       # per-edge (CN order)
            w = w_t[self._cn_edge_idx]                       # [M, Dc]
        elif mode in (2, 5):     # per check node
            w = w_t[:, None]                                 # [M, 1]
        else:                    # per-iteration scalar
            w = w_t[0][None, None]                           # [1, 1]
        return w[:, :, None, None]

    def _vn_weight(self, llr3: jnp.ndarray, w_t: Optional[jnp.ndarray]) -> jnp.ndarray:
        mode = self.spec.sharing[2]
        if mode == 0 or w_t is None:
            return llr3
        if mode in (2, 5):
            return llr3 * w_t[:, None, None]
        return llr3 * w_t[0]

    # ----- public API -----------------------------------------------------------
    def decode(self, params: Params, llr: jnp.ndarray,
               labels: Optional[jnp.ndarray] = None,
               collect: str = "stats") -> DecodeResult:
        """Run `spec.n_iters` decoding iterations.

        collect: 'stats' (per-iteration error flags + bit-error counts),
        'apps' (per-iteration APP stacks for training losses),
        'app_last' (final APP only), or 'deploy' (syndrome-based per-frame
        early termination — returns a `DeployResult`).
        """
        stacked = stack_weights(self.spec, params)
        if labels is None:
            labels = jnp.zeros((self.target * self.z, llr.shape[-1]), jnp.float32)
        return self._decode_jit(stacked, llr, labels, collect=collect)

    def apply(self, params: Params, llr: jnp.ndarray,
              labels: Optional[jnp.ndarray] = None,
              collect: str = "apps") -> DecodeResult:
        """Un-jitted `decode` for composition inside larger jitted/grad'd
        computations (training steps, shard_map bodies)."""
        stacked = stack_weights(self.spec, params)
        if labels is None:
            labels = jnp.zeros((self.target * self.z, llr.shape[-1]), jnp.float32)
        return self._decode_impl(stacked, llr, labels, collect=collect)

    # ----- implementation --------------------------------------------------------
    def _decode_impl(self, stacked: Dict[str, Optional[jnp.ndarray]],
                     llr: jnp.ndarray, labels: jnp.ndarray,
                     collect: str) -> DecodeResult:
        cfg, spec = self.cfg, self.spec
        if cfg.backend == "pallas" and collect in ("stats", "app_last"):
            # fused VMEM-resident kernel; stats are vs the all-zero codeword
            # (the only case the Monte-Carlo engine / harvester exercise)
            from ldpc_error_floor_tpu.ops.pallas_decoder import FusedNMSKernel
            if self._fused is None:
                self._fused = FusedNMSKernel(self.graph, cfg, spec,
                                             tb=cfg.pallas_tb,
                                             early_stop=cfg.pallas_early_stop)
            app, err, nerr = self._fused.decode_stats(stacked, llr)
            if collect == "app_last":
                return DecodeResult(app, None, None, None, None)
            return DecodeResult(app, err, nerr, None, None)
        if cfg.backend == "pallas" and collect == "deploy":
            from ldpc_error_floor_tpu.ops.pallas_decoder import FusedNMSKernel
            if self._fused_deploy is None:
                self._fused_deploy = FusedNMSKernel(self.graph, cfg, spec,
                                                    tb=cfg.pallas_tb,
                                                    mode="deploy")
            return DeployResult(*self._fused_deploy.decode_deploy(stacked, llr))
        if cfg.backend == "pallas" and collect == "apps":
            # fused differentiable path (custom VJP; ops/pallas_train.py) —
            # the training-throughput twin of the stats kernel
            from ldpc_error_floor_tpu.ops.pallas_train import FusedTrainKernel
            if self._fused_train is None:
                self._fused_train = FusedTrainKernel(self.graph, cfg, spec,
                                                     tb=cfg.pallas_tb)
            apps = self._fused_train.apps(stacked, llr)
            # NOTE: on this path `app_last` is the TARGET-RESTRICTED final
            # APP ([target*z, B]) because the kernel only streams target
            # columns, while the scan collect='apps' path returns the full
            # [N*z, B] APP.  Training consumers read `.apps` only; anything
            # needing the full APP under systematic targets must use the
            # scan backend or collect='app_last'.
            return DecodeResult(apps[-1], None, None, apps, None)
        N, M, z, Dv, Dc = self.N, self.M, self.z, self.Dv, self.Dc
        B = llr.shape[-1]
        T = spec.n_iters
        qms = cfg.decoding_type == QMS
        llr3 = llr.reshape(N, z, B)
        llr_app = quantize_ste(llr3, cfg.q_bit) if qms else llr3
        labels_t = labels.astype(jnp.float32)

        xs: Dict[str, jnp.ndarray] = {"t": jnp.arange(T)}
        for kind in ("cn", "ucn", "vn"):
            if stacked[kind] is not None:
                xs[kind] = stacked[kind]

        zero_row = jnp.zeros((1, B), jnp.float32)

        def step(carry, x):
            y_prev, prev_bits, _ = carry
            t = x["t"]

            # (1) weighted (and quantized) channel input — reference 164-177
            llr_w = self._vn_weight(llr3, x.get("vn"))
            if qms:
                llr_w = quantize_ste(llr_w, cfg.q_bit)

            # (2) UCN detection from previous iteration's APP — reference 180-209
            if spec.ucn_enabled:
                cur_bits = (llr_w.reshape(N * z, B) >= 0).astype(jnp.float32)
                bits_src = jnp.where(t == 0, cur_bits, prev_bits)
                bits_pad = jnp.concatenate([bits_src, zero_row], axis=0)
                pm = 1.0 - 2.0 * bits_pad[self._cn_vn].reshape(M, Dc, z, B)
                u = (jnp.prod(pm, axis=1) < 0).astype(jnp.float32)[:, None]  # [M,1,z,B]
            else:
                u = None

            # (3) VN update: extrinsic sum of C->V + channel — reference 212-230
            s_prev = jnp.sum(y_prev, axis=1)                     # [N, z, B]
            v2c = llr_w[:, None] + s_prev[:, None] - y_prev      # [N, Dv, z, B]
            if qms:
                v2c = quantize_ste(v2c, cfg.q_bit)
            else:
                v2c = clip_tf_grad(v2c, -cfg.clip_llr, cfg.clip_llr)
            if cfg.decoding_type in (MS, QMS):
                # additive form: forward 0 -> eps, backward gradient 1
                # (reference Main_Functions.py:230 adds eps*(1-indicator);
                # a where() would zero the gradient at exact zeros, which
                # QMS hits constantly)
                v2c = v2c + _EPS_MSG * (v2c == 0.0).astype(jnp.float32)

            # (4) route to check-node-major arrangement (circulant shifts)
            v2c_flat = jnp.concatenate([v2c.reshape(N * Dv * z, B), zero_row], 0)
            xc = self._route_cn(v2c_flat).reshape(M, Dc, z, B)

            # (5) CN update — reference 231-263
            if cfg.decoding_type == SP:
                tt = jnp.tanh(-0.5 * xc)
                # structural pads & zeros -> 1 (additive, gradient 1,
                # matching reference Main_Functions.py:241)
                tt = tt + (tt == 0.0).astype(jnp.float32)
                prod = _extrinsic_prod(tt)
                prod = jnp.clip(prod, -1.0 + 1e-7, 1.0 - 1e-7)
                out = -2.0 * jnp.arctanh(prod)
                mag = jnp.abs(out)
            else:
                amag = jnp.abs(xc) + _PAD_MAG * (xc == 0.0).astype(jnp.float32)
                sgn = jnp.where(xc > 0.0, -1.0, 1.0)
                # extrinsic min with the reference's tie-splitting backward
                mag = _extrinsic_min_slots(amag)
                mag = jnp.where(jnp.abs(mag) <= _EPS_MSG, mag - _EPS_MSG, mag)
                # extrinsic sign product = total product * own sign (sgn^2=1)
                out = mag * (-(jnp.prod(sgn, axis=1, keepdims=True) * sgn))

            # (6) neural CN/UCN weighting + ReLU + clip/quantize — reference 267-316
            cn_mode = spec.sharing[0]
            if cn_mode == 0:
                wmag = mag
            else:
                w = self._cn_weight(x["cn"], cn_mode)
                if spec.ucn_enabled:
                    w_u = self._cn_weight(x["ucn"], spec.sharing[1])
                    w = w * (1.0 - u) + w_u * u
                wmag = mag - w if cfg.neural_mode == "offset" else mag * w
            wmag = wmag * (wmag > 0.0)
            if qms:
                wmag = quantize_ste(wmag, cfg.q_bit)
            else:
                wmag = clip_tf_grad(wmag, -cfg.clip_llr, cfg.clip_llr)
            c2v = wmag * jnp.sign(out)

            # (7) route back to variable-node-major arrangement
            c2v_flat = jnp.concatenate([c2v.reshape(M * Dc * z, B), zero_row], 0)
            y = self._route_vn(c2v_flat).reshape(N, Dv, z, B)

            # (8) APP and hard decisions — reference 317-335
            app = clip_tf_grad(llr_app + jnp.sum(y, axis=1), -cfg.clip_llr,
                               cfg.clip_llr)                      # [N, z, B]
            app_flat = app.reshape(N * z, B)
            bits = (app_flat >= 0.0).astype(jnp.float32)

            app_target = app_flat[: self.target * z]
            if collect == "apps":
                ys = app_target
            elif collect in ("stats", "deploy"):
                wrong = (app_target >= 0.0) != (labels_t >= 0.5)
                nerr = jnp.sum(wrong, axis=0).astype(jnp.int32)
                ys = (jnp.any(wrong, axis=0), nerr)
                if cfg.track_syndrome or collect == "deploy":
                    bits_pad2 = jnp.concatenate([bits, zero_row], axis=0)
                    pm2 = 1.0 - 2.0 * bits_pad2[self._cn_vn].reshape(M, Dc, z, B)
                    synd_ok = jnp.all(jnp.prod(pm2, axis=1) > 0, axis=(0, 1))
                    ys = ys + (synd_ok,)
                if collect == "deploy":
                    ys = ys + (app_flat,)
            else:
                ys = ()
            return (y, bits, app_flat), ys

        if cfg.remat:
            step = jax.checkpoint(step)

        carry0 = (jnp.zeros((N, Dv, z, B), jnp.float32),
                  jnp.zeros((N * z, B), jnp.float32),
                  jnp.zeros((N * z, B), jnp.float32))
        (_, _, app_last), ys = lax.scan(step, carry0, xs,
                                        unroll=min(cfg.unroll, T))

        if collect == "apps":
            return DecodeResult(app_last, None, None, ys, None)
        if collect == "stats":
            synd = ys[2] if cfg.track_syndrome else None
            return DecodeResult(app_last, ys[0], ys[1], None, synd)
        if collect == "deploy":
            # per-frame stop at the first syndrome-satisfied iteration —
            # the scan-backend twin of the kernel's deploy mode (keeps the
            # [T, N*z, B] APP stack live; for production batches use
            # backend='pallas', which freezes in VMEM instead)
            errf, nerrf, synd, apps_full = ys
            any_ok = jnp.any(synd, axis=0)
            first = jnp.argmax(synd, axis=0)
            idx = jnp.where(any_ok, first, T - 1)
            take = lambda a: jnp.take_along_axis(a, idx[None], axis=0)[0]
            idx3 = jnp.broadcast_to(idx[None, None],
                                    (1,) + apps_full.shape[1:])
            app_stop = jnp.take_along_axis(apps_full, idx3, axis=0)[0]
            return DeployResult(app_stop, take(errf),
                                take(nerrf).astype(jnp.int32),
                                jnp.where(any_ok, first + 1, T).astype(jnp.int32),
                                jnp.logical_not(any_ok))
        return DecodeResult(app_last, None, None, None, None)
