"""Fused differentiable Pallas training path for the NMS decoder.

Round 2 measured a 14x gap between the forward-only fused decode kernel
(2.37M cw/s) and the differentiable `lax.scan` training path (173k trained
cw/s): the scan's forward+backward streams every [N*Dv*z, B] message tensor
through HBM twice per decoding iteration.  This module closes the gap with
a custom-VJP pair of Pallas kernels:

* **forward** — the same VMEM-resident iteration loop as
  `ops/pallas_decoder.py`, but per iteration it also streams (a) the
  PRE-clip APP stack (the loss input after a host-side clip, and the
  backward's inclusive clip_tf_grad mask source — sparing the backward a
  full weighting recompute), (b) the PRE-clip V->C messages of the
  iteration's VN phase (the backward's clip-mask source and xc recompute
  seed), and (c) per-check residuals — min1, min2, the extrinsic sign
  product, and the UCN mask when enabled (round 5: these spare the
  backward the sequential min1/min2 reduction, the VN-phase sum
  recompute, and the whole UCN APP/parity recompute) — to HBM with
  overlapped async DMA.  HBM traffic: one LLR read + T state/APP/residual
  tiles, vs the scan's ~2T full-graph round trips.
* **backward** — loops t = T-1..0, DMAs in the iteration-t pre-clip V->C
  state, per-check residuals and the APP cotangent, re-derives the cheap
  elementwise intermediates (|xc|, signs) in VMEM, and applies the exact
  gradient semantics of the scan backend (`models/nms.py`), which were
  themselves verified against *executed-reference* TF gradients
  (tests/test_reference_trace.py):

  - tie-splitting extrinsic-min VJP (`_ext_min_vjp_bwd` — the reference's
    `tf.reduce_min` gradient over the masked [E, E] tile,
    `Main_Functions.py:248-250`, splits gradient equally among ties);
  - STE quantizer gradient: identity for |x| <= clip INCLUSIVE
    (`Main_Functions.py:463-494` via TF clip_by_value);
  - `clip_tf_grad` inclusive-bound clip gradients (V->C messages and APP);
  - ReLU subgradient 0 at 0 (`wmag * (wmag > 0)`);
  - the zero-message epsilon nudge as an additive (gradient-1) op;
  - UCN masks and hard decisions treated as constants (sign/compare ops).

  Weight gradients (the only trainable inputs — a few hundred scalars) are
  reduced on-chip: per-iteration lane-vector accumulators in VMEM,
  accumulated across batch-tile grid steps in the output block.

The channel LLR input gets a zero cotangent (training never differentiates
the data), so the backward kernel emits only the [T, dim] weight grads.

Supported: SP / MS / QMS / MS_RAW decoding (SP fused since round 5 — the
tanh/atanh check update with a prefix-product VJP, `_sp_check_bwd`), all
sharing modes 0-5 incl. UCN and temporal rows (temporal row-sharing is
handled outside by the `stack_weights` take-VJP), 'scale' and 'offset'
neural modes, systematic targets.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ldpc_error_floor_tpu.codes.graph import TannerGraph
from ldpc_error_floor_tpu.models.nms import (MS, MS_RAW, QMS, SP,
                                             DecoderConfig, _EPS_MSG,
                                             _PAD_MAG)
from ldpc_error_floor_tpu.models.weights import WeightSpec
from ldpc_error_floor_tpu.ops.pallas_decoder import (FusedNMSKernel,
                                                     _atanh, _round_up)
from ldpc_error_floor_tpu.ops.ste import qms_grid


class FusedTrainKernel(FusedNMSKernel):
    """Custom-VJP fused decode for training: ``apps(stacked, llr)`` returns
    the per-iteration APP stack [T, target*z, B] and is differentiable wrt
    the stacked per-iteration weights (cotangent zero wrt llr)."""

    def __init__(self, graph: TannerGraph, cfg: DecoderConfig,
                 spec: WeightSpec, tb: int = 128,
                 interpret: Optional[bool] = None):
        # prescale=False: the train kernels keep messages in real LLR units
        # (their VJP residuals and cotangents are defined in LLR units)
        super().__init__(graph, cfg, spec, tb=tb, interpret=interpret,
                         mode="stats", prescale=False)
        # DMA-overlap variants (round 4): the per-iteration HBM streams
        # (forward's state checkpoint + APP stack, backward's hist/pre/gapp
        # reads) are ~1 MB per iteration per grid step — comparable to the
        # iteration's compute time — so each kernel double-buffers them
        # whenever the footprint can be compiled (raising Mosaic's 16 MiB
        # default scoped limit when needed, up to the physical-VMEM cap);
        # each pallas_call requests the limit its modeled footprint needs.
        from ldpc_error_floor_tpu.ops.pallas_decoder import (
            kernel_vmem_bytes, kernel_vmem_limit, vmem_fits)
        tgt = cfg.target_node if cfg.target_node > 0 else 0

        def _bytes(mode, overlap):
            return kernel_vmem_bytes(graph, tb, n_iters=spec.n_iters,
                                     mode=mode, ucn=spec.ucn_enabled,
                                     target=tgt, overlap=overlap)

        self.fwd_pp = vmem_fits(_bytes("train_fwd", True))
        self.bwd_db = vmem_fits(_bytes("train_bwd", True))
        self.fwd_vmem_limit = kernel_vmem_limit(
            _bytes("train_fwd", self.fwd_pp))
        self.bwd_vmem_limit = kernel_vmem_limit(
            _bytes("train_bwd", self.bwd_db))
        self.dims = {}
        cn_mode, ucn_mode, vn_mode = spec.sharing
        for kind, mode in (("cn", cn_mode), ("ucn", ucn_mode),
                           ("vn", vn_mode)):
            if kind == "ucn" and not spec.ucn_enabled:
                self.dims[kind] = 0
            elif mode in (1, 4):
                self.dims[kind] = self.E
            elif mode in (2, 5):
                self.dims[kind] = self.M if kind in ("cn", "ucn") else self.N
            elif mode == 3:
                self.dims[kind] = 1
            else:
                self.dims[kind] = 0
        # per-check residual stream rows: m1, m2, neg_tot (+ u_mask).  SP
        # (round 5: fused tanh/atanh training) has no min1/min2 reduction
        # to checkpoint — it streams only the UCN masks when enabled
        if cfg.decoding_type == SP:
            self.cres_rows = self.M if spec.ucn_enabled else 0
        else:
            self.cres_rows = (4 if spec.ucn_enabled else 3) * self.M
        # Round-5 stream compression: the train pair is HBM-DMA-bound
        # (roofline: ~2.5 MB/iteration/grid-step ~ 340 GB/s), and under
        # QMS every streamed quantity is a grid point — exactly
        # representable in bf16.  The v2c checkpoint encodes (xq, STE
        # inside-bit) in ONE bf16 lane: venc = xq when |pre| <= clip
        # (inclusive, the clip_tf_grad mask), else sign(pre) * 2*clip;
        # decode: inside = |venc| <= clip, xq = clamp(venc, +-clip).
        # Exact: QMS grids are halves <= 15.5 and 2*clip <= 31, all
        # bf16-representable.  The APP stream is bf16 when its pre-clip
        # values are provably exact halves: |app| <= (Dv_max+1)*clip < 128
        # (bf16 spacing is 0.5 up to 128).
        self.enc_hist = cfg.decoding_type == QMS
        if self.enc_hist:
            _, clip_q = qms_grid(cfg.q_bit)
            self.enc_clip = clip_q
            self.enc_marker = 2.0 * clip_q
            dv_max = max(len(v) for v in self.vn_edges)
            self.enc_app = (dv_max + 1) * clip_q < 128.0
        else:
            self.enc_app = False
        # APP emission window (DecoderConfig.pallas_app_t0): iterations
        # below it stream no APPs and read no APP cotangents — their
        # cotangent is structurally zero when the loss only covers the
        # window, so gradients are unchanged
        self.app_t0 = min(max(int(cfg.pallas_app_t0), 0), self.T - 1)
        self.Ta = self.T - self.app_t0
        self._vjp = self._build_vjp()

    # ----- shared forward recompute pieces -----------------------------------

    def _llr_weighted(self, llr_tile, w_vn_ref, t):
        """Weighted (+quantized) channel tiles and the pre-quantize values
        (needed for the STE mask in backward)."""
        vn_mode = self.spec.sharing[2]
        qms = self.cfg.decoding_type == QMS
        pre, post = [], []
        for j in range(self.N):
            x = llr_tile(j)
            if vn_mode > 0:
                wv = w_vn_ref[t, j] if vn_mode in (2, 5) else w_vn_ref[t, 0]
                x = x * wv
            pre.append(x)
            post.append(self._quantize(x) if qms else x)
        return pre, post

    def _app_prev(self, llr_w, c2v_read, t):
        """Recompute the previous iteration's APP tiles (for UCN detection)
        with the exact op order of the forward kernel's step 8."""
        qms = self.cfg.decoding_type == QMS
        is0 = (t == 0)
        apps = []
        for j in range(self.N):
            app_j = None
            for e in self.vn_edges[j]:
                c = c2v_read(e)
                app_j = c if app_j is None else app_j + c
            base = self._llr_tile_fn(j)
            if qms:
                base = self._quantize(base)
            app_j = base if app_j is None else base + app_j
            app_j = jnp.clip(app_j, -self.cfg.clip_llr, self.cfg.clip_llr)
            apps.append(jnp.where(is0, llr_w[j], app_j))
        return apps

    def _ucn_masks(self, llr_w, c2v_read, t):
        if not self.spec.ucn_enabled:
            return None
        src = self._app_prev(llr_w, c2v_read, t)
        pm = [1.0 - 2.0 * (s >= 0.0).astype(jnp.float32) for s in src]
        u_mask = []
        for i in range(self.M):
            prod = None
            for e in self.cn_edges[i]:
                pe = self._roll(pm[self.edge_vn[e]], self.edge_shift[e])
                prod = pe if prod is None else prod * pe
            u_mask.append((prod < 0.0).astype(jnp.float32))
        return u_mask

    def _minsum_check(self, edges, x_of):
        """Running min1/min2/sign reduction over one check's edges.
        ``x_of(e)`` yields the check-aligned V->C message.  Returns
        (m1, m2, sgn_tot, amag dict, sgn dict) — deg-sized locals only."""
        nudge = self.cfg.decoding_type in (MS, QMS)
        a1 = a2 = st = None
        amag, sgn = {}, {}
        for e in edges:
            x = x_of(e)
            a = jnp.abs(x) if nudge else \
                jnp.where(x == 0.0, _PAD_MAG, jnp.abs(x))
            s_ = jnp.where(x > 0.0, -1.0, 1.0)
            amag[e], sgn[e] = a, s_
            if a1 is None:
                a1, a2 = a, jnp.full_like(a, _PAD_MAG)
                st = s_
            else:
                a2 = jnp.minimum(a2, jnp.maximum(a1, a))
                a1 = jnp.minimum(a1, a)
                st = st * s_
        return a1, a2, st, amag, sgn

    @staticmethod
    def _ext_mag(m1, m2, amag_e):
        """Extrinsic min for one edge + the eps adjustment (forward value
        fed to the neural weighting)."""
        mag = jnp.where(amag_e == m1, m2, m1)
        return jnp.where(jnp.abs(mag) <= _EPS_MSG, mag - _EPS_MSG, mag)

    def _sp_check_bwd(self, t, i, edges, xc_of, gc_scr, u_i, w_cn_ref,
                      w_ucn_ref, acc):
        """Backward of one SP (tanh/atanh) check (round 5: fused SP
        training).  Recomputes the extrinsic tanh-product forward
        (prefix/suffix arrays, exactly the fused forward's op order), then
        applies the scan backend's gradient semantics (models/nms.py step 5
        SP branch, itself anchored to executed-reference TF gradients):

        * the zero->1 map on tanh outputs is ADDITIVE in the scan backend
          (``tt + (tt == 0)``), so its gradient is 1 — not a where-mask;
        * ``jnp.clip`` on the product: gradient 1 strictly inside the
          bounds, 1/2 at an exactly-hit bound (lax.max/min tie), 0 outside;
        * d(-2*atanh(p))/dp = -2/(1-p^2);
        * |out|: gradient +1 at exactly 0 (jnp.abs's VJP);
        * sign(out) is piecewise-constant (gradient 0).

        Writes each edge's xc cotangent into gc_scr (VN alignment) and
        returns the deferred per-check weight-grad tile for per-check /
        scalar sharing (None for cn_mode 0; per-edge modes accumulate via
        ``acc`` directly)."""
        cfg = self.cfg
        cn_mode, ucn_mode, _ = self.spec.sharing
        ucn = self.spec.ucn_enabled
        offset = cfg.neural_mode == "offset"
        msg_clip = cfg.clip_llr
        deg = len(edges)
        lo, hi = -1.0 + 1e-7, 1.0 - 1e-7
        xs = [xc_of(e) for e in edges]
        tt_raw = [jnp.tanh(-0.5 * x) for x in xs]
        tt = [jnp.where(v == 0.0, 1.0, v) for v in tt_raw]
        F = [None] * deg   # prefix products of tt[:k]
        Bv = [None] * deg  # suffix products of tt[k+1:]
        a = None
        for k in range(deg):
            F[k] = a
            a = tt[k] if a is None else a * tt[k]
        a = None
        for k in range(deg - 1, -1, -1):
            Bv[k] = a
            a = tt[k] if a is None else tt[k] * a
        ones = jnp.ones_like(tt[0])
        Fk = [f if f is not None else ones for f in F]
        Bk = [b if b is not None else ones for b in Bv]
        gw_check = None
        gF = [None] * deg
        gB = [None] * deg
        g_tt = [None] * deg
        for k, e in enumerate(edges):
            p = Fk[k] * Bk[k]
            pc = jnp.clip(p, lo, hi)
            out = -2.0 * _atanh(pc)
            mag = jnp.abs(out)
            sgn_out = jnp.sign(out)
            g_c2vnew = self._roll(gc_scr[e], self.edge_shift[e])
            g_wmag = g_c2vnew * sgn_out
            if cn_mode > 0:
                w = self._read_cn_w(w_cn_ref, t, i, e, cn_mode)
                if ucn:
                    wu = self._read_cn_w(w_ucn_ref, t, i, e, ucn_mode)
                    w_eff = w * (1.0 - u_i) + wu * u_i
                else:
                    w_eff = w
                relu_in = mag - w_eff if offset else mag * w_eff
            else:
                w_eff = None
                relu_in = mag
            # relu' * inclusive clip mask collapse (0 < r <= clip), as in
            # the min-sum backward
            qr = jnp.logical_and(relu_in > 0.0, relu_in <= msg_clip) \
                .astype(jnp.float32)
            g_in = g_wmag * qr
            if w_eff is None:
                g_mag = g_in
                g_w_tile = None
            elif offset:
                g_mag = g_in
                g_w_tile = -g_in
            else:
                g_mag = g_in * w_eff
                g_w_tile = g_in * mag
            if g_w_tile is not None:
                if cn_mode in (1, 4):
                    if ucn:
                        s_u = jnp.sum(g_w_tile * u_i)
                        acc("cn", self.cn_order[e], jnp.sum(g_w_tile) - s_u)
                        acc("ucn", self.cn_order[e], s_u)
                    else:
                        acc("cn", self.cn_order[e], jnp.sum(g_w_tile))
                else:
                    gw_check = g_w_tile if gw_check is None \
                        else gw_check + g_w_tile
            g_out = g_mag * jnp.where(out >= 0.0, 1.0, -1.0)
            g_pc = g_out * (-2.0 / (1.0 - pc * pc))
            in_hi = 0.5 * ((p < hi).astype(jnp.float32)
                           + (p <= hi).astype(jnp.float32))
            in_lo = 0.5 * ((p > lo).astype(jnp.float32)
                           + (p >= lo).astype(jnp.float32))
            g_p = g_pc * in_hi * in_lo
            gF[k] = g_p * Bk[k]
            gB[k] = g_p * Fk[k]
        # reverse the prefix recurrence F[k] = F[k-1] * tt[k-1]
        for k in range(deg - 1, 0, -1):
            gF[k - 1] = gF[k - 1] + gF[k] * tt[k - 1]
            c = gF[k] * Fk[k - 1]
            g_tt[k - 1] = c if g_tt[k - 1] is None else g_tt[k - 1] + c
        # reverse the suffix recurrence B[k] = B[k+1] * tt[k+1]
        for k in range(deg - 1):
            gB[k + 1] = gB[k + 1] + gB[k] * tt[k + 1]
            c = gB[k] * Bk[k + 1]
            g_tt[k + 1] = c if g_tt[k + 1] is None else g_tt[k + 1] + c
        for k, e in enumerate(edges):
            if g_tt[k] is None:           # deg == 1: empty product
                gc_scr[e] = jnp.zeros_like(ones)
                continue
            # additive zero-map: gradient 1; d tanh(-x/2)/dx on the RAW
            # tanh value
            g_xc = g_tt[k] * (-0.5) * (1.0 - tt_raw[k] * tt_raw[k])
            gc_scr[e] = self._unroll(g_xc, self.edge_shift[e])
        return gw_check

    # ----- forward kernel ------------------------------------------------------
    #
    # VMEM design (round 4, shared with ops/pallas_decoder.py): the per-edge
    # buffer `c2v_scr` is updated IN PLACE through the iteration — previous
    # C->V messages -> check-aligned V->C messages (VN phase) -> new
    # VN-aligned C->V messages (CN phase).  Each edge belongs to exactly one
    # VN and one CN and each phase reads a node's edges before overwriting
    # them, so one E-sized buffer replaces the three live E-sized dicts of
    # the round-3 kernel — which is what lets the z=64/z=72 5G codes fit the
    # 16 MiB scoped-VMEM budget on the *training* path too.

    def _fwd_kernel(self, *refs):
        cfg, spec = self.cfg, self.spec
        N, z, zp, E, T, TB = self.N, self.z, self.zp, self.E, self.T, self.tb
        cn_mode, ucn_mode, vn_mode = spec.sharing
        ucn = spec.ucn_enabled
        qms = cfg.decoding_type == QMS
        nudge = cfg.decoding_type in (MS, QMS)

        M, R = self.M, self.cres_rows
        sp = cfg.decoding_type == SP
        it = iter(refs)
        llr_ref = next(it)
        w_cn_ref = next(it) if cn_mode > 0 else None
        w_ucn_ref = next(it) if ucn else None
        w_vn_ref = next(it) if vn_mode > 0 else None
        enc = self.enc_hist
        apps_ref = next(it)   # ANY: [T, target, zp, B]
        hist_ref = next(it)   # ANY: [T, E, zp, B] v2c checkpoint — raw f32
        #   pre-clip values, or the bf16 (xq, inside) encoding when enc
        cres_ref = next(it) if R else None  # ANY: [T, R, zp, B] residuals
        c2v_scr = next(it)    # VMEM [E, zp, TB] edge state ([2, E, ...]
        #   when fwd_pp and not enc — the enc path streams from henc_scr,
        #   so its state stays single-buffer/in-place like the decode kernel)
        app_scr = next(it)    # VMEM [target, zp, TB] ([2, ...] when fwd_pp)
        cres_scr = next(it) if R else None  # VMEM [R, zp, TB] ([2, ...] pp)
        henc_scr = next(it) if enc else None  # VMEM bf16 [(2,)? E, zp, TB]
        hist_sem = next(it)
        app_sem = next(it)
        cres_sem = next(it) if R else None
        b = pl.program_id(0)
        col = pl.multiple_of(b * TB, TB)
        self._llr_tile_fn = lambda j: llr_ref[j * zp:(j + 1) * zp, :]

        pp = self.fwd_pp  # ping-pong buffers: DMA overlaps the iteration

        if pp and not enc:
            c2v_scr[0] = jnp.zeros((E, zp, TB), jnp.float32)
        else:
            c2v_scr[...] = jnp.zeros((E, zp, TB), jnp.float32)

        def hist_dma(buf, t, sem):
            return pltpu.make_async_copy(
                buf, hist_ref.at[t, :, :, pl.ds(col, TB)], sem)

        def app_dma(buf, t, sem):
            # apps_ref rows are indexed relative to the emission window
            ti = jnp.maximum(t - self.app_t0, 0) \
                if not isinstance(t, int) else t - self.app_t0
            return pltpu.make_async_copy(
                buf, apps_ref.at[ti, :, :, pl.ds(col, TB)], sem)

        def cres_dma(buf, t, sem):
            return pltpu.make_async_copy(
                buf, cres_ref.at[t, :, :, pl.ds(col, TB)], sem)

        def body(t, _):
            slot = t % 2
            if pp and not enc:
                # `cur` holds the entry C->V state; the VN phase rewrites
                # it in place with the PRE-clip V->C messages (the round-5
                # backward residual) and writes the post-clip check-aligned
                # messages into `nxt`; cur's checkpoint DMA then overlaps
                # the CN + APP phases plus the next iteration's VN reads
                cur = c2v_scr.at[slot]
                nxt = c2v_scr.at[1 - slot]
            else:
                # enc: the checkpoint streams from the bf16 henc staging
                # buffer, so the f32 state updates in place (decode-kernel
                # style) and needs no second buffer
                cur = nxt = c2v_scr
            if pp:
                app_buf = app_scr.at[slot]
                cres_buf = cres_scr.at[slot] if R else None
                henc_buf = henc_scr.at[slot] if enc else None
            else:
                app_buf = app_scr
                cres_buf = cres_scr
                henc_buf = henc_scr

            c2v_read = lambda e: cur[e]
            _, llr_w = self._llr_weighted(self._llr_tile_fn, w_vn_ref, t)
            u_mask = self._ucn_masks(llr_w, c2v_read, t)

            if enc and pp:
                # this slot's henc buffer was last DMA'd at t-2
                @pl.when(t > 1)
                def _():
                    hist_dma(henc_buf, t - 2, hist_sem.at[slot]).wait()

            # VN phase: entry C->V -> check-aligned post-clip V->C, with
            # the v2c checkpoint captured along the way (enc: bf16
            # (xq, inside) encoding into henc; else: raw pre into cur)
            for j in range(N):
                edges_j = self.vn_edges[j]
                s_j = None
                for e in edges_j:
                    c = cur[e]
                    s_j = c if s_j is None else s_j + c
                tot = llr_w[j] if s_j is None else llr_w[j] + s_j
                pre = [tot - cur[e] for e in edges_j]
                if enc:
                    vs = []
                    for e, pv in zip(edges_j, pre):
                        # grid-sum input: the STE round is the identity
                        # (see FusedNMSKernel._mag_clip), clamp suffices
                        xq = self._mag_clip(pv)
                        venc = jnp.where(jnp.abs(pv) <= self.enc_clip, xq,
                                         jnp.sign(pv) * self.enc_marker)
                        henc_buf[e] = venc.astype(jnp.bfloat16)
                        v = jnp.where(xq == 0.0, _EPS_MSG, xq)
                        vs.append(self._roll(v, self.edge_shift[e]))
                    for e, v in zip(edges_j, vs):
                        nxt[e] = v
                elif pp:
                    for e, pv in zip(edges_j, pre):
                        cur[e] = pv
                        v = self._mag_clip(pv)
                        if nudge:
                            v = jnp.where(v == 0.0, _EPS_MSG, v)
                        nxt[e] = self._roll(v, self.edge_shift[e])
                else:
                    for e, pv in zip(edges_j, pre):
                        cur[e] = pv

            if enc:
                if pp:
                    hist_dma(henc_buf, t, hist_sem.at[slot]).start()
                else:
                    henc_d = hist_dma(henc_buf, t, hist_sem)
                    henc_d.start()
            elif pp:
                # before the CN phase overwrites nxt: the v2c checkpoint of
                # t-1 (same buffer) must have landed
                @pl.when(t > 0)
                def _():
                    hist_dma(nxt, t - 1, hist_sem.at[1 - slot]).wait()
                hist_dma(cur, t, hist_sem.at[slot]).start()
            else:
                # single buffer: stream the pre-clip v2c now, then apply
                # clip/nudge/roll in place for the CN phase
                dma = hist_dma(cur, t, hist_sem)
                dma.start()
                dma.wait()
                for e in range(E):
                    v = self._mag_clip(c2v_scr[e])
                    if nudge:
                        v = jnp.where(v == 0.0, _EPS_MSG, v)
                    c2v_scr[e] = self._roll(v, self.edge_shift[e])

            # CN phase: min1/min2/sign (SP: extrinsic tanh products) +
            # weighting + route back (in place within nxt); per-check
            # weight modes run the weighting chain once per check on the
            # min1/min2 candidates (_cn_weight_store).  The reduction
            # results are captured into the residual stream.
            if pp and R:
                # this slot's residual buffer was last DMA'd at t-2
                @pl.when(t > 1)
                def _():
                    cres_dma(cres_buf, t - 2, cres_sem.at[slot]).wait()
            for i in range(M):
                edges = self.cn_edges[i]
                if sp:
                    # sum-product check update (the decode kernel's SP
                    # branch, ops/pallas_decoder.py:_kernel) — the backward
                    # recomputes the tanh prefixes from the streamed v2c,
                    # so only the UCN mask is checkpointed
                    if ucn:
                        cres_buf[i] = u_mask[i]
                    xs = [nxt[e] for e in edges]
                    tt = [jnp.where(v == 0.0, 1.0, v) for v in
                          (jnp.tanh(-0.5 * x) for x in xs)]
                    deg = len(edges)
                    fwd = [None] * deg
                    bwd = [None] * deg
                    acc_p = None
                    for k in range(deg):
                        fwd[k] = acc_p
                        acc_p = tt[k] if acc_p is None else acc_p * tt[k]
                    acc_p = None
                    for k in range(deg - 1, -1, -1):
                        bwd[k] = acc_p
                        acc_p = tt[k] if acc_p is None else tt[k] * acc_p
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
                        nxt[e] = self._unroll(y, self.edge_shift[e])
                    continue
                m1, m2, sgn_tot, amag, sgn = self._minsum_check(
                    edges, lambda e: nxt[e])
                cres_buf[i] = m1
                cres_buf[M + i] = m2
                cres_buf[2 * M + i] = -sgn_tot
                if ucn:
                    cres_buf[3 * M + i] = u_mask[i]

                def store(e, y):
                    nxt[e] = self._unroll(y, self.edge_shift[e])

                self._cn_weight_store(
                    t, i, edges, m1, m2, -sgn_tot, amag, sgn,
                    w_cn_ref, w_ucn_ref, u_mask[i] if ucn else None, store)
            cres_d = None
            if R and pp:
                cres_dma(cres_buf, t, cres_sem.at[slot]).start()
            elif R:
                cres_d = cres_dma(cres_buf, t, cres_sem)
                cres_d.start()

            # APP phase (pre-clip, streamed out for the emission window
            # t >= app_t0 only — below it no APP cotangent can arrive, so
            # neither the sums nor the stream are needed)
            t0 = self.app_t0

            @pl.when(t >= t0)
            def _app_phase():
                if pp:
                    # this slot's APP buffer was last DMA'd at t-2
                    @pl.when(t - 2 >= t0)
                    def _():
                        app_dma(app_buf, t - 2, app_sem.at[slot]).wait()
                for j in range(N):
                    app_j = None
                    for e in self.vn_edges[j]:
                        c = nxt[e]
                        app_j = c if app_j is None else app_j + c
                    base = self._llr_tile_fn(j)
                    if qms:
                        base = self._quantize(base)
                    app_j = base if app_j is None else base + app_j
                    # the PRE-clip APP is streamed out: the wrapper applies
                    # the clip for the primal output, and the backward
                    # derives the inclusive clip_tf_grad mask from it
                    # directly — sparing the backward kernel the whole
                    # weighting recompute it otherwise needs just to
                    # rebuild this value
                    if j < self.target:
                        app_buf[j] = app_j.astype(jnp.bfloat16) \
                            if self.enc_app else app_j
                if pp:
                    app_dma(app_buf, t, app_sem.at[slot]).start()
                else:
                    dma = app_dma(app_buf, t, app_sem)
                    dma.start()
                    dma.wait()
            if not pp:
                if cres_d is not None:
                    cres_d.wait()
                if enc:
                    henc_d.wait()
            return 0

        jax.lax.fori_loop(0, T, body, 0)
        if pp:
            # drain the checkpoints/APPs/residuals still in flight
            hsrc = henc_scr if enc else c2v_scr
            hist_dma(hsrc.at[(T - 1) % 2], T - 1,
                     hist_sem.at[(T - 1) % 2]).wait()
            if T > 1:
                if enc:
                    hist_dma(hsrc.at[(T - 2) % 2], T - 2,
                             hist_sem.at[(T - 2) % 2]).wait()
                if T - 2 >= self.app_t0:
                    app_dma(app_scr.at[(T - 2) % 2], T - 2,
                            app_sem.at[(T - 2) % 2]).wait()
                if R:
                    cres_dma(cres_scr.at[(T - 2) % 2], T - 2,
                             cres_sem.at[(T - 2) % 2]).wait()
            app_dma(app_scr.at[(T - 1) % 2], T - 1,
                    app_sem.at[(T - 1) % 2]).wait()
            if R:
                cres_dma(cres_scr.at[(T - 1) % 2], T - 1,
                         cres_sem.at[(T - 1) % 2]).wait()

    # ----- backward kernel ------------------------------------------------------

    def _bwd_kernel(self, *refs):
        cfg, spec = self.cfg, self.spec
        N, z, zp, E, T, TB = self.N, self.z, self.zp, self.E, self.T, self.tb
        cn_mode, ucn_mode, vn_mode = spec.sharing
        ucn = spec.ucn_enabled
        qms = cfg.decoding_type == QMS
        step_q, clip_q = qms_grid(cfg.q_bit) if qms else (None, None)
        msg_clip = clip_q if qms else cfg.clip_llr
        offset = cfg.neural_mode == "offset"

        M, R = self.M, self.cres_rows
        sp = cfg.decoding_type == SP
        enc = self.enc_hist
        it = iter(refs)
        llr_ref = next(it)
        w_cn_ref = next(it) if cn_mode > 0 else None
        w_ucn_ref = next(it) if ucn else None
        w_vn_ref = next(it) if vn_mode > 0 else None
        hist_ref = next(it)   # ANY: [T, E, zp, B] v2c checkpoint (VN-aligned)
        cres_ref = next(it) if R else None  # ANY: [T, R, zp, B] residuals
        pre_ref = next(it)    # ANY: [T, target, zp, B] pre-clip APPs
        gapp_ref = next(it)   # ANY: [T, target, zp, B]
        g_outs = {}
        for kind in ("cn", "ucn", "vn"):
            if self.dims[kind]:
                g_outs[kind] = next(it)   # VMEM [Tp, dimp]
        # with bwd_db the four landing buffers are double-buffered
        # ([2, ...]) so the next iteration's input DMAs prefetch during
        # compute; each slot's content is consumed (and clobbered in
        # place) during its own iteration
        db = self.bwd_db
        c2v_bufs = next(it)   # VMEM [(2,)? E, zp, TB]: pre-clip v2c of iter t
        gc_scr = next(it)     # VMEM [E, zp, TB]: carry cotangent (VN-aligned)
        cres_bufs = next(it) if R else None  # VMEM [(2,)? R, zp, TB]
        pre_bufs = next(it)   # VMEM [(2,)? target, zp, TB]
        gapp_bufs = next(it)  # VMEM [(2,)? target, zp, TB]
        in_sem = next(it)
        cres_sem = next(it) if R else None
        pre_sem = next(it)
        gin_sem = next(it)

        b = pl.program_id(0)
        col = pl.multiple_of(b * TB, TB)
        self._llr_tile_fn = lambda j: llr_ref[j * zp:(j + 1) * zp, :]

        def _bufs(slot):
            if slot is None:
                return ((c2v_bufs, cres_bufs, pre_bufs, gapp_bufs),
                        (in_sem, cres_sem, pre_sem, gin_sem))
            return ((c2v_bufs.at[slot],
                     cres_bufs.at[slot] if R else None,
                     pre_bufs.at[slot], gapp_bufs.at[slot]),
                    (in_sem.at[slot],
                     cres_sem.at[slot] if R else None,
                     pre_sem.at[slot], gin_sem.at[slot]))

        def in_dmas(slot, t):
            """The always-on input copies (v2c checkpoint + residuals) for
            iteration t into buffer `slot` (None: single-buffer layout)."""
            bufs, sems = _bufs(slot)
            dmas = [pltpu.make_async_copy(
                hist_ref.at[t, :, :, pl.ds(col, TB)], bufs[0], sems[0])]
            if R:
                dmas.append(pltpu.make_async_copy(
                    cres_ref.at[t, :, :, pl.ds(col, TB)], bufs[1], sems[1]))
            return dmas

        def app_dmas(slot, t):
            """Pre-clip APP + cotangent copies — only iterations inside the
            emission window (t >= app_t0) have them; rows are indexed
            relative to the window."""
            bufs, sems = _bufs(slot)
            ti = jnp.maximum(t - self.app_t0, 0)
            return [
                pltpu.make_async_copy(
                    pre_ref.at[ti, :, :, pl.ds(col, TB)], bufs[2], sems[2]),
                pltpu.make_async_copy(
                    gapp_ref.at[ti, :, :, pl.ds(col, TB)], bufs[3], sems[3]),
            ]

        if db:
            # prologue: prefetch iter T-1 (always inside the APP window —
            # app_t0 <= T-1 by construction)
            for dma in in_dmas(0, T - 1) + app_dmas(0, T - 1):
                dma.start()

        @pl.when(b == 0)
        def _():
            for ref in g_outs.values():
                ref[...] = jnp.zeros_like(ref)

        gc_scr[...] = jnp.zeros((E, zp, TB), jnp.float32)

        # slot one-hots, built once from iota (a materialized np constant
        # would be captured, which pallas_call rejects)
        oh = {}
        for kind, ref in g_outs.items():
            dimp = ref.shape[1]
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, dimp), 1)
            dim = dict(cn=self.dims["cn"], ucn=self.dims["ucn"],
                       vn=self.dims["vn"])[kind]
            oh[kind] = [(lane == s).astype(jnp.float32) for s in range(dim)]

        def body(i_loop, _):
            t = T - 1 - i_loop
            t0 = self.app_t0
            if db:
                slot = i_loop % 2
                # prefetch the NEXT iteration's inputs into the other slot
                # while this one computes
                tn = jnp.maximum(t - 1, 0)  # index safe even when predicated off

                @pl.when(i_loop + 1 < T)
                def _():
                    for dma in in_dmas(1 - slot, tn):
                        dma.start()

                @pl.when(jnp.logical_and(i_loop + 1 < T, tn >= t0))
                def _():
                    for dma in app_dmas(1 - slot, tn):
                        dma.start()
                for dma in in_dmas(slot, t):
                    dma.wait()

                @pl.when(t >= t0)
                def _():
                    for dma in app_dmas(slot, t):
                        dma.wait()
                c2v_scr = c2v_bufs.at[slot]
                cres_scr = cres_bufs.at[slot] if R else None
                pre_scr = pre_bufs.at[slot]
                gapp_scr = gapp_bufs.at[slot]
            else:
                c2v_scr, cres_scr, pre_scr, gapp_scr = (
                    c2v_bufs, cres_bufs, pre_bufs, gapp_bufs)
                for dma in in_dmas(None, t):
                    dma.start()

                @pl.when(t >= t0)
                def _():
                    for dma in app_dmas(None, t):
                        dma.start()
                for dma in in_dmas(None, t):
                    dma.wait()

                @pl.when(t >= t0)
                def _():
                    for dma in app_dmas(None, t):
                        dma.wait()

            # ---- forward intermediates: cheap/elementwise only ----
            # The streamed hist is the VN-aligned v2c checkpoint (kept
            # through the whole backward — both the xc derivation and the
            # final clip-mask phase read it); min1/min2/neg_tot and the
            # UCN masks come from the residual stream, so the backward
            # runs NO VN sum phase, NO sequential min reduction and NO
            # UCN APP/parity recompute (round-4 VERDICT item 3).
            # the backward only needs the PRE-quantize weighted channel
            # tiles (the VN-weight STE mask source) — and only when VN
            # weights exist; the post-quantize tiles the forward uses are
            # dead here since UCN masks come from the residual stream
            if vn_mode > 0:
                llr_pre = [self._llr_tile_fn(j) *
                           (w_vn_ref[t, j] if vn_mode in (2, 5)
                            else w_vn_ref[t, 0])
                           for j in range(N)]
            else:
                llr_pre = None

            def v2c_dec(e):
                """(value-for-mask, xq-or-pre): under enc the bf16 word
                decodes to the STE inside-test value and the post-quantize
                message; otherwise both are the raw pre-clip value."""
                if not enc:
                    v = c2v_scr[e]
                    return v, v
                v = c2v_scr[e].astype(jnp.float32)
                return v, jnp.clip(v, -self.enc_clip, self.enc_clip)

            def xc_of(e):
                """Check-aligned post-clip/nudge V->C message derived from
                the streamed checkpoint (exactly the forward's op order)."""
                if enc:
                    xq = v2c_dec(e)[1]
                    v = jnp.where(xq == 0.0, _EPS_MSG, xq)
                else:
                    v = self._mag_clip(c2v_scr[e])
                    if cfg.decoding_type in (MS, QMS):
                        v = jnp.where(v == 0.0, _EPS_MSG, v)
                return self._roll(v, self.edge_shift[e])

            # ---- APP cotangent folded into the carry (in place) ----
            # app_j = clip_tf_grad(base_j + sum_e y_e): gradient 1 on the
            # inclusive [-clip, clip] range (ops/ste.py clip_tf_grad).  The
            # pre-clip APP was streamed out by the forward kernel, so the
            # mask is a direct compare — no weighting recompute needed.
            # gc_scr[e] then holds the full cotangent wrt y_e (VN-aligned).
            # Iterations below the emission window have structurally-zero
            # APP cotangents — the whole fold is skipped.
            @pl.when(t >= t0)
            def _fold_gapp():
                for j in range(self.target):
                    app_pre = pre_scr[j].astype(jnp.float32) \
                        if self.enc_app else pre_scr[j]
                    inside = jnp.logical_and(
                        app_pre >= -cfg.clip_llr,
                        app_pre <= cfg.clip_llr).astype(jnp.float32)
                    g_app_j = gapp_scr[j] * inside
                    for e in self.vn_edges[j]:
                        gc_scr[e] = gc_scr[e] + g_app_j

            # ---- weighting backward (per check), in CN alignment ----
            # Weight-gradient row writes are DEFERRED: scalar contributions
            # accumulate per slot in `rows` and flush with ONE [1, dimp]
            # read-modify-write per kind per iteration.  (The naive version
            # did an RMW per edge — ~E*T*2 row updates per grid step — and
            # dominated the backward kernel.)  For non-per-edge sharing the
            # [zp, TB] -> scalar reductions are also deferred to one (or,
            # with UCN, two) per check instead of per edge.
            rows = {}

            def acc(kind, slot, scalar):
                contrib = oh[kind][slot] * scalar
                rows[kind] = contrib if kind not in rows \
                    else rows[kind] + contrib

            # scalar-sharing CN/UCN weight grads defer their [zp, TB] ->
            # scalar reductions to ONE sum per iteration (all checks land in
            # slot 0); per-check sharing still reduces per check
            cn_scalar = cn_mode == 3
            nudge_b = cfg.decoding_type in (MS, QMS)
            gw_iter = gu_iter = None

            def route_gw(i, gw_check, u_i):
                """Deferred per-check weight-grad routing (per-check /
                scalar modes) shared by the min-sum and SP branches."""
                nonlocal gw_iter, gu_iter
                if gw_check is None:
                    return
                if cn_scalar and not ucn:
                    gw_iter = gw_check if gw_iter is None \
                        else gw_iter + gw_check
                elif cn_scalar:   # ucn_mode == 3 too (check_params)
                    gw_iter = gw_check if gw_iter is None \
                        else gw_iter + gw_check
                    gu = gw_check * u_i
                    gu_iter = gu if gu_iter is None else gu_iter + gu
                elif ucn:
                    s_u = jnp.sum(gw_check * u_i)
                    s_c = jnp.sum(gw_check) - s_u
                    acc("cn", i if cn_mode in (2, 5) else 0, s_c)
                    acc("ucn", i if ucn_mode in (2, 5) else 0, s_u)
                else:
                    acc("cn", i if cn_mode in (2, 5) else 0,
                        jnp.sum(gw_check))

            for i in range(self.M):
                edges = self.cn_edges[i]
                if sp:
                    # fused SP backward: tanh-product prefix VJP, no
                    # residuals beyond the UCN mask (cres rows [0, M))
                    u_i = cres_scr[i] if ucn else None
                    route_gw(i, self._sp_check_bwd(
                        t, i, edges, xc_of, gc_scr, u_i,
                        w_cn_ref, w_ucn_ref, acc), u_i)
                    continue
                u_i = cres_scr[3 * M + i] if ucn else None
                # per-check reduction results come from the forward's
                # residual stream; only the per-edge elementwise |xc|/sign
                # are re-derived here
                m1 = cres_scr[i]
                m2 = cres_scr[M + i]
                neg_tot = cres_scr[2 * M + i]
                amag, sgn = {}, {}
                for e in edges:
                    x = xc_of(e)
                    amag[e] = jnp.abs(x) if nudge_b else \
                        jnp.where(x == 0.0, _PAD_MAG, jnp.abs(x))
                    sgn[e] = jnp.where(x > 0.0, -1.0, 1.0)
                g_mags = {}
                gw_check = None  # deferred tile accumulator (per-check modes)
                if cn_mode in (0, 2, 3, 5):
                    # Hoisted weighting backward: the eps-fix -> weight ->
                    # ReLU -> STE-mask chain runs ONCE per check on the
                    # min1/min2 candidates; each edge selects its branch
                    # (bit-exact: elementwise chains commute with the
                    # select, mirroring the forward's _cn_weight_store).
                    m1f, m2f = self._eps_fix(m1), self._eps_fix(m2)
                    w_eff = self._check_weight_eff(t, i, edges[0], w_cn_ref,
                                                   w_ucn_ref, u_i)
                    if w_eff is None:
                        r1, r2 = m1f, m2f
                    elif offset:
                        r1, r2 = m1f - w_eff, m2f - w_eff
                    else:
                        r1, r2 = m1f * w_eff, m2f * w_eff
                    # qr = relu'(r) * STE/clip mask on relu(r): relu_out
                    # differs from r only when r <= 0, where relu' is 0 —
                    # so the pair collapses to 0 < r <= msg_clip
                    qr1 = jnp.logical_and(r1 > 0.0, r1 <= msg_clip) \
                        .astype(jnp.float32)
                    qr2 = jnp.logical_and(r2 > 0.0, r2 <= msg_clip) \
                        .astype(jnp.float32)
                    if w_eff is None or offset:
                        gm1, gm2 = qr1, qr2            # d wmag / d mag
                    else:
                        gm1, gm2 = qr1 * w_eff, qr2 * w_eff
                    if cn_mode > 0:
                        if offset:                     # d wmag / d w
                            p1, p2 = -qr1, -qr2
                        else:
                            p1, p2 = qr1 * m1f, qr2 * m2f
                    for e in edges:
                        g_c2vnew = self._roll(gc_scr[e], self.edge_shift[e])
                        g_wmag = g_c2vnew * (neg_tot * sgn[e])
                        sel = amag[e] == m1
                        g_mags[e] = g_wmag * jnp.where(sel, gm2, gm1)
                        if cn_mode > 0:
                            g_w_tile = g_wmag * jnp.where(sel, p2, p1)
                            gw_check = g_w_tile if gw_check is None \
                                else gw_check + g_w_tile
                else:
                    # per-edge weights (cn_mode/ucn_mode 1/4): the chain is
                    # edge-specific, and each edge owns its weight slot
                    for e in edges:
                        g_c2vnew = self._roll(gc_scr[e], self.edge_shift[e])
                        mag = self._ext_mag(m1, m2, amag[e])
                        g_wmag = g_c2vnew * (neg_tot * sgn[e])
                        w = self._read_cn_w(w_cn_ref, t, i, e, cn_mode)
                        if ucn:
                            wu = self._read_cn_w(w_ucn_ref, t, i, e,
                                                 ucn_mode)
                            w_eff = w * (1.0 - u_i) + wu * u_i
                        else:
                            w_eff = w
                        relu_in = mag - w_eff if offset else mag * w_eff
                        qr = jnp.logical_and(
                            relu_in > 0.0, relu_in <= msg_clip) \
                            .astype(jnp.float32)
                        g_in = g_wmag * qr
                        if offset:
                            g_mag = g_in
                            g_w_tile = -g_in
                        else:
                            g_mag = g_in * w_eff
                            g_w_tile = g_in * mag
                        if ucn:
                            s_u = jnp.sum(g_w_tile * u_i)
                            s_c = jnp.sum(g_w_tile) - s_u
                        else:
                            s_u, s_c = None, jnp.sum(g_w_tile)
                        acc("cn", self.cn_order[e], s_c)
                        if ucn:
                            acc("ucn", self.cn_order[e], s_u)
                        g_mags[e] = g_mag
                route_gw(i, gw_check, u_i)

                # ---- tie-splitting extrinsic-min backward ----
                is_m1 = {e: amag[e] == m1 for e in edges}   # bool
                is_m2 = {e: amag[e] == m2 for e in edges}
                c1 = c2 = None
                for e in edges:
                    f1 = is_m1[e].astype(jnp.float32)
                    f2 = is_m2[e].astype(jnp.float32)
                    c1 = f1 if c1 is None else c1 + f1
                    c2 = f2 if c2 is None else c2 + f2
                c2 = jnp.maximum(c2, 1.0)
                g_above = g_min = None
                for e in edges:
                    gm = jnp.where(is_m1[e], g_mags[e], 0.0)
                    ga = g_mags[e] - gm
                    g_above = ga if g_above is None else g_above + ga
                    g_min = gm if g_min is None else g_min + gm
                multi = (c1 > 1.0).astype(jnp.float32)
                # hoist the per-check reciprocals out of the edge loop —
                # VPU division is multi-cycle, and the naive form divides
                # once per edge
                r_c1 = multi * (g_above / c1)
                r_den = 1.0 / jnp.maximum(c1 - 1.0, 1.0)
                base_tied = r_c1 + multi * g_min * r_den + \
                    (1.0 - multi) * g_above
                m2_recv = (1.0 - multi) * (g_min / c2)
                mr = multi * r_den
                zero = jnp.zeros_like(m2_recv)
                for e in edges:
                    tied = base_tied - g_mags[e] * mr
                    g_amag = jnp.where(
                        is_m1[e], tied,
                        jnp.where(is_m2[e], m2_recv, zero))
                    # amag = |xc| (+PAD at exact zeros for MS_RAW):
                    # d|x|/dx = sign(xc).  The nudge guarantees xc != 0
                    # for MS/QMS, where sign(xc) == -sgn[e] exactly; for
                    # MS_RAW a zero xc is flagged by amag == _PAD_MAG.
                    s_xc = -sgn[e]
                    if cfg.decoding_type == MS_RAW:
                        s_xc = s_xc * (amag[e] < _PAD_MAG) \
                            .astype(jnp.float32)
                    # gc_scr[e] transitions: y_e cotangent (consumed above)
                    # -> VN-aligned xc cotangent
                    gc_scr[e] = self._unroll(g_amag * s_xc,
                                             self.edge_shift[e])
            if gw_iter is not None:
                if gu_iter is not None:
                    s_u = jnp.sum(gu_iter)
                    acc("cn", 0, jnp.sum(gw_iter) - s_u)
                    acc("ucn", 0, s_u)
                else:
                    acc("cn", 0, jnp.sum(gw_iter))

            # ---- V->C clip/quantize mask + VN backward (in place) ----
            # gc_scr[e] holds the VN-aligned xc cotangent; c2v_scr[e] still
            # holds the pre-clip v2c value for the STE/clip mask.  The
            # scalar-sharing VN weight grad (vn_mode 3) defers its
            # [zp, TB] -> scalar reduction to one sum per iteration.
            gv_iter = None
            for j in range(N):
                g_tot = None
                g_v2c = {}
                for e in self.vn_edges[j]:
                    # STE / clip_tf_grad mask on the pre-clip v2c value
                    # (select form: one fewer op than mask-multiply).
                    # enc: |venc| <= clip IS the inclusive inside-test
                    # (venc = xq inside, sign*2*clip outside)
                    g = jnp.where(jnp.abs(v2c_dec(e)[0]) <= msg_clip,
                                  gc_scr[e], 0.0)
                    g_v2c[e] = g
                    g_tot = g if g_tot is None else g_tot + g
                for e in self.vn_edges[j]:
                    gc_scr[e] = g_tot - g_v2c[e]
                # channel-input weight gradient (VN weights)
                if vn_mode > 0:
                    g_llr_w = g_tot
                    if qms:
                        g_llr_w = jnp.where(
                            jnp.abs(llr_pre[j]) <= clip_q, g_llr_w, 0.0)
                    gv = g_llr_w * self._llr_tile_fn(j)
                    if vn_mode == 3:
                        gv_iter = gv if gv_iter is None else gv_iter + gv
                    else:
                        acc("vn", j, jnp.sum(gv))
            if gv_iter is not None:
                acc("vn", 0, jnp.sum(gv_iter))

            # flush this iteration's weight-grad rows (one RMW per kind)
            for kind, row in rows.items():
                g_outs[kind][pl.ds(t, 1), :] = \
                    g_outs[kind][pl.ds(t, 1), :] + row
            return 0

        jax.lax.fori_loop(0, T, body, 0)

    # ----- host-side wrappers ----------------------------------------------------

    def _weight_inputs(self, cn, ucn, vn):
        out = []
        if self.spec.sharing[0] > 0:
            out.append(cn)
        if self.spec.ucn_enabled:
            out.append(ucn)
        if self.spec.sharing[2] > 0:
            out.append(vn)
        return out

    @functools.cached_property
    def _fwd_call(self):
        N, zp, TB, E, T = self.N, self.zp, self.tb, self.E, self.T
        target, R = self.target, self.cres_rows
        w_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        in_specs = [pl.BlockSpec((N * zp, TB), lambda b: (0, b),
                                 memory_space=pltpu.VMEM)]
        in_specs += [w_spec] * len(self._weight_inputs(1, 1, 1))
        out_specs = [pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec(memory_space=pl.ANY)]
        if R:
            out_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        enc = self.enc_hist
        app_dt = jnp.bfloat16 if self.enc_app else jnp.float32
        hist_dt = jnp.bfloat16 if enc else jnp.float32
        if self.fwd_pp:
            # enc: the state stays single-buffer (the checkpoint streams
            # from the bf16 henc staging pair instead)
            scratch = [pltpu.VMEM((E, zp, TB), jnp.float32) if enc
                       else pltpu.VMEM((2, E, zp, TB), jnp.float32),
                       pltpu.VMEM((2, target, zp, TB), app_dt)]
            if R:
                scratch.append(pltpu.VMEM((2, R, zp, TB), jnp.float32))
            if enc:
                scratch.append(pltpu.VMEM((2, E, zp, TB), jnp.bfloat16))
            scratch += [pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))]
            if R:
                scratch.append(pltpu.SemaphoreType.DMA((2,)))
        else:
            scratch = [pltpu.VMEM((E, zp, TB), jnp.float32),
                       pltpu.VMEM((target, zp, TB), app_dt)]
            if R:
                scratch.append(pltpu.VMEM((R, zp, TB), jnp.float32))
            if enc:
                scratch.append(pltpu.VMEM((E, zp, TB), jnp.bfloat16))
            scratch += [pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())]
            if R:
                scratch.append(pltpu.SemaphoreType.DMA(()))
        kernel = functools.partial(FusedTrainKernel._fwd_kernel, self)

        def call(llr_pad, *weights):
            B = llr_pad.shape[-1]
            out_shape = [
                jax.ShapeDtypeStruct((self.Ta, target, zp, B), app_dt),
                jax.ShapeDtypeStruct((T, E, zp, B), hist_dt),
            ]
            if R:
                out_shape.append(
                    jax.ShapeDtypeStruct((T, R, zp, B), jnp.float32))
            return pl.pallas_call(
                kernel, grid=(B // TB,), in_specs=in_specs,
                out_shape=out_shape, out_specs=out_specs,
                scratch_shapes=scratch, interpret=self.interpret,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=self.fwd_vmem_limit),
                cost_estimate=pl.CostEstimate(
                    flops=T * E * zp * B * 16,
                    bytes_accessed=(llr_pad.size
                                    + T * (target + E + R) * zp * B) * 4,
                    transcendentals=0),
            )(llr_pad, *weights)

        return call

    @functools.cached_property
    def _bwd_call(self):
        N, zp, TB, E, T = self.N, self.zp, self.tb, self.E, self.T
        target, R = self.target, self.cres_rows
        Tp = _round_up(T, 8)
        w_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        in_specs = [pl.BlockSpec((N * zp, TB), lambda b: (0, b),
                                 memory_space=pltpu.VMEM)]
        in_specs += [w_spec] * len(self._weight_inputs(1, 1, 1))
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # hist (v2c_pre)
        if R:
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # residuals
        in_specs += [pl.BlockSpec(memory_space=pl.ANY),   # pre-clip APPs
                     pl.BlockSpec(memory_space=pl.ANY)]   # APP cotangent
        out_specs, out_shapes = [], []
        self._g_kinds = []
        for kind in ("cn", "ucn", "vn"):
            d = self.dims[kind]
            if d:
                dimp = _round_up(d, 128)
                out_specs.append(pl.BlockSpec((Tp, dimp), lambda b: (0, 0),
                                              memory_space=pltpu.VMEM))
                out_shapes.append(
                    jax.ShapeDtypeStruct((Tp, dimp), jnp.float32))
                self._g_kinds.append((kind, d))
        hist_dt = jnp.bfloat16 if self.enc_hist else jnp.float32
        app_dt = jnp.bfloat16 if self.enc_app else jnp.float32
        if self.bwd_db:
            scratch = [pltpu.VMEM((2, E, zp, TB), hist_dt),
                       pltpu.VMEM((E, zp, TB), jnp.float32)]
            if R:
                scratch.append(pltpu.VMEM((2, R, zp, TB), jnp.float32))
            scratch += [pltpu.VMEM((2, target, zp, TB), app_dt),
                        pltpu.VMEM((2, target, zp, TB), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))]
            if R:
                scratch.append(pltpu.SemaphoreType.DMA((2,)))
            scratch += [pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))]
        else:
            scratch = [pltpu.VMEM((E, zp, TB), hist_dt),
                       pltpu.VMEM((E, zp, TB), jnp.float32)]
            if R:
                scratch.append(pltpu.VMEM((R, zp, TB), jnp.float32))
            scratch += [pltpu.VMEM((target, zp, TB), app_dt),
                        pltpu.VMEM((target, zp, TB), jnp.float32),
                        pltpu.SemaphoreType.DMA(())]
            if R:
                scratch.append(pltpu.SemaphoreType.DMA(()))
            scratch += [pltpu.SemaphoreType.DMA(()),
                        pltpu.SemaphoreType.DMA(())]
        kernel = functools.partial(FusedTrainKernel._bwd_kernel, self)
        n_trans = T * E * zp * (3 if self.cfg.decoding_type == SP else 0)

        def call(llr_pad, weights, hist, cres, apps_pre_pad, g_apps_pad):
            B = llr_pad.shape[-1]
            extra = (cres,) if R else ()
            return pl.pallas_call(
                kernel, grid=(B // TB,), in_specs=in_specs,
                out_shape=out_shapes, out_specs=out_specs,
                scratch_shapes=scratch, interpret=self.interpret,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=self.bwd_vmem_limit),
                cost_estimate=pl.CostEstimate(
                    flops=T * E * zp * B * 34,
                    bytes_accessed=(llr_pad.size
                                    + T * (2 * target + E + R) * zp * B) * 4,
                    transcendentals=n_trans * B),
            )(llr_pad, *weights, hist, *extra, apps_pre_pad, g_apps_pad)

        return call

    def _build_vjp(self):
        z, zp, T, target, P = self.z, self.zp, self.T, self.target, self.P

        clip = self.cfg.clip_llr

        def fwd_run(cn, ucn, vn, llr):
            llr_pad = self._pack_llr(llr)
            weights = self._weight_inputs(cn, ucn, vn)
            outs = self._fwd_call(llr_pad, *weights)
            (pre_pad, hist), cres = outs[:2], \
                (outs[2] if self.cres_rows else None)
            bl = llr_pad.shape[-1]
            # the kernel streams the PRE-clip APPs (the backward's clip
            # mask source; bf16 under enc_app — exact grid values); the
            # primal output upconverts and applies the clip here.  Unpack
            # the P sublane-packed batch groups back to batch lanes
            # (inverse of _pack_llr's layout)
            Ta = self.Ta
            pre_f32 = pre_pad[:, :, :P * z, :].astype(jnp.float32)
            apps = jnp.clip(pre_f32, -clip, clip) \
                .reshape(Ta, target, P, z, bl).transpose(0, 1, 3, 2, 4) \
                .reshape(Ta, target * z, P * bl)
            return apps, (llr_pad, hist, cres, pre_pad)

        @jax.custom_vjp
        def f(cn, ucn, vn, llr):
            return fwd_run(cn, ucn, vn, llr)[0]

        def f_fwd(cn, ucn, vn, llr):
            apps, (llr_pad, hist, cres, pre_pad) = fwd_run(cn, ucn, vn, llr)
            return apps, (cn, ucn, vn, llr, llr_pad, hist, cres, pre_pad)

        def f_bwd(res, g):
            cn, ucn, vn, llr, llr_pad, hist, cres, pre_pad = res
            bl = llr_pad.shape[-1]
            Ta = self.Ta
            # pack the APP cotangent into the kernel's sublane-group layout
            # (pad rows zero — they contribute nothing to any gradient)
            g4 = g.reshape(Ta, target, z, P, bl).transpose(0, 1, 3, 2, 4) \
                .reshape(Ta, target, P * z, bl)
            if zp > P * z:
                g4 = jnp.pad(g4, ((0, 0), (0, 0), (0, zp - P * z), (0, 0)))
            weights = self._weight_inputs(cn, ucn, vn)
            outs = self._bwd_call(llr_pad, weights, hist, cres, pre_pad, g4)
            grads = {"cn": None, "ucn": None, "vn": None}
            for (kind, d), o in zip(self._g_kinds, outs):
                grads[kind] = o[:T, :d]
            def gz(x, gr):
                return jnp.zeros_like(x) if gr is None else gr
            return (gz(cn, grads["cn"]), gz(ucn, grads["ucn"]),
                    gz(vn, grads["vn"]), jnp.zeros_like(llr))

        f.defvjp(f_fwd, f_bwd)
        return f

    def apps(self, stacked: Dict[str, Optional[jnp.ndarray]],
             llr: jnp.ndarray) -> jnp.ndarray:
        """Differentiable per-iteration APP stack
        [T - app_t0, target*z, B] (the emission window, full T by
        default)."""
        T = self.T
        dummy = jnp.zeros((T, 1), jnp.float32)
        cn = stacked["cn"] if stacked["cn"] is not None else dummy
        ucn = stacked["ucn"] if stacked["ucn"] is not None else dummy
        vn = stacked["vn"] if stacked["vn"] is not None else dummy
        return self._vjp(cn, ucn, vn, llr)
