"""Reference-style dense-matmul decoder, used ONLY as a same-hardware
performance baseline (and as an independent parity check).

This reproduces the *computational structure* of the reference's TF1 graph
(SURVEY.md section 2.2/2.3): dense one-hot [E*z, E*z] circulant-lift matmuls for
the QC routing, an [E, E]-masked [B, z, E, E] tile + reduce for the
extrinsic check-node update, and [E, E]/[N, E] dense matmuls for the
variable-node sums — the operators the reference builds in
`init_connecting_matrix` (`Main_Functions.py:46-150`) and applies in
`build_neural_network` (`Main_Functions.py:157-335`).  Implemented here from
the survey's behavioral spec in JAX so it runs on the same TPU chip.

Supports the benchmark configuration: min-sum / QMS, per-iteration scalar CN
and VN weights, no UCN.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_error_floor_tpu.codes.graph import TannerGraph
from ldpc_error_floor_tpu.ops.ste import quantize_ste


def build_dense_operators(graph: TannerGraph):
    """Dense connectivity operators equivalent to the reference's."""
    code = graph.code
    E, z, N, M = graph.E, code.z, code.N, code.M
    cn_of = graph.cn_order_of_edge        # VN-order edge -> CN-order index
    vn_of_cn = graph.edge_of_cn_order     # CN-order index -> VN-order edge

    # circulant lifts: L1 over VN-order edges, L2 over CN-order edges
    L1 = np.zeros((E * z, E * z), np.float32)
    L2 = np.zeros((E * z, E * z), np.float32)
    for e in range(E):  # VN-order
        s = graph.edge_shift[e]
        for h in range(z):
            L1[e * z + h, e * z + (h + s) % z] = 1.0
    for k in range(E):  # CN-order
        s = graph.edge_shift[vn_of_cn[k]]
        for h in range(z):
            L2[k * z + h, k * z + (h + s) % z] = 1.0

    # W_odd2even [E(C), E(V)]: extrinsic C->V sums into each VN-order edge
    Wo2e = np.zeros((E, E), np.float32)
    for ev in range(E):
        j = graph.edge_vn[ev]
        for ev2 in range(E):
            if ev2 != ev and graph.edge_vn[ev2] == j:
                Wo2e[cn_of[ev2], ev] = 1.0

    # W_skipconn2even [N, E(V)]: broadcast channel LLR to VN-order edges
    Wskip = np.zeros((N, E), np.float32)
    for ev in range(E):
        Wskip[graph.edge_vn[ev], ev] = 1.0

    # extrinsic CN mask [E(V), E(C)]: same check, not self
    Wmask = np.zeros((E, E), np.float32)
    for ev in range(E):
        i = graph.edge_cn[ev]
        for k in range(E):
            ev2 = vn_of_cn[k]
            if graph.edge_cn[ev2] == i and ev2 != ev:
                Wmask[ev, k] = 1.0

    # W_output [E(C), N]: sum all C->V messages into per-VN marginal
    Wout = np.zeros((E, N), np.float32)
    for k in range(E):
        Wout[k, graph.edge_vn[vn_of_cn[k]]] = 1.0

    return dict(L1=jnp.asarray(L1), L2=jnp.asarray(L2),
                Wo2e=jnp.asarray(Wo2e), Wskip=jnp.asarray(Wskip),
                Wmask=jnp.asarray(Wmask), Wout=jnp.asarray(Wout))


class DenseReferenceDecoder:
    """Min-sum/QMS decode through the dense operator chain (batch-first
    [B, N, z] layout, as the reference feeds it)."""

    def __init__(self, graph: TannerGraph, n_iters: int, decoding_type: int = 2,
                 q_bit: int = 5, clip_llr: float = 20.0):
        assert decoding_type in (1, 2)
        self.g = graph
        self.ops = build_dense_operators(graph)
        self.T = n_iters
        self.qms = decoding_type == 2
        self.q_bit = q_bit
        self.clip = clip_llr

    def decode(self, w_cn: jnp.ndarray, w_vn: jnp.ndarray, llr: jnp.ndarray):
        """w_cn/w_vn: [T] scalars; llr: [B, N, z].  Returns final APP [B, N*z]
        and per-iteration frame-error flags [T, B] (vs the zero word)."""
        o = self.ops
        g = self.g
        E, z, N = g.E, g.code.z, g.code.N
        B = llr.shape[0]

        def quant_or_clip(x):
            if self.qms:
                return quantize_ste(x, self.q_bit)
            return jnp.clip(x, -self.clip, self.clip)

        xa = llr                                   # [B, N, z]
        xa_q = quantize_ste(xa, self.q_bit) if self.qms else xa

        def step(carry, wts):
            llr_c2v, _ = carry                     # [B, z, E] CN-order, VN-aligned
            w_c, w_v = wts
            xa_in = jnp.transpose(xa, (0, 2, 1)) * w_v       # [B, z, N]
            if self.qms:
                xa_in = quantize_ste(xa_in, self.q_bit)
            x0 = jnp.matmul(xa_in, o["Wskip"])               # [B, z, E]
            x1 = jnp.matmul(llr_c2v, o["Wo2e"])              # [B, z, E]
            x2 = x0 + x1
            x2 = jnp.transpose(x2, (0, 2, 1)).reshape(B, E * z)
            x2 = jnp.matmul(x2, o["L1"].T)                   # lift to CN slots
            x2 = jnp.transpose(x2.reshape(B, E, z), (0, 2, 1))  # [B, z, E]
            x2 = quant_or_clip(x2)
            x2 = jnp.where(x2 == 0.0, 1e-4, x2)
            # dense tile extrinsic min/sign: [B, z, E(V), E(C)]
            tile = x2[:, :, :, None] * o["Wmask"][None, None]
            mag = jnp.where(tile == 0.0, 1e4, jnp.abs(tile))
            x3 = jnp.min(mag, axis=2)                        # [B, z, E(C)]
            x3 = jnp.where(jnp.abs(x3) <= 1e-4, x3 - 1e-4, x3)
            sgn = jnp.where(tile > 0.0, -1.0, 1.0)
            sp = -jnp.prod(sgn, axis=2)
            out = x3 * jnp.sign(sp)
            out = jnp.transpose(out, (0, 2, 1)).reshape(B, E * z)
            out = jnp.matmul(out, o["L2"])                   # lift back
            out = jnp.transpose(out.reshape(B, E, z), (0, 2, 1))
            wmag = jnp.abs(out) * w_c
            wmag = wmag * (wmag > 0.0)
            wmag = quant_or_clip(wmag)
            c2v = wmag * jnp.sign(out)                       # [B, z, E]
            y = jnp.matmul(c2v, o["Wout"])                   # [B, z, N]
            app = jnp.clip(xa_q + jnp.transpose(y, (0, 2, 1)), -self.clip,
                           self.clip)                         # [B, N, z]
            err = jnp.any(app.reshape(B, -1) >= 0.0, axis=1)
            return (c2v, app), err

        carry0 = (jnp.zeros((B, z, E), jnp.float32),
                  jnp.zeros((B, N, z), jnp.float32))
        (c2v, app), errs = jax.lax.scan(step, carry0, (w_cn, w_vn))
        return app.reshape(B, N * z), errs
