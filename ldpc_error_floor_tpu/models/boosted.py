"""Boosted two-stage decoding (the NeurIPS'23 headline feature).

A *base* decoder handles iterations [0, boundary); a *post* decoder (with
UCN weights) handles [boundary, n_iters) and is trained only on words the
base decoder fails to correct (reference: `main_Base.py` vs `main_Post.py`,
`BaseGraph/Block_Diagram.jpg`; pipeline description SURVEY.md section 2.6).

At inference the boosted decoder is a single deep NMS decode whose
weight rows for the prefix iterations come from the base stage — the
reference realizes this by loading frozen base rows in `weight_init`
(`Main_Functions.py:390-391,419-422`).  `compose_boosted_params` performs
the same composition on parameter pytrees.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ldpc_error_floor_tpu.codes.graph import TannerGraph
from ldpc_error_floor_tpu.codes.protograph import Code
from ldpc_error_floor_tpu.io.weight_files import KINDS
from ldpc_error_floor_tpu.models.nms import DecodeResult, DecoderConfig, NMSDecoder
from ldpc_error_floor_tpu.models.weights import Params, WeightSpec


def compose_boosted_params(graph: TannerGraph,
                           base_spec: WeightSpec, base_params: Params,
                           post_spec: WeightSpec, post_params: Params) -> Params:
    """Overwrite the first `base_spec.n_iters` weight rows of the post decoder's
    parameters with the base decoder's rows (for every kind both have)."""
    if post_spec.n_iters < base_spec.n_iters:
        raise ValueError("post decoder must be at least as deep as the base")
    out: Params = {}
    for kind in KINDS:
        pv = post_params.get(kind)
        if pv is None:
            out[kind] = None
            continue
        rows = np.asarray(pv).copy()
        bv = base_params.get(kind)
        if bv is not None:
            upto = min(base_spec.n_iters, base_spec.n_rows(kind),
                       post_spec.n_rows(kind))
            b = np.asarray(bv)
            d = post_spec.dim(kind, graph)
            for t in range(upto):
                rows[t] = np.broadcast_to(b[base_spec.iter_to_row(kind)[t]], (d,))
        out[kind] = jnp.asarray(rows, jnp.float32)
    return out


class BoostedDecoder:
    """Base + post two-stage decoder exposed as one deep decode.

    `params` must span the full depth (post-stage parameters with the frozen
    base prefix already composed in — see `compose_boosted_params`).
    """

    def __init__(self, code: Code, cfg: DecoderConfig, spec: WeightSpec,
                 params: Params, boundary: int,
                 graph: Optional[TannerGraph] = None):
        if not (0 < boundary <= spec.n_iters):
            raise ValueError("boundary must be in (0, n_iters]")
        self.boundary = boundary
        self.decoder = NMSDecoder(code, cfg, spec, graph=graph)
        self.params = params

    def decode(self, llr, labels=None, collect: str = "stats") -> DecodeResult:
        return self.decoder.decode(self.params, llr, labels=labels, collect=collect)

    def base_failure_mask(self, result: DecodeResult) -> jnp.ndarray:
        """[B] bool: frames the base stage (iterations < boundary) never
        corrected — the population the post stage is trained on."""
        if result.err_flags is None:
            raise ValueError("decode with collect='stats' first")
        return jnp.all(result.err_flags[: self.boundary], axis=0)
