"""Trainable weight store for neural min-sum decoders.

Sharing codes match the reference (`main_Base.py:24`, `weight_init`
`Main_Functions.py:387-439`) per weight kind (CN, UCN, VN):

* 0 — no weights
* 1 — per-edge, per-iteration (dim E, CN-order edge enumeration)
* 2 — per-proto-node, per-iteration (dim M for CN/UCN, N for VN)
* 3 — per-iteration scalar (dim 1)
* 4 — per-edge, temporally shared past `fixed_iter`
* 5 — per-proto-node, temporally shared past `fixed_iter`

Validity rules (reference `check_params` `Main_Functions.py:498-523`):
VN sharing cannot be per-edge (not in {1,4}); UCN sharing, if nonzero, must
equal CN sharing; at least one kind must have weights for training.

Parameters are plain dicts ``{"cn": [rows, dim], "ucn": ..., "vn": ...}``
(``None`` for disabled kinds) so they compose with jax.grad/optax directly.
Temporal sharing stores ``fixed_iter + 1`` rows; `stack()` expands any mode
to per-iteration ``[T, dim]`` arrays with `jnp.take`, so gradients flow back
to shared rows automatically.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_error_floor_tpu.codes.graph import TannerGraph
from ldpc_error_floor_tpu.io.weight_files import Blocks, KINDS

Params = Dict[str, Optional[jnp.ndarray]]

_PER_ITER = (1, 2, 3)
_TEMPORAL = (4, 5)


@dataclass(frozen=True)
class WeightSpec:
    """Static description of a decoder's weight layout."""

    sharing: Tuple[int, int, int]  # (CN, UCN, VN)
    n_iters: int
    fixed_iter: int = 0
    min_w: float = 0.0
    max_w: float = 2.0

    def __post_init__(self):
        cn, ucn, vn = self.sharing
        for s in self.sharing:
            if s not in (0, 1, 2, 3, 4, 5):
                raise ValueError(f"bad sharing code {s}")
        if vn in (1, 4):
            raise ValueError("VN weights cannot be per-edge (sharing[2] in {1,4})")
        if ucn != 0 and ucn != cn:
            raise ValueError("UCN sharing, if nonzero, must equal CN sharing")

    @property
    def ucn_enabled(self) -> bool:
        return self.sharing[1] > 0

    def mode(self, kind: str) -> int:
        return self.sharing[KINDS.index(kind)]

    def dim(self, kind: str, graph: TannerGraph) -> int:
        m = self.mode(kind)
        if m in (1, 4):
            return graph.E
        if m in (2, 5):
            return graph.code.M if kind in ("cn", "ucn") else graph.code.N
        if m == 3:
            return 1
        return 0

    def n_rows(self, kind: str) -> int:
        m = self.mode(kind)
        if m in _PER_ITER:
            return self.n_iters
        if m in _TEMPORAL:
            return self.fixed_iter + 1
        return 0

    def iter_to_row(self, kind: str) -> np.ndarray:
        """[n_iters] -> stored row index (temporal modes reuse row fixed_iter)."""
        t = np.arange(self.n_iters)
        if self.mode(kind) in _TEMPORAL:
            return np.minimum(t, self.fixed_iter)
        return t


def init_weights(spec: WeightSpec, graph: TannerGraph,
                 init_cn: float = 1.0, init_vn: float = 1.0,
                 key: Optional[jax.Array] = None) -> Params:
    """Fresh parameters.  init value -1 means truncated-normal around the
    midpoint of [min_w, max_w] with std 0.1 (reference
    `Main_Functions.py:428-431`)."""
    params: Params = {}
    for kind in KINDS:
        if spec.mode(kind) == 0:
            params[kind] = None
            continue
        shape = (spec.n_rows(kind), spec.dim(kind, graph))
        init_val = init_cn if kind in ("cn", "ucn") else init_vn
        if init_val == -1:
            if key is None:
                key = jax.random.PRNGKey(0)
            key, sub = jax.random.split(key)
            mid = (spec.min_w + spec.max_w) / 2.0
            w = mid + 0.1 * jax.random.truncated_normal(sub, -2.0, 2.0, shape)
        else:
            w = jnp.full(shape, float(init_val), dtype=jnp.float32)
        params[kind] = w.astype(jnp.float32)
    return params


def clip_weights(spec: WeightSpec, params: Params,
                 masks: Optional[Dict[str, Optional[jnp.ndarray]]] = None
                 ) -> Params:
    """The [min_w, max_w] box constraint, applied after every optimizer step
    (reference enforces it as a TF variable constraint,
    `Main_Functions.py:434`).

    The reference attaches the constraint per-variable, only to variables it
    creates as trainable — frozen-prefix rows loaded from a file are never
    clipped.  Pass the trainable-row `masks` (shape-broadcastable to each
    kind's rows, e.g. from `trainable_mask`) to reproduce that: rows outside
    the mask pass through unclipped."""
    out: Params = {}
    for k, v in params.items():
        if v is None:
            out[k] = None
            continue
        clipped = jnp.clip(v, spec.min_w, spec.max_w)
        if masks is not None and masks.get(k) is not None:
            clipped = jnp.where(masks[k] > 0, clipped, v)
        out[k] = clipped
    return out


def stack_weights(spec: WeightSpec, params: Params) -> Dict[str, Optional[jnp.ndarray]]:
    """Expand stored rows to per-iteration [T, dim] arrays for lax.scan."""
    out = {}
    for kind in KINDS:
        v = params.get(kind)
        if v is None:
            out[kind] = None
        else:
            out[kind] = jnp.take(v, jnp.asarray(spec.iter_to_row(kind)), axis=0)
    return out


def trainable_mask(spec: WeightSpec, train_start: int, train_end: int,
                   fixed_init: int = 0) -> Dict[str, Optional[np.ndarray]]:
    """Boolean row masks selecting the current training block's variables.

    Mirrors the reference var_list selection (`Main_Functions.py:360-378`):
    per-iteration modes train rows [max(train_start - fixed_init, fixed_iter),
    train_end); temporal modes train the single shared row."""
    lo = max(train_start - fixed_init, spec.fixed_iter)
    masks = {}
    for kind in KINDS:
        m = spec.mode(kind)
        if m == 0:
            masks[kind] = None
        elif m in _PER_ITER:
            rows = np.zeros(spec.n_rows(kind), bool)
            rows[lo:train_end] = True
            masks[kind] = rows
        else:  # temporal: only the shared pivot row
            rows = np.zeros(spec.n_rows(kind), bool)
            rows[spec.fixed_iter] = True
            masks[kind] = rows
    return masks


# ----- interop with reference weight files ------------------------------------

def params_from_blocks(spec: WeightSpec, blocks: Blocks,
                       graph: TannerGraph) -> Params:
    """Build parameters from per-iteration file rows (reference text or JSON
    weight formats).  Temporal modes keep the first fixed_iter+1 rows."""
    params: Params = {}
    for kind in KINDS:
        if spec.mode(kind) == 0:
            params[kind] = None
            continue
        rows = blocks.get(kind)
        if rows is None:
            raise ValueError(f"weight blocks missing kind {kind!r}")
        n, d = spec.n_rows(kind), spec.dim(kind, graph)
        if len(rows) < n:
            raise ValueError(f"{kind}: file has {len(rows)} rows, spec needs {n}")
        arr = np.stack([np.broadcast_to(np.atleast_1d(r), (d,)) for r in rows[:n]])
        params[kind] = jnp.asarray(arr, jnp.float32)
    return params


def params_to_blocks(spec: WeightSpec, params: Params) -> Blocks:
    """Expand parameters to per-iteration file rows (temporal modes re-print
    the shared row, matching `Print_Functions.py:86-94`)."""
    blocks: Blocks = {}
    for kind in KINDS:
        v = params.get(kind)
        if v is None:
            blocks[kind] = None
        else:
            rows = np.asarray(v)[spec.iter_to_row(kind)]
            blocks[kind] = [rows[t] for t in range(spec.n_iters)]
    return blocks


def load_params(spec: WeightSpec, graph: TannerGraph, path_or_name: str) -> Params:
    """Load parameters from a reference text weight file or bundled JSON set,
    checking the sharing triple matches."""
    from ldpc_error_floor_tpu.io.weight_files import (bundled_weight_path,
                                                      read_weight_file,
                                                      read_weight_json)
    try:
        path = bundled_weight_path(path_or_name)
    except FileNotFoundError:
        path = path_or_name
    if path.endswith(".json"):
        sharing, blocks = read_weight_json(path)
    else:
        sharing, blocks = read_weight_file(path)
    if tuple(sharing) != tuple(spec.sharing):
        raise ValueError(f"{path}: sharing {sharing} != spec {spec.sharing}")
    return params_from_blocks(spec, blocks, graph)


def partial_update_from_blocks(spec: WeightSpec, params: Params, blocks: Blocks,
                               upto_iter: int, graph: TannerGraph) -> Params:
    """Overwrite rows for iterations [0, upto_iter) from file blocks — the
    frozen-prefix load of the block-wise schedule (reference
    `Main_Functions.py:390-391,418-422`)."""
    out: Params = {}
    for kind in KINDS:
        v = params.get(kind)
        if v is None:
            out[kind] = None
            continue
        rows_np = np.asarray(v).copy()
        file_rows = blocks.get(kind)
        if file_rows is None:
            raise ValueError(f"frozen-prefix blocks missing kind {kind!r}")
        d = spec.dim(kind, graph)
        upto = min(upto_iter, spec.n_rows(kind))
        for t in range(upto):
            rows_np[t] = np.broadcast_to(np.atleast_1d(file_rows[t]), (d,))
        out[kind] = jnp.asarray(rows_np, jnp.float32)
    return out
