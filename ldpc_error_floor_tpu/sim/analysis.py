"""Failure analysis: classify harvested uncorrected words by trapping-set
signature.

The error-floor papers this framework implements (NeurIPS'23 boosting,
JSAC 6G — `/root/reference/README.md:3`) attribute the floor to (a, b)
trapping sets: decoder fixed points with `a` wrong bits whose induced
subgraph leaves `b` checks unsatisfied.  The reference repo offers no
tooling to inspect them; here the harvested `[Uncor]` datasets (plus any
weight set) can be decoded once more and every failure classified:

* **(a, b) class** — a = Hamming weight of the final hard-decision error
  pattern (vs the all-zero codeword), b = unsatisfied-check count;
  oscillating (non-fixed-point) failures show large a;
* **support statistics** — how concentrated failures are on specific
  variable nodes (trapping sets recur on the same few graph locations).

Everything runs on device in one batch sweep; classification is NumPy.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ldpc_error_floor_tpu.models.nms import NMSDecoder
from ldpc_error_floor_tpu.models.weights import Params


@dataclass
class FailureReport:
    total_words: int
    still_failing: int
    rescued: int
    # (a, b) -> count over still-failing words
    classes: Dict[Tuple[int, int], int] = field(default_factory=dict)
    # variable-node index -> number of failing words whose error support
    # contains it (concentration = trapping sets recurring in place)
    vn_hits: Optional[np.ndarray] = None

    @property
    def top_classes(self) -> List[Tuple[Tuple[int, int], int]]:
        return sorted(self.classes.items(), key=lambda kv: -kv[1])

    def summary(self, k: int = 10) -> str:
        lines = [f"words: {self.total_words}, still failing: "
                 f"{self.still_failing}, rescued: {self.rescued} "
                 f"({self.rescued / max(self.total_words, 1):.1%})",
                 "top (a=wrong bits, b=unsat checks) classes:"]
        for (a, b), n in self.top_classes[:k]:
            lines.append(f"  ({a:3d},{b:3d}): {n}")
        if self.vn_hits is not None and self.still_failing:
            top = np.argsort(-self.vn_hits)[:k]
            lines.append("most-hit variable nodes (bit index: words):")
            lines.append("  " + ", ".join(
                f"{int(i)}:{int(self.vn_hits[i])}" for i in top
                if self.vn_hits[i] > 0))
        return "\n".join(lines)


def classify_failures(decoder: NMSDecoder, params: Params,
                      llr_rows: np.ndarray, batch: int = 1024,
                      track_supports: bool = True) -> FailureReport:
    """Decode harvested LLR rows `[num, N*z]` (p1/p0, all-zero truth) and
    classify every still-failing word by its final (a, b) signature."""
    H = decoder.graph.H.astype(np.int8)
    nz = decoder.code.n_full
    n = (llr_rows.shape[0] // batch) * batch or llr_rows.shape[0]
    classes: Counter = Counter()
    vn_hits = np.zeros(nz, np.int64) if track_supports else None
    failing = 0
    for lo in range(0, n, batch):
        chunk = llr_rows[lo:lo + batch]
        res = decoder.decode(params, jnp.asarray(chunk.T, jnp.float32),
                             collect="stats")
        uncor = np.asarray(res.uncor_mask)
        bits = np.asarray(res.app_last >= 0, np.int8)  # [N*z, B]
        for col in np.nonzero(uncor)[0]:
            e = bits[:, col]
            a = int(e.sum())
            b = int(((H @ e) % 2).sum())
            classes[(a, b)] += 1
            failing += 1
            if vn_hits is not None:
                vn_hits += e.astype(np.int64)
    total = n
    return FailureReport(total_words=total, still_failing=failing,
                         rescued=total - failing, classes=dict(classes),
                         vn_hits=vn_hits)
