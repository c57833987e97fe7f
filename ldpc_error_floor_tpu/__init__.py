"""ldpc_error_floor_tpu — TPU-native neural min-sum LDPC decoding & training.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference research codebase ghy1228/LDPC_Error_Floor (NeurIPS'23 "Boosting
Learning for LDPC Codes to Improve the Error-Floor Performance" + JSAC
"Boosted Neural Decoders for 6G"), re-designed TPU-first:

* Messages live in node-major padded-dense layouts with the Monte-Carlo
  batch in the TPU lane dimension; Tanner-graph routing is two static row
  gathers per decoding iteration instead of the reference's dense
  [E*z, E*z] lift matmuls (reference: Main_Functions.py:46-150).
* The unrolled decoder (reference: Main_Functions.py:157-385, one TF graph
  layer per iteration) is a single `lax.scan` over iterations with stacked
  per-iteration weights, differentiable end-to-end.
* Monte-Carlo FER simulation, training and uncorrected-word harvesting are
  data-parallel over a `jax.sharding.Mesh` with `psum` reductions.
"""

__version__ = "0.1.0"

from ldpc_error_floor_tpu.codes import Code, TannerGraph, load_proto_matrix
from ldpc_error_floor_tpu.models import DecoderConfig, NMSDecoder

__all__ = [
    "Code",
    "TannerGraph",
    "load_proto_matrix",
    "DecoderConfig",
    "NMSDecoder",
    "__version__",
]
