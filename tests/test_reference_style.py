"""The dense reference-style decoder (benchmark baseline) must agree with the
gather-map decoder — an independent cross-check of the whole dataflow."""

import sys

import numpy as np
import jax.numpy as jnp

from ldpc_error_floor_tpu.codes import TannerGraph, get_code
from ldpc_error_floor_tpu.models import DecoderConfig, NMSDecoder, WeightSpec

sys.path.insert(0, "benchmarks")
from reference_style import DenseReferenceDecoder  # noqa: E402


def test_dense_reference_matches_gather_decoder():
    code = get_code("wman_N0576_R34_z24")
    graph = TannerGraph(code)
    T = 5
    rng = np.random.default_rng(0)
    w_cn = jnp.asarray(rng.uniform(0.5, 1.5, (T,)), jnp.float32)
    w_vn = jnp.asarray(rng.uniform(0.5, 1.5, (T,)), jnp.float32)
    llr = (rng.standard_normal((code.n_full, 4)) * 3).astype(np.float32)

    dense = DenseReferenceDecoder(graph, n_iters=T, decoding_type=2, q_bit=5)
    app_d, errs_d = dense.decode(w_cn, w_vn,
                                 jnp.asarray(llr.T.reshape(4, code.N, code.z)))

    spec = WeightSpec(sharing=(3, 0, 3), n_iters=T)
    dec = NMSDecoder(code, DecoderConfig(decoding_type=2, q_bit=5), spec,
                     graph=graph)
    params = {"cn": w_cn[:, None], "ucn": None, "vn": w_vn[:, None]}
    res = dec.decode(params, jnp.asarray(llr), collect="stats")

    np.testing.assert_allclose(np.asarray(app_d).T, np.asarray(res.app_last),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(errs_d), np.asarray(res.err_flags))
