"""Golden tests: the scan-based TPU decoder vs an independent NumPy oracle
that walks the dense lifted H edge-by-edge (tests/oracle.py)."""

import numpy as np
import pytest

from ldpc_error_floor_tpu.codes import TannerGraph, get_code
from ldpc_error_floor_tpu.models import (DecoderConfig, NMSDecoder, WeightSpec,
                                         init_weights)
from oracle import oracle_decode

RNG = np.random.default_rng(1234)


def random_llr(code, batch, scale=2.5):
    return (RNG.standard_normal((code.n_full, batch)) * scale).astype(np.float32)


def random_weights(spec, graph, lo=0.3, hi=1.7):
    params = init_weights(spec, graph)
    out = {}
    for k, v in params.items():
        if v is None:
            out[k] = None
        else:
            out[k] = np.asarray(RNG.uniform(lo, hi, v.shape), np.float32)
    return out


CASES = [
    # (code, decoding_type, sharing, n_iters, fixed_iter)
    ("MACKAY_N96_K48", 2, (3, 0, 3), 5, 0),
    ("MACKAY_N96_K48", 1, (2, 2, 2), 4, 0),
    ("MACKAY_N96_K48", 0, (3, 0, 0), 4, 0),
    ("wman_N0576_R34_z24", 2, (3, 3, 3), 5, 0),
    ("wman_N0576_R34_z24", 2, (1, 1, 3), 4, 0),
    ("wman_N0576_R34_z24", 1, (2, 0, 2), 4, 0),
    ("wman_N0576_R34_z24", 2, (4, 0, 5), 6, 2),  # temporal sharing past iter 2
    ("BCH_63_51", 2, (2, 2, 2), 3, 0),
]


@pytest.mark.parametrize("code_name,dtype,sharing,n_iters,fixed_iter", CASES)
def test_decoder_matches_oracle(code_name, dtype, sharing, n_iters, fixed_iter):
    code = get_code(code_name, punct=(0, 0), short=(0, 0))
    graph = TannerGraph(code)
    spec = WeightSpec(sharing=sharing, n_iters=n_iters, fixed_iter=fixed_iter)
    cfg = DecoderConfig(decoding_type=dtype, q_bit=5)
    dec = NMSDecoder(code, cfg, spec, graph=graph)

    batch = 4
    llr = random_llr(code, batch)
    params = random_weights(spec, graph)

    got = np.asarray(dec.decode(params, llr, collect="apps").apps)
    want = oracle_decode(code.proto, code.z, llr, n_iters, sharing, params,
                         decoding_type=dtype, q_bit=5, fixed_iter=fixed_iter)
    assert got.shape == want.shape
    if dtype == 0:
        # sum-product: atanh near +-1 amplifies fp-associativity differences
        # between the cumprod-based extrinsic and the oracle's serial product
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    else:
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)


def test_decoder_zero_message_eps_path():
    """Punctured bits inject exact-zero LLRs; the epsilon nudges must keep
    min-sum consistent with the oracle."""
    code = get_code("5G_LDPC_R0.50_n_dec640_n512_k256_z32_s257_320")
    graph = TannerGraph(code)
    spec = WeightSpec(sharing=(3, 0, 3), n_iters=4)
    cfg = DecoderConfig(decoding_type=2, q_bit=5)
    dec = NMSDecoder(code, cfg, spec, graph=graph)
    llr = random_llr(code, 3)
    # zero out the punctured range, clamp the shortened range (as the channel does)
    llr[0:64] = 0.0
    llr[256:320] = -20.0
    params = random_weights(spec, graph)
    got = np.asarray(dec.decode(params, llr, collect="apps").apps)
    want = oracle_decode(code.proto, code.z, llr, 4, (3, 0, 3), params,
                         decoding_type=2, q_bit=5)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)


def test_stats_collect_consistency():
    """collect='stats' flags must equal flags derived from collect='apps'."""
    code = get_code("wman_N0576_R34_z24")
    graph = TannerGraph(code)
    spec = WeightSpec(sharing=(3, 0, 3), n_iters=5)
    dec = NMSDecoder(code, DecoderConfig(decoding_type=2), spec, graph=graph)
    llr = random_llr(code, 8, scale=1.0)
    llr -= 2.0  # bias toward the all-zero word
    params = init_weights(spec, graph)
    r_apps = dec.decode(params, llr, collect="apps")
    r_stats = dec.decode(params, llr, collect="stats")
    wrong = np.asarray(r_apps.apps) >= 0
    np.testing.assert_array_equal(np.asarray(r_stats.err_flags), wrong.any(axis=1))
    np.testing.assert_array_equal(np.asarray(r_stats.bit_errors),
                                  wrong.sum(axis=1).astype(np.int32))
    np.testing.assert_allclose(np.asarray(r_stats.app_last),
                               np.asarray(r_apps.apps)[-1], rtol=1e-5, atol=1e-5)


def test_all_ones_weights_equal_plain_minsum():
    """With all weights = 1 the NMS decoder must equal unweighted min-sum
    (sharing (3,0,3) with unit weights vs sharing (0,0,0)-style no-weight
    magnitudes)."""
    code = get_code("MACKAY_N96_K48")
    graph = TannerGraph(code)
    cfg = DecoderConfig(decoding_type=1)
    spec_w = WeightSpec(sharing=(3, 0, 3), n_iters=6)
    dec_w = NMSDecoder(code, cfg, spec_w, graph=graph)
    llr = random_llr(code, 5, scale=1.5) - 1.0
    apps_w = np.asarray(dec_w.decode(init_weights(spec_w, graph), llr,
                                     collect="apps").apps)

    spec_p = WeightSpec(sharing=(3, 0, 0), n_iters=6)
    dec_p = NMSDecoder(code, cfg, spec_p, graph=graph)
    apps_p = np.asarray(dec_p.decode(init_weights(spec_p, graph), llr,
                                     collect="apps").apps)
    np.testing.assert_allclose(apps_w, apps_p, rtol=1e-5, atol=1e-5)
