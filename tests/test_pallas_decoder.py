"""Fused Pallas kernel vs the lax.scan decoder — must agree bit-for-bit on
error flags / bit-error counts and to float tolerance on APPs.

Runs in Pallas interpreter mode on the CPU test platform; the same kernel
compiles natively on TPU (exercised by bench.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_error_floor_tpu.channel import AWGNChannel
from ldpc_error_floor_tpu.codes import TannerGraph, get_code
from ldpc_error_floor_tpu.models import (DecoderConfig, NMSDecoder, WeightSpec,
                                         init_weights)
from ldpc_error_floor_tpu.models.weights import stack_weights
from ldpc_error_floor_tpu.ops.pallas_decoder import FusedNMSKernel


def _random_params(spec, graph, key):
    params = init_weights(spec, graph)
    out = {}
    for k, v in params.items():
        if v is None:
            out[k] = None
        else:
            key, sub = jax.random.split(key)
            out[k] = 0.7 + 0.6 * jax.random.uniform(sub, v.shape)
    return out


CASES = [
    # (code, sharing, decoding_type, q_bit, n_iters, z_override)
    ("wman_N0576_R34_z24", (3, 0, 3), 2, 5, 6, 0),  # QMS, scalar weights
    ("wman_N0576_R34_z24", (3, 3, 3), 2, 5, 5, 0),  # QMS + UCN
    ("wman_N0576_R34_z24", (2, 2, 2), 1, 5, 4, 0),  # MS, per-node + UCN
    ("wman_N0576_R34_z24", (1, 0, 0), 1, 5, 3, 0),  # MS, per-edge CN weights
    ("MACKAY_N96_K48", (3, 0, 3), 2, 5, 4, 0),      # z=1: sublane packing P=8
    ("MACKAY_N96_K48", (3, 3, 3), 2, 5, 3, 0),      # z=1 packed + UCN parity
    ("wman_N0576_R34_z24", (0, 0, 0), 0, 5, 3, 0),  # plain sum-product
    ("802_11n_N648_R56_z27", (3, 0, 3), 2, 5, 3, 0),  # z=27: padded rolls
    ("5G_LDPC_R0.50_n_dec640_n512_k256_z32_s257_320",
     (2, 2, 2), 2, 5, 3, 0),                        # punctured/shortened code
    ("wman_N0576_R34_z24", (4, 4, 5), 2, 5, 5, 0),  # temporal sharing (JSAC
    #   dynamic weight sharing): rows past fixed_iter reuse the pivot row
    ("wman_N0576_R34_z24", (5, 5, 5), 1, 5, 4, 0),
    ("wman_N0576_R34_z24", (3, 3, 3), 2, 5, 3, 4),  # z=4: P=2 packed groups
    #   with nonzero shifts — group-confined rolls must not mix groups
    ("wman_N0576_R34_z24", (3, 0, 3), 1, 5, 3, 3),  # z=3: P=2 packed groups
    #   PLUS 2 leftover pad sublanes (prows=6 < zp=8)
]


@pytest.mark.parametrize("code_name,sharing,dec,q,T,zov", CASES)
def test_fused_matches_scan(code_name, sharing, dec, q, T, zov):
    code = get_code(code_name, z=zov) if zov else get_code(code_name)
    graph = TannerGraph(code)
    temporal = any(s in (4, 5) for s in sharing)
    spec = WeightSpec(sharing=sharing, n_iters=T,
                      fixed_iter=2 if temporal else 0)
    cfg = DecoderConfig(decoding_type=dec, q_bit=q)
    dec_scan = NMSDecoder(code, cfg, spec, graph=graph)
    kern = FusedNMSKernel(graph, cfg, spec, tb=8, interpret=True)

    key = jax.random.PRNGKey(42)
    params = _random_params(spec, graph, key)
    chan = AWGNChannel(code, decoding_type=dec, q_bit=q)
    B = 2 * kern.tb * kern.P   # packed kernels decode P codewords per lane
    sigma = jnp.full((B,), float(code.snr_sigmas([2.5])[0]), jnp.float32)
    llr = chan.sample(jax.random.PRNGKey(7), sigma)

    ref = dec_scan.decode(params, llr, collect="stats")
    app, err, nerr = kern.decode_stats(stack_weights(spec, params), llr)

    np.testing.assert_allclose(np.asarray(app), np.asarray(ref.app_last),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(err), np.asarray(ref.err_flags))
    np.testing.assert_array_equal(np.asarray(nerr), np.asarray(ref.bit_errors))


def test_backend_config_routes_to_pallas():
    code = get_code("wman_N0576_R34_z24")
    graph = TannerGraph(code)
    spec = WeightSpec(sharing=(3, 0, 3), n_iters=4)
    cfg_p = DecoderConfig(decoding_type=2, q_bit=5, backend="pallas",
                          pallas_tb=8)
    cfg_x = DecoderConfig(decoding_type=2, q_bit=5)
    dp = NMSDecoder(code, cfg_p, spec, graph=graph)
    dp._fused = FusedNMSKernel(graph, cfg_p, spec, tb=8, interpret=True)
    dx = NMSDecoder(code, cfg_x, spec, graph=graph)
    params = init_weights(spec, graph)
    chan = AWGNChannel(code)
    llr = chan.sample(jax.random.PRNGKey(3),
                      jnp.full((8,), float(code.snr_sigmas([3.0])[0])))
    rp = dp.decode(params, llr, collect="stats")
    rx = dx.decode(params, llr, collect="stats")
    np.testing.assert_array_equal(np.asarray(rp.err_flags),
                                  np.asarray(rx.err_flags))
    assert bool(jnp.all(rp.uncor_mask == rx.uncor_mask))


def test_early_stop_genie_exact():
    """Early stop must leave genie-FER/uncor identical to the full run."""
    code = get_code("wman_N0576_R34_z24")
    graph = TannerGraph(code)
    spec = WeightSpec(sharing=(3, 0, 3), n_iters=8)
    cfg = DecoderConfig(decoding_type=2, q_bit=5)
    kern_full = FusedNMSKernel(graph, cfg, spec, tb=8, interpret=True)
    kern_es = FusedNMSKernel(graph, cfg, spec, tb=8, interpret=True,
                             early_stop=True)
    params = init_weights(spec, graph)
    stacked = stack_weights(spec, params)
    chan = AWGNChannel(code)
    # moderate SNR: most frames decode early, some never do
    llr = chan.sample(jax.random.PRNGKey(5),
                      jnp.full((16,), float(code.snr_sigmas([2.5])[0])))
    _, err_f, _ = kern_full.decode_stats(stacked, llr)
    _, err_e, _ = kern_es.decode_stats(stacked, llr)
    uncor_f = np.asarray(jnp.all(err_f, axis=0))
    uncor_e = np.asarray(jnp.all(err_e, axis=0))
    np.testing.assert_array_equal(uncor_f, uncor_e)


def test_offset_min_sum_kernel_matches_scan():
    """neural_mode='offset' (OMS, arXiv:1701.05931): kernel vs scan."""
    code = get_code("wman_N0576_R34_z24")
    graph = TannerGraph(code)
    spec = WeightSpec(sharing=(2, 2, 2), n_iters=5)
    cfg = DecoderConfig(decoding_type=2, q_bit=5, neural_mode="offset")
    dec_scan = NMSDecoder(code, cfg, spec, graph=graph)
    kern = FusedNMSKernel(graph, cfg, spec, tb=8, interpret=True)

    key = jax.random.PRNGKey(4)
    params = init_weights(spec, graph)
    # random offsets in [0, 0.6] (VN weights stay multiplicative ~1)
    for k in ("cn", "ucn"):
        key, sub = jax.random.split(key)
        params[k] = 0.6 * jax.random.uniform(sub, params[k].shape)
    chan = AWGNChannel(code, decoding_type=2, q_bit=5)
    llr = chan.sample(jax.random.PRNGKey(8),
                      jnp.full((16,), float(code.snr_sigmas([3.0])[0])))

    ref = dec_scan.decode(params, llr, collect="stats")
    app, err, nerr = kern.decode_stats(stack_weights(spec, params), llr)
    np.testing.assert_allclose(np.asarray(app), np.asarray(ref.app_last),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(err), np.asarray(ref.err_flags))
    np.testing.assert_array_equal(np.asarray(nerr), np.asarray(ref.bit_errors))
    # offsets actually bite: zero-offset decode differs
    p0 = dict(params, cn=jnp.zeros_like(params["cn"]),
              ucn=jnp.zeros_like(params["ucn"]))
    ref0 = dec_scan.decode(p0, llr, collect="stats")
    assert not np.array_equal(np.asarray(ref0.bit_errors),
                              np.asarray(ref.bit_errors))


def test_raw_unquantized_llr_parity():
    """QMS with no VN weights fed *raw* (unquantized) LLRs: the kernel must
    quantize the channel input exactly like the scan backend does
    (reference Main_Functions.py:176-177 quantizes unconditionally).
    Regression test for a hole where the kernel only quantized when VN
    weights were enabled."""
    code = get_code("wman_N0576_R34_z24")
    graph = TannerGraph(code)
    spec = WeightSpec(sharing=(3, 0, 0), n_iters=5)  # vn_mode == 0
    cfg = DecoderConfig(decoding_type=2, q_bit=5)
    dec_scan = NMSDecoder(code, cfg, spec, graph=graph)
    kern = FusedNMSKernel(graph, cfg, spec, tb=8, interpret=True)
    params = _random_params(spec, graph, jax.random.PRNGKey(11))
    # raw float LLRs straight off the channel, NOT pre-quantized
    chan = AWGNChannel(code, decoding_type=1)  # MS channel: no quantization
    llr = chan.sample(jax.random.PRNGKey(12),
                      jnp.full((16,), float(code.snr_sigmas([3.0])[0])))
    assert not np.allclose(np.asarray(llr),
                           np.round(np.asarray(llr) * 2.0) / 2.0)
    ref = dec_scan.decode(params, llr, collect="stats")
    app, err, nerr = kern.decode_stats(stack_weights(spec, params), llr)
    np.testing.assert_allclose(np.asarray(app), np.asarray(ref.app_last),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(err), np.asarray(ref.err_flags))
    np.testing.assert_array_equal(np.asarray(nerr), np.asarray(ref.bit_errors))
