"""Syndrome-based early termination ("deploy" mode) tests.

The reference has no deployable early termination — its genie-FER stops on
codeword knowledge (`Print_Functions.py:105-111`).  Deploy mode stops each
frame at its first iteration whose hard decisions satisfy H*x == 0; these
tests pin the per-frame semantics against a NumPy stats-oracle and check
the fused Pallas kernel agrees with the scan backend lane-for-lane.
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
from ldpc_error_floor_tpu.parallel import data_mesh
from ldpc_error_floor_tpu.sim import FERSimulator


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
    # (code, sharing, decoding_type, snr, T)
    ("wman_N0576_R34_z24", (3, 0, 3), 2, 3.25, 8),
    ("wman_N0576_R34_z24", (3, 3, 3), 2, 3.25, 6),   # UCN path
    ("802_11n_N648_R56_z27", (3, 0, 3), 2, 4.0, 6),  # padded sublane rolls
    ("MACKAY_N96_K48", (3, 0, 3), 1, 3.0, 6),        # z=1 code
]


@pytest.mark.parametrize("code_name,sharing,dec_t,snr,T", CASES)
def test_deploy_kernel_matches_scan(code_name, sharing, dec_t, snr, T):
    code = get_code(code_name)
    graph = TannerGraph(code)
    spec = WeightSpec(sharing=sharing, n_iters=T)
    cfg = DecoderConfig(decoding_type=dec_t, q_bit=5)
    dx = NMSDecoder(code, cfg, spec, graph=graph)
    kern = FusedNMSKernel(graph, cfg, spec, tb=8, interpret=True,
                          mode="deploy")
    params = _random_params(spec, graph, jax.random.PRNGKey(1))
    chan = AWGNChannel(code, decoding_type=dec_t, q_bit=5)
    B = 3 * kern.tb * kern.P   # packed kernels decode P codewords per lane
    llr = chan.sample(jax.random.PRNGKey(9),
                      jnp.full((B,), float(code.snr_sigmas([snr])[0])))

    ref = dx.decode(params, llr, collect="deploy")
    app, wrong, nerr, iters, fail = kern.decode_deploy(
        stack_weights(spec, params), llr)

    # mixed regime sanity: some frames stop early, not all succeed instantly
    it = np.asarray(ref.iters)
    assert it.min() < T or it.max() == T
    np.testing.assert_array_equal(np.asarray(wrong), np.asarray(ref.wrong))
    np.testing.assert_array_equal(np.asarray(nerr), np.asarray(ref.bit_errors))
    np.testing.assert_array_equal(np.asarray(iters), np.asarray(ref.iters))
    np.testing.assert_array_equal(np.asarray(fail),
                                  np.asarray(ref.detected_fail))
    np.testing.assert_allclose(np.asarray(app), np.asarray(ref.app),
                               rtol=1e-5, atol=1e-4)


def test_deploy_matches_stats_oracle():
    """Per-frame deploy semantics == first-syndrome-ok row of the stats run."""
    code = get_code("wman_N0576_R34_z24")
    graph = TannerGraph(code)
    T = 8
    spec = WeightSpec(sharing=(3, 0, 3), n_iters=T)
    params = init_weights(spec, graph)
    chan = AWGNChannel(code, decoding_type=2, q_bit=5)
    llr = chan.sample(jax.random.PRNGKey(5),
                      jnp.full((32,), float(code.snr_sigmas([3.25])[0])))

    dep = NMSDecoder(code, DecoderConfig(decoding_type=2, q_bit=5), spec,
                     graph=graph).decode(params, llr, collect="deploy")
    st = NMSDecoder(code, DecoderConfig(decoding_type=2, q_bit=5,
                                        track_syndrome=True), spec,
                    graph=graph).decode(params, llr, collect="stats")
    synd = np.asarray(st.syndrome_ok)
    errf = np.asarray(st.err_flags)
    nerr = np.asarray(st.bit_errors)
    stopped_early = 0
    for b in range(synd.shape[1]):
        ts = np.nonzero(synd[:, b])[0]
        stop = int(ts[0]) if len(ts) else T - 1
        stopped_early += int(len(ts) > 0 and ts[0] < T - 1)
        assert bool(errf[stop, b]) == bool(np.asarray(dep.wrong)[b])
        assert int(nerr[stop, b]) == int(np.asarray(dep.bit_errors)[b])
        assert (stop + 1 if len(ts) else T) == int(np.asarray(dep.iters)[b])
        assert (len(ts) == 0) == bool(np.asarray(dep.detected_fail)[b])
    assert stopped_early > 0, "SNR 3.25 should stop some frames early"


def test_deploy_undetected_errors_are_wrong_codewords():
    """undetected == wrong & syndrome-satisfied: re-check H*x == 0 on APPs."""
    code = get_code("Polar_64_48")
    graph = TannerGraph(code)
    spec = WeightSpec(sharing=(3, 0, 3), n_iters=6)
    dec = NMSDecoder(code, DecoderConfig(decoding_type=1), spec, graph=graph)
    params = init_weights(spec, graph)
    chan = AWGNChannel(code, decoding_type=1)
    # short dense code at moderate SNR: miscorrections do occur
    llr = chan.sample(jax.random.PRNGKey(11),
                      jnp.full((256,), float(code.snr_sigmas([3.0])[0])))
    res = dec.decode(params, llr, collect="deploy")
    bits = (np.asarray(res.app) >= 0).astype(np.int8)
    H = graph.H
    synd_zero = (H.astype(np.int32) @ bits) % 2 == 0
    synd_ok = synd_zero.all(axis=0)
    np.testing.assert_array_equal(~synd_ok, np.asarray(res.detected_fail))
    undet = np.asarray(res.undetected)
    np.testing.assert_array_equal(
        undet, np.asarray(res.wrong) & synd_ok)
    assert undet.sum() > 0, "SNR 3.0 on Polar_64_48 should miscorrect frames"


def test_fer_simulator_syndrome_mode():
    code = get_code("MACKAY_N96_K48")
    graph = TannerGraph(code)
    T = 5
    spec = WeightSpec(sharing=(3, 0, 3), n_iters=T)
    dec = NMSDecoder(code, DecoderConfig(decoding_type=1), spec, graph=graph)
    ch = AWGNChannel(code, decoding_type=1)
    params = init_weights(spec, graph)
    sim = FERSimulator(dec, ch, batch=256, stop="syndrome")
    pt = sim.run_point(params, 2.0, jax.random.PRNGKey(3), max_frames=512,
                       target_frame_errors=None)
    assert pt.frames == 512
    assert 0.0 < pt.fer_last < 1.0
    assert pt.fer_undetected is not None and pt.fer_undetected <= pt.fer_last
    assert 1.0 <= pt.avg_iters <= T
    assert np.isnan(pt.fer_genie)


def test_fer_simulator_syndrome_mesh_matches_unsharded(setup_mesh=None):
    code = get_code("MACKAY_N96_K48")
    graph = TannerGraph(code)
    spec = WeightSpec(sharing=(3, 0, 3), n_iters=4)
    dec = NMSDecoder(code, DecoderConfig(decoding_type=1), spec, graph=graph)
    ch = AWGNChannel(code, decoding_type=1)
    params = init_weights(spec, graph)
    mesh = data_mesh(8)
    sim = FERSimulator(dec, ch, batch=8 * 32, mesh=mesh, stop="syndrome")
    key = jax.random.PRNGKey(21)
    sigma = jnp.float32(code.snr_sigmas([2.0])[0])
    counters = tuple(int(x) for x in sim._step(params, key, sigma))

    tot = [0, 0, 0, 0]
    for d in range(8):
        sub = jax.random.fold_in(key, d)
        llr = ch.sample(sub, jnp.full((32,), sigma, jnp.float32))
        res = dec.decode(params, llr, collect="deploy")
        tot[0] += int(jnp.sum(res.bit_errors))
        tot[1] += int(jnp.sum(res.wrong))
        tot[2] += int(jnp.sum(res.undetected))
        tot[3] += int(jnp.sum(res.iters))
    assert counters == tuple(tot)
