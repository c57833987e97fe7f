"""GF(2) encoder tests: valid codewords for every bundled code, the
decoder-symmetry fold used by random-codeword simulation, and the
labelled-decode path (the reference's vestigial generator branch,
`Print_Functions.py:41-45`, made real)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_error_floor_tpu.channel import AWGNChannel
from ldpc_error_floor_tpu.codes import (Encoder, TannerGraph, available_codes,
                                        get_code, gf2_rref)
from ldpc_error_floor_tpu.models import (DecoderConfig, NMSDecoder, WeightSpec,
                                         init_weights)
from ldpc_error_floor_tpu.sim import FERSimulator


def test_gf2_rref_known_matrix():
    H = np.array([[1, 1, 0, 1, 0],
                  [0, 1, 1, 0, 1],
                  [1, 0, 1, 1, 1]], np.uint8)
    R, piv = gf2_rref(H)
    # row3 = row1 ^ row2 -> rank 2
    assert piv == [0, 1] and R.shape == (2, 5)
    # RREF rows still span the same code: every original row reduces to 0
    for row in H:
        x = row.copy()
        for i, c in enumerate(piv):
            if x[c]:
                x ^= R[i]
        assert not x.any()


@pytest.mark.parametrize("name", sorted(available_codes()))
def test_encoder_emits_valid_codewords(name):
    code = get_code(name)
    graph = TannerGraph(code)
    enc = Encoder(graph)
    assert enc.k == code.n_full - enc.rank
    bits = enc.random_codewords(jax.random.PRNGKey(0), 8)
    synd = (graph.H.astype(np.int64) @ np.asarray(bits).astype(np.int64)) % 2
    assert not synd.any(), f"{name}: encoder produced non-codewords"
    assert bool(jnp.all(enc.syndrome_ok(bits)))
    # messages actually vary (not the all-zero shortcut)
    assert np.asarray(bits).sum() > 0
    # shortened positions are zero in every codeword
    ss, se = code.short
    if ss > 0:
        assert not np.asarray(bits)[ss - 1:se].any()


def test_random_codeword_decode_equals_symmetry_fold():
    """Decoding y vs labels == decoding sign-folded y vs the zero word —
    the exactness the random-codeword simulator relies on.  Exact for
    continuous (unquantized) channels; under QMS the zero-LLR grid point
    plus the reference's +eps zero-nudge (`Main_Functions.py:229-230`) makes
    tie-breaking direction-dependent, so the fold then reproduces the
    reference's zero-word tie semantics rather than the labelled decode."""
    code = get_code("MACKAY_N96_K48")
    graph = TannerGraph(code)
    enc = Encoder(graph)
    spec = WeightSpec(sharing=(3, 0, 3), n_iters=5)
    dec = NMSDecoder(code, DecoderConfig(decoding_type=1), spec, graph=graph)
    params = init_weights(spec, graph)
    chan = AWGNChannel(code, decoding_type=1)
    B = 64
    bits = enc.random_codewords(jax.random.PRNGKey(1), B)
    sig = jnp.full((B,), float(code.snr_sigmas([2.0])[0]), jnp.float32)
    llr = chan.sample_codewords(jax.random.PRNGKey(2), sig, bits)

    labelled = dec.decode(params, llr, labels=bits, collect="stats")
    folded = dec.decode(params, llr * (1.0 - 2.0 * bits), collect="stats")
    np.testing.assert_array_equal(np.asarray(labelled.err_flags),
                                  np.asarray(folded.err_flags))
    np.testing.assert_array_equal(np.asarray(labelled.bit_errors),
                                  np.asarray(folded.bit_errors))
    assert int(folded.uncor_mask.sum()) > 0, "SNR 2 should leave failures"


def test_fer_simulator_random_codewords():
    code = get_code("MACKAY_N96_K48")
    graph = TannerGraph(code)
    spec = WeightSpec(sharing=(3, 0, 3), n_iters=4)
    dec = NMSDecoder(code, DecoderConfig(decoding_type=1), spec, graph=graph)
    ch = AWGNChannel(code, decoding_type=1)
    params = init_weights(spec, graph)
    key = jax.random.PRNGKey(5)
    pts = {}
    for mode in ("zero", "random"):
        sim = FERSimulator(dec, ch, batch=512, codewords=mode)
        pts[mode] = sim.run_point(params, 2.0, key, max_frames=4096,
                                  target_frame_errors=None)
    # same engine, same frame count; FERs agree within loose MC tolerance
    # (channel symmetry) but are not byte-identical (different RNG usage)
    assert pts["random"].frames == pts["zero"].frames == 4096
    assert 0.0 < pts["random"].fer_genie < 1.0
    assert abs(pts["random"].fer_genie - pts["zero"].fer_genie) < 0.1
