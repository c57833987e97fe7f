"""Data-parallel sharding tests on an 8-virtual-device CPU mesh: the mesh
FER engine's psum'd counters must equal a hand-computed per-shard sum with
the same folded RNG streams, and runs must be deterministic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_error_floor_tpu.channel import AWGNChannel
from ldpc_error_floor_tpu.codes import TannerGraph, get_code
from ldpc_error_floor_tpu.models import (DecoderConfig, NMSDecoder, WeightSpec,
                                         init_weights)
from ldpc_error_floor_tpu.parallel import data_mesh
from ldpc_error_floor_tpu.sim import FERSimulator, UncorHarvester


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() == 8, "conftest must provide 8 virtual devices"
    code = get_code("MACKAY_N96_K48")
    graph = TannerGraph(code)
    spec = WeightSpec(sharing=(3, 0, 3), n_iters=4)
    dec = NMSDecoder(code, DecoderConfig(decoding_type=1), spec, graph=graph)
    ch = AWGNChannel(code, decoding_type=1)
    params = init_weights(spec, graph)
    return code, dec, ch, params


def test_mesh_counters_equal_manual_shard_sum(setup):
    code, dec, ch, params = setup
    mesh = data_mesh(8)
    batch = 8 * 64
    sim = FERSimulator(dec, ch, batch=batch, mesh=mesh)
    key = jax.random.PRNGKey(42)
    sigma = jnp.float32(code.snr_sigmas([2.0])[0])
    be, fel, feg = (int(x) for x in sim._step(params, key, sigma))

    # manual: each device's shard with fold_in(key, idx), decoded unsharded
    tb = tf = tg = 0
    for d in range(8):
        sub = jax.random.fold_in(key, d)
        llr = ch.sample(sub, jnp.full((64,), sigma, jnp.float32))
        res = dec.decode(params, llr, collect="stats")
        tb += int(jnp.sum(res.bit_errors[-1]))
        tf += int(jnp.sum(res.err_flags[-1]))
        tg += int(jnp.sum(res.uncor_mask))
    assert (be, fel, feg) == (tb, tf, tg)
    assert feg > 0, "SNR 2 on MacKay should produce failures"


def test_mesh_run_deterministic(setup):
    code, dec, ch, params = setup
    mesh = data_mesh(8)
    sim = FERSimulator(dec, ch, batch=256, mesh=mesh)
    key = jax.random.PRNGKey(7)
    pt1 = sim.run_point(params, 2.0, key, max_frames=1024,
                        target_frame_errors=None)
    pt2 = sim.run_point(params, 2.0, key, max_frames=1024,
                        target_frame_errors=None)
    assert pt1.fer_genie == pt2.fer_genie
    assert pt1.ber_last == pt2.ber_last
    assert pt1.frames == 1024


def test_mesh_harvester_matches_unsharded_failure_count(setup):
    code, dec, ch, params = setup
    mesh = data_mesh(8)
    h = UncorHarvester(dec, ch, batch=256, mesh=mesh)
    key = jax.random.PRNGKey(9)
    words = h.collect(params, 2.0, key, target_words=5, max_frames=256)
    # every harvested word must genuinely fail decoding
    if words.shape[0]:
        res = dec.decode(params, jnp.asarray(words.T), collect="stats")
        assert bool(jnp.all(res.uncor_mask))


def test_smaller_mesh_subset(setup):
    code, dec, ch, params = setup
    mesh = data_mesh(4)
    sim = FERSimulator(dec, ch, batch=128, mesh=mesh)
    pt = sim.run_point(params, 3.0, jax.random.PRNGKey(1), max_frames=512,
                       target_frame_errors=None)
    assert pt.frames == 512
    assert 0 <= pt.fer_genie <= 1


def test_inner_steps_counters_match_manual_loop(setup):
    """inner_steps=K runs K on-device batches per host sync; totals must
    equal K manual single-step calls on the same split subkeys."""
    code, dec, ch, params = setup
    sim1 = FERSimulator(dec, ch, batch=64)
    simk = FERSimulator(dec, ch, batch=64, inner_steps=4)
    assert simk.inner_steps == 4
    key = jax.random.PRNGKey(5)
    sigma = jnp.float32(code.snr_sigmas([2.0])[0])
    got = tuple(int(x) for x in simk._step(params, key, sigma))
    want = np.zeros(3, np.int64)
    for sub in jax.random.split(key, 4):
        want += np.array([int(x) for x in sim1._step(params, sub, sigma)])
    assert got == tuple(want)
    assert got[2] > 0


def test_inner_steps_mesh_matches_totals(setup):
    code, dec, ch, params = setup
    mesh = data_mesh(8)
    simk = FERSimulator(dec, ch, batch=256, mesh=mesh, inner_steps=3)
    pt = simk.run_point(params, 2.0, jax.random.PRNGKey(3),
                        max_frames=2 * 3 * 256, target_frame_errors=None)
    assert pt.frames == 2 * 3 * 256
    assert 0 < pt.fer_genie <= 1


def test_inner_steps_int32_headroom_clamp(setup):
    code, dec, ch, params = setup
    sim = FERSimulator(dec, ch, batch=1 << 20, inner_steps=1 << 20)
    nbits = dec.target * dec.z
    assert sim.inner_steps * (1 << 20) * nbits < 2 ** 31


def test_collection_pipeline_mesh_pallas(setup, tmp_path):
    """run_collection's mesh + Pallas path (per-device kernel tiles inside
    shard_map) — interpret mode on the CPU test platform."""
    from ldpc_error_floor_tpu.models import DecoderConfig, NMSDecoder
    code, dec, ch, params = setup
    mesh = data_mesh(8)
    dec_p = NMSDecoder(code, DecoderConfig(decoding_type=1, backend="pallas",
                                           pallas_tb=8), dec.spec,
                       graph=dec.graph)
    # per-device batch must fill tb * P lanes (z=1 MacKay packs P=8 batch
    # groups into the sublanes): 8 devices x (8 * 8) = 512
    h_p = UncorHarvester(dec_p, ch, batch=8 * 64, mesh=mesh, cap=16)
    h_x = UncorHarvester(dec, ch, batch=8 * 64, mesh=mesh, cap=16)
    key = jax.random.PRNGKey(11)
    w_p = h_p.collect(params, 2.0, key, target_words=10 ** 9, max_frames=512)
    w_x = h_x.collect(params, 2.0, key, target_words=10 ** 9, max_frames=512)
    assert w_p.shape[0] > 0
    np.testing.assert_array_equal(w_p, w_x)
