"""Long-run resilience (counter+RNG resume for the MC engine and the
harvester) and non-zero-codeword training (the reference's
`train_on_zero_word=False` switch, `main_Base.py:70`)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_error_floor_tpu.channel import AWGNChannel, mix_sigma_lanes
from ldpc_error_floor_tpu.codes import TannerGraph, get_code
from ldpc_error_floor_tpu.io.uncor_files import read_uncor_file
from ldpc_error_floor_tpu.models import (DecoderConfig, NMSDecoder, WeightSpec,
                                         init_weights)
from ldpc_error_floor_tpu.pipelines import ExperimentConfig, run_training
from ldpc_error_floor_tpu.sim import FERSimulator, UncorHarvester


@pytest.fixture(scope="module")
def setup():
    code = get_code("MACKAY_N96_K48")
    graph = TannerGraph(code)
    spec = WeightSpec(sharing=(3, 0, 3), n_iters=3)
    dec = NMSDecoder(code, DecoderConfig(decoding_type=1), spec, graph=graph)
    ch = AWGNChannel(code, decoding_type=1)
    params = init_weights(spec, graph)
    return code, graph, spec, dec, ch, params


def test_sim_resume_matches_uninterrupted(setup, tmp_path):
    code, graph, spec, dec, ch, params = setup
    sim = FERSimulator(dec, ch, batch=256)
    key = jax.random.PRNGKey(13)

    full = sim.run_point(params, 2.0, key, max_frames=1024,
                         target_frame_errors=None)

    ckpt = str(tmp_path / "pt.json")
    part = sim.run_point(params, 2.0, key, max_frames=512,
                         target_frame_errors=None, ckpt_path=ckpt,
                         ckpt_every_s=0.0)
    assert part.frames == 512 and os.path.exists(ckpt)
    resumed = sim.run_point(params, 2.0, key, max_frames=1024,
                            target_frame_errors=None, ckpt_path=ckpt,
                            ckpt_every_s=0.0)
    assert resumed.frames == full.frames
    assert resumed.ber_last == full.ber_last
    assert resumed.fer_last == full.fer_last
    assert resumed.fer_genie == full.fer_genie
    assert full.fer_genie > 0


def test_sim_resume_ignores_other_snr(setup, tmp_path):
    code, graph, spec, dec, ch, params = setup
    sim = FERSimulator(dec, ch, batch=256)
    key = jax.random.PRNGKey(13)
    ckpt = str(tmp_path / "pt.json")
    sim.run_point(params, 2.0, key, max_frames=512,
                  target_frame_errors=None, ckpt_path=ckpt, ckpt_every_s=0.0)
    other = sim.run_point(params, 3.0, key, max_frames=512,
                          target_frame_errors=None, ckpt_path=ckpt,
                          ckpt_every_s=0.0)
    assert other.frames == 512  # fresh run, not resumed from the 2.0 file


def test_sim_max_frames_strict(setup):
    """Counters never exceed max_frames; a sub-chunk max_frames is an
    explicit error instead of a silent overshoot (VERDICT r2 weak #5)."""
    code, graph, spec, dec, ch, params = setup
    sim = FERSimulator(dec, ch, batch=256)
    key = jax.random.PRNGKey(3)
    pt = sim.run_point(params, 2.0, key, max_frames=600,
                       target_frame_errors=None)
    assert pt.frames == 512  # two whole chunks, not three
    with pytest.raises(ValueError, match="below one simulation chunk"):
        sim.run_point(params, 2.0, key, max_frames=100,
                      target_frame_errors=None)


def test_sim_completed_point_reruns_as_done(setup, tmp_path):
    """Re-running a completed point with the same limits returns its final
    counters without extending it (ADVICE r2: stale-checkpoint resume)."""
    code, graph, spec, dec, ch, params = setup
    sim = FERSimulator(dec, ch, batch=256)
    key = jax.random.PRNGKey(13)
    ckpt = str(tmp_path / "pt.json")
    first = sim.run_point(params, 2.0, key, max_frames=512,
                          target_frame_errors=None, ckpt_path=ckpt,
                          ckpt_every_s=1e9)  # only the final record
    rerun = sim.run_point(params, 2.0, key, max_frames=512,
                          target_frame_errors=None, ckpt_path=ckpt)
    assert rerun.frames == first.frames == 512
    assert rerun.ber_last == first.ber_last
    assert rerun.frames_per_sec == 0.0  # no new frames simulated
    # a target already met by the resumed counters also launches nothing
    tgt = sim.run_point(params, 2.0, key, max_frames=10 ** 6,
                        target_frame_errors=1, ckpt_path=ckpt)
    assert tgt.frames == 512
    # but genuinely raised limits extend the point
    more = sim.run_point(params, 2.0, key, max_frames=1024,
                         target_frame_errors=None, ckpt_path=ckpt)
    assert more.frames == 1024


def test_harvester_resume_appends_identically(setup, tmp_path):
    code, graph, spec, dec, ch, params = setup
    key = jax.random.PRNGKey(5)

    h = UncorHarvester(dec, ch, batch=128, cap=128)
    f_full = str(tmp_path / "full.txt")
    h.collect(params, 2.0, key, target_words=10 ** 9, max_frames=512,
              out_file=f_full)
    rows_full = read_uncor_file(f_full)
    assert rows_full.shape[0] > 0

    f_res = str(tmp_path / "resumed.txt")
    ckpt = str(tmp_path / "harvest.json")
    h.collect(params, 2.0, key, target_words=10 ** 9, max_frames=256,
              out_file=f_res, ckpt_path=ckpt, ckpt_every_s=0.0)
    h.collect(params, 2.0, key, target_words=10 ** 9, max_frames=512,
              out_file=f_res, ckpt_path=ckpt, ckpt_every_s=0.0)
    np.testing.assert_array_equal(read_uncor_file(f_res), rows_full)


def test_harvester_resume_truncates_post_checkpoint_rows(setup, tmp_path):
    """Crash-window duplicates (ADVICE r2, medium): rows appended to
    out_file *after* the last checkpoint are regenerated by the resumed
    RNG — the resume must truncate them or the file double-counts words."""
    code, graph, spec, dec, ch, params = setup
    key = jax.random.PRNGKey(5)
    h = UncorHarvester(dec, ch, batch=128, cap=128)

    f_full = str(tmp_path / "full.txt")
    h.collect(params, 2.0, key, target_words=10 ** 9, max_frames=512,
              out_file=f_full)
    rows_full = read_uncor_file(f_full)

    # run to 256 frames with per-batch checkpoints, then simulate a crash
    # after further batches were appended but before their checkpoint: the
    # appended-but-unaccounted rows are exactly what the resume regenerates
    f_res = str(tmp_path / "resumed.txt")
    ckpt = str(tmp_path / "harvest.json")
    h.collect(params, 2.0, key, target_words=10 ** 9, max_frames=256,
              out_file=f_res, ckpt_path=ckpt, ckpt_every_s=0.0)
    with open(f_res) as f:
        accounted = f.read()
    extra = accounted.splitlines(keepends=True)
    with open(f_res, "a") as f:
        f.writelines(extra[:3])  # the crash-window appends
    h.collect(params, 2.0, key, target_words=10 ** 9, max_frames=512,
              out_file=f_res, ckpt_path=ckpt, ckpt_every_s=0.0)
    np.testing.assert_array_equal(read_uncor_file(f_res), rows_full)


def test_random_codeword_training_moves_weights(tmp_path):
    cfg = ExperimentConfig(
        code="MACKAY_N96_K48", sharing=(3, 0, 3), decoding_type=1,
        iters_max=2, fixed_iter=0, iter_step=2,
        sampling_type=0, train_on_zero_word=0, loss_type=0, opt_metric=2,
        etha_start=0.0, learn_rate_start=1e-2,
        batch_size=32, training_num=128, epochs=2,
        valid_flag=1, valid_num=64, snrs=[2.0, 3.0], seed=8,
        out_dir=str(tmp_path))
    res = run_training(cfg, verbose=False)
    assert all(np.isfinite(h["train_loss"]) for h in res.history[1:])
    assert res.history[1]["train_loss"] > 0
    moved = np.asarray(res.params["cn"])
    assert np.any(np.abs(moved - 1.0) > 1e-6), "weights did not move"


def test_random_codeword_config_validation():
    with pytest.raises(ValueError, match="BCE"):
        ExperimentConfig(train_on_zero_word=0, loss_type=2).validate()
    with pytest.raises(ValueError, match="fresh-AWGN"):
        ExperimentConfig(train_on_zero_word=0, loss_type=0,
                         sampling_type=1).validate()


def test_random_codeword_epoch_differs_from_zero_word(setup):
    """The encoder branch must actually change the training signal: same
    key, zero-word vs random-codeword epochs give different losses."""
    from ldpc_error_floor_tpu.codes.encoder import Encoder
    from ldpc_error_floor_tpu.training.train import (make_epoch_step,
                                                     make_optimizer)
    code, graph, spec, dec, ch, params = setup
    batch = 32
    sigmas = jnp.asarray(mix_sigma_lanes(code.snr_sigmas([2.0]), batch))
    labels = jnp.zeros((code.n_full, batch), jnp.float32)
    key = jax.random.PRNGKey(1)
    losses = {}
    for name, enc in (("zero", None), ("random", Encoder(graph))):
        opt = make_optimizer(1e-2)
        step = make_epoch_step(dec, spec, loss_type=0, train_start=0,
                               train_end=spec.n_iters, fixed_init=0,
                               optimizer=opt, n_steps=3, labels=labels,
                               channel=ch, sigmas=sigmas, encoder=enc)
        p0 = init_weights(spec, graph)
        _, _, loss = step(p0, opt.init(p0), key, jnp.float32(0.0))
        losses[name] = float(loss)
    assert np.isfinite(losses["zero"]) and np.isfinite(losses["random"])
    assert losses["zero"] != losses["random"]
