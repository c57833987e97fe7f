"""End-to-end miniature boosting pipeline on the small MacKay code:
train base -> collect uncorrected words -> split -> train post (UCN weights,
frozen base prefix).  Exercises C11-C17 of the component inventory."""

import os

import numpy as np
import pytest

from ldpc_error_floor_tpu.io.uncor_files import read_uncor_file
from ldpc_error_floor_tpu.io.weight_files import read_weight_file
from ldpc_error_floor_tpu.pipelines import (ExperimentConfig, run_collection,
                                            run_training, split_uncor_dataset)


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("pipeline")


@pytest.fixture(scope="module")
def base_cfg(workdir):
    return ExperimentConfig(
        code="MACKAY_N96_K48",
        sharing=(3, 0, 3), sampling_type=0, decoding_type=1,
        iters_max=4, fixed_iter=0, fixed_init=0, iter_step=4,
        loss_type=0, opt_metric=1, etha_start=0.0,
        learn_rate_start=5e-3, batch_size=40, training_num=400, epochs=2,
        valid_flag=1, valid_num=200, snrs=[2.0, 4.0], seed=3,
        out_dir=str(workdir / "Weights"), input_dir=str(workdir / "Inputs"),
        out_prefix="T_MACKAY")


@pytest.fixture(scope="module")
def base_trained(base_cfg):
    return run_training(base_cfg, verbose=False)


def test_base_training_artifacts(base_cfg, base_trained):
    res = base_trained
    assert res.params["cn"].shape == (4, 1)
    pre = os.path.join(base_cfg.out_dir, base_cfg.out_prefix)
    assert os.path.exists(pre + "_Weight_End4.txt")
    assert os.path.exists(pre + "_Opt_Weight_End4.txt")
    assert os.path.exists(pre + "_Performance.txt")
    sharing, blocks = read_weight_file(pre + "_Opt_Weight_End4.txt")
    assert sharing == (3, 0, 3)
    assert len(blocks["cn"]) == 4 and blocks["ucn"] is None
    # epoch 0 is eval-only; history carries valid metrics for 3 epochs
    assert len(res.history) == 3
    assert res.history[0]["train_loss"] == 0.0


def test_collect_and_split(base_cfg, base_trained, workdir):
    ccfg = ExperimentConfig(
        code="MACKAY_N96_K48", sharing=(3, 0, 3), sampling_type=2,
        decoding_type=1, iters_max=4, iter_step=4, snrs=[1.0],  # low SNR: fails often
        out_dir=base_cfg.out_dir, out_prefix="T_MACKAY", seed=5)
    uncor_path = str(workdir / "Uncor.txt")
    words = run_collection(ccfg, target_words=60, batch=128,
                           out_file=uncor_path, max_frames=40_000)
    assert words.shape[0] >= 60 and words.shape[1] == 96
    stored = read_uncor_file(uncor_path)
    # writer stores -LLR at %.1f precision; reader negates back
    np.testing.assert_allclose(stored[: words.shape[0]], words, atol=0.051)

    split_uncor_dataset(uncor_path, "MACKAY_N96_K48", base_cfg.input_dir,
                        n_train=40, n_valid=10, n_test=10)
    for suffix in (".txt", "_Valid.txt", "_Test.txt"):
        assert os.path.exists(os.path.join(base_cfg.input_dir,
                                           f"[Uncor]_MACKAY_N96_K48{suffix}"))


def test_post_training_on_uncor_words(base_cfg, workdir):
    post_cfg = ExperimentConfig(
        code="MACKAY_N96_K48",
        sharing=(3, 3, 3), sampling_type=1, decoding_type=1,
        iters_max=6, fixed_iter=4, fixed_init=0, iter_step=2,
        loss_type=0, opt_metric=1, learn_rate_start=5e-3,
        batch_size=10, training_num=40, epochs=1,
        valid_flag=1, valid_num=10, test_flag=1, test_num=10,
        snrs=[2.0, 2.5], seed=7,
        out_dir=base_cfg.out_dir, input_dir=base_cfg.input_dir,
        out_prefix="T_MACKAY")
    # post training needs the frozen base prefix file under sharing (3,3,3):
    # re-save the base weights with UCN rows (ones), as the reference's
    # published base artifact does (header "3 3 3").
    from ldpc_error_floor_tpu.io.weight_files import write_weight_file
    pre = os.path.join(base_cfg.out_dir, "T_MACKAY")
    _, blocks = read_weight_file(pre + "_Opt_Weight_End4.txt")
    blocks["ucn"] = [np.ones(1, np.float32) for _ in range(4)]
    write_weight_file(pre + "_Opt_Weight_End4.txt", (3, 3, 3), blocks)

    res = run_training(post_cfg, verbose=False)
    # SNR list collapses to [0.0] for uncor training (check_params parity)
    assert res.params["cn"].shape == (6, 1)
    assert res.params["ucn"] is not None
    # frozen prefix: iterations 0-3 must equal the base's rows
    for t in range(4):
        np.testing.assert_allclose(np.asarray(res.params["cn"])[t],
                                   blocks["cn"][t], rtol=1e-6)
    assert os.path.exists(pre + "_Opt_Weight_End6.txt")


def test_evaluator_stats_only_matches_loss_path():
    """compute_loss=False (stats-only, fused-kernel-capable path) must give
    identical BER/FER counters to the apps-based path."""
    import jax
    import jax.numpy as jnp
    from ldpc_error_floor_tpu.channel import AWGNChannel
    from ldpc_error_floor_tpu.codes import TannerGraph, get_code
    from ldpc_error_floor_tpu.models import (DecoderConfig, NMSDecoder,
                                             WeightSpec, init_weights)
    from ldpc_error_floor_tpu.pipelines.evaluate import Evaluator

    code = get_code("MACKAY_N96_K48")
    graph = TannerGraph(code)
    spec = WeightSpec(sharing=(3, 0, 3), n_iters=4)
    dec = NMSDecoder(code, DecoderConfig(decoding_type=1), spec, graph=graph)
    chan = AWGNChannel(code, decoding_type=1)
    params = init_weights(spec, graph)
    sig = code.snr_sigmas([2.0, 3.0])
    key = jax.random.PRNGKey(11)
    e1 = Evaluator(dec, chan, loss_type=0, batch=64, compute_loss=True)
    e2 = Evaluator(dec, chan, loss_type=0, batch=64, compute_loss=False)
    r1, _ = e1.run(params, sig, 128, 0.0, key=key)
    r2, _ = e2.run(params, sig, 128, 0.0, key=key)
    np.testing.assert_allclose(r1[:3], r2[:3])   # BER/FER rows identical
    assert np.all(r2[3] == 0.0)                  # loss row zeroed


def test_fused_train_runtime_fallback(tmp_path, monkeypatch):
    """A fused-train kernel that fails to compile despite the VMEM model's
    prediction must degrade to the scan backend mid-run (with a warning),
    not kill the training (pipelines/train.py run_epoch_step)."""
    import warnings

    import jax
    import ldpc_error_floor_tpu.pipelines.train as pt
    from ldpc_error_floor_tpu.ops.pallas_train import FusedTrainKernel

    def cfg(tag):
        # batch fills a packed kernel tile: MacKay z=1 packs P=8 batch
        # groups per tile, so auto_tb needs >= tb*8 = 1024 lanes
        return ExperimentConfig(
            code="MACKAY_N96_K48",
            sharing=(3, 0, 3), sampling_type=0, decoding_type=1,
            iters_max=3, fixed_iter=0, fixed_init=0, iter_step=3,
            loss_type=0, opt_metric=1, etha_start=0.0, eval_loss=1,
            learn_rate_start=5e-3, batch_size=2048, training_num=4096,
            epochs=1, valid_flag=1, valid_num=2048, snrs=[2.0], seed=7,
            out_dir=str(tmp_path / tag), input_dir=str(tmp_path / "Inputs"),
            out_prefix=tag)

    res_scan = run_training(cfg("SCAN"), verbose=False)

    # Force the fused-path selection (it requires a TPU backend), then make
    # the kernel fail at its first dispatch -- simulating a compile failure
    # the calibrated VMEM model did not predict.
    monkeypatch.setattr(pt.jax, "default_backend", lambda: "tpu")

    def boom(self, *a, **k):
        raise RuntimeError("forced fused-train compile failure (test)")

    monkeypatch.setattr(FusedTrainKernel, "apps", boom)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        res_fb = run_training(cfg("FB"), verbose=False)
    assert any("falling back to the scan backend" in str(w.message)
               for w in rec), [str(w.message) for w in rec]

    # identical RNG stream + identical scan gradients => identical results
    for kind in ("cn", "vn"):
        np.testing.assert_array_equal(np.asarray(res_scan.params[kind]),
                                      np.asarray(res_fb.params[kind]))
    assert res_scan.best_metric == res_fb.best_metric
