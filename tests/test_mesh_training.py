"""Mesh-aware training: a data-parallel training run over the 8-virtual-device
CPU mesh must match the single-device run step-for-step (params replicated,
batch lanes sharded, gradients all-reduced by GSPMD).

The reference has no distributed story at all (single GPU pin,
`main_Base.py:14-15`); this is the TPU-native scaling path (SURVEY.md §5.8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_error_floor_tpu.channel import AWGNChannel, mix_sigma_lanes
from ldpc_error_floor_tpu.codes import TannerGraph, get_code
from ldpc_error_floor_tpu.models import (DecoderConfig, NMSDecoder, WeightSpec,
                                         init_weights)
from ldpc_error_floor_tpu.parallel import data_mesh
from ldpc_error_floor_tpu.pipelines import ExperimentConfig, run_training
from ldpc_error_floor_tpu.training.train import (make_epoch_step,
                                                 make_optimizer)


def _setup(n_iters=3):
    code = get_code("MACKAY_N96_K48")
    graph = TannerGraph(code)
    spec = WeightSpec(sharing=(3, 0, 3), n_iters=n_iters)
    dec = NMSDecoder(code, DecoderConfig(decoding_type=1), spec, graph=graph)
    ch = AWGNChannel(code, decoding_type=1)
    return code, graph, spec, dec, ch


def test_epoch_step_mesh_matches_single_device():
    assert jax.device_count() == 8
    code, graph, spec, dec, ch = _setup()
    batch = 64
    sigmas = jnp.asarray(mix_sigma_lanes(code.snr_sigmas([2.0, 3.0]), batch))
    labels = jnp.zeros((code.n_full, batch), jnp.float32)
    key = jax.random.PRNGKey(3)

    outs = {}
    for name, mesh in (("single", None), ("mesh", data_mesh(8))):
        params = init_weights(spec, graph)
        opt = make_optimizer(1e-2)
        opt_state = opt.init(params)
        step = make_epoch_step(dec, spec, loss_type=0, train_start=0,
                               train_end=spec.n_iters, fixed_init=0,
                               optimizer=opt, n_steps=5, labels=labels,
                               channel=ch, sigmas=sigmas, mesh=mesh)
        p, _, loss = step(params, opt_state, key, jnp.float32(0.0))
        outs[name] = (jax.device_get(p), float(loss))

    np.testing.assert_allclose(outs["single"][1], outs["mesh"][1],
                               rtol=1e-5)
    for k in outs["single"][0]:
        a, b = outs["single"][0][k], outs["mesh"][0][k]
        if a is None:
            assert b is None
            continue
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_run_training_mesh_losses_match(tmp_path):
    """Same config, same seed: the pipeline's per-epoch losses and metrics
    must agree between one device and the full 8-device mesh."""
    hists = {}
    for name, mesh in (("single", None), ("mesh", data_mesh(8))):
        cfg = ExperimentConfig(
            code="MACKAY_N96_K48", sharing=(3, 0, 3), decoding_type=1,
            iters_max=2, fixed_iter=0, iter_step=2,
            sampling_type=0, loss_type=0, opt_metric=2,
            etha_start=0.0, learn_rate_start=1e-2,
            batch_size=64, training_num=192, epochs=2,
            valid_flag=1, valid_num=128, snrs=[2.0, 3.0], seed=5,
            out_dir=str(tmp_path / name))
        res = run_training(cfg, verbose=False, mesh=mesh)
        hists[name] = np.asarray([(h["train_loss"], h["metric"])
                                  for h in res.history])
    np.testing.assert_allclose(hists["mesh"], hists["single"],
                               rtol=1e-4, atol=1e-6)
