"""Full-state checkpoint/resume: an interrupted training run restored from a
snapshot must continue exactly where it left off (params, Adam moments, RNG)."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from ldpc_error_floor_tpu.pipelines import ExperimentConfig, run_training
from ldpc_error_floor_tpu.training.checkpoint import (block_ckpt_dir,
                                                      restore_train_state,
                                                      save_train_state)


def _tiny_cfg(out_dir, **kw):
    return ExperimentConfig(
        code="MACKAY_N96_K48", sharing=(3, 0, 3), decoding_type=1,
        iters_max=2, iter_step=2, loss_type=0, batch_size=16,
        training_num=32, epochs=2, valid_flag=1, valid_num=16,
        snrs=[2.0], out_dir=out_dir, seed=5, **kw)


def test_save_restore_roundtrip(tmp_path):
    import jax.numpy as jnp
    import optax
    params = {"cn": jnp.ones((2, 1)), "ucn": None, "vn": jnp.full((2, 1), 0.5)}
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(9)
    d = str(tmp_path / "ck")
    save_train_state(d, 3, params, opt_state, key,
                     extra={"etha": 0.5, "lr": 1e-4, "opt_valid": 2.0})
    out = restore_train_state(d, params, opt_state)
    assert out is not None
    step, p2, o2, k2, extra = out
    assert step == 3
    np.testing.assert_array_equal(np.asarray(p2["cn"]), np.asarray(params["cn"]))
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(key))
    assert extra["etha"] == 0.5 and extra["lr"] == 1e-4


def test_restore_empty_dir_returns_none(tmp_path):
    assert restore_train_state(str(tmp_path / "nope"), {}, {}) is None


def test_training_resume_continues(tmp_path):
    out1 = str(tmp_path / "full")
    out2 = str(tmp_path / "resumed")

    # uninterrupted 2-epoch run
    res_full = run_training(_tiny_cfg(out1), verbose=False)

    # run 1 epoch with checkpointing, then resume for the rest
    cfg2 = _tiny_cfg(out2, checkpoint_every=1)
    cfg2a = dataclasses.replace(cfg2, epochs=1)
    run_training(cfg2a, verbose=False)
    ckd = block_ckpt_dir(out2, cfg2.out_prefix, 0, 2)
    assert os.path.isdir(ckd)
    res_resumed = run_training(dataclasses.replace(cfg2, resume=1),
                               verbose=False)

    for k in ("cn", "vn"):
        np.testing.assert_allclose(np.asarray(res_resumed.params[k]),
                                   np.asarray(res_full.params[k]),
                                   rtol=1e-6, atol=1e-7)
