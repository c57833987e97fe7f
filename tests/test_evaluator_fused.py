"""The fused on-device evaluator (one `lax.scan` dispatch over all
(batch, SNR) pairs) must produce counters identical to the per-batch host
loop — same key-split order, same data slicing — in both fresh-noise and
uncor-dataset modes, with and without the loss path, and under a mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_error_floor_tpu.channel import AWGNChannel
from ldpc_error_floor_tpu.codes import TannerGraph, get_code
from ldpc_error_floor_tpu.models import (DecoderConfig, NMSDecoder, WeightSpec,
                                         init_weights)
from ldpc_error_floor_tpu.parallel import data_mesh
from ldpc_error_floor_tpu.pipelines.evaluate import Evaluator


@pytest.fixture(scope="module")
def setup():
    code = get_code("MACKAY_N96_K48")
    graph = TannerGraph(code)
    spec = WeightSpec(sharing=(3, 0, 3), n_iters=3)
    dec = NMSDecoder(code, DecoderConfig(decoding_type=1), spec, graph=graph)
    ch = AWGNChannel(code, decoding_type=1)
    params = init_weights(spec, graph)
    return code, dec, ch, params


@pytest.mark.parametrize("compute_loss", [True, False])
def test_fused_noise_mode_matches_loop(setup, compute_loss):
    code, dec, ch, params = setup
    sigmas = code.snr_sigmas([2.0, 3.0, 4.0])
    key = jax.random.PRNGKey(9)
    kw = dict(loss_type=0, t_lo=0, batch=32, compute_loss=compute_loss)
    fused, _ = Evaluator(dec, ch, fused=True, **kw).run(
        params, sigmas, 128, 0.5, key=key)
    loop, _ = Evaluator(dec, ch, fused=False, **kw).run(
        params, sigmas, 128, 0.5, key=key)
    # underlying counters are integer-identical; the normalized rows differ
    # only in float summation order (per-batch incremental vs sum-then-divide)
    np.testing.assert_allclose(fused, loop, rtol=1e-5, atol=1e-7)
    assert fused[2].sum() > 0, "SNR 2 should produce some failures"


def test_fused_data_mode_matches_loop(setup):
    code, dec, ch, params = setup
    rng = np.random.default_rng(0)
    data = rng.normal(-2.0, 2.5, size=(96, code.n_full)).astype(np.float32)
    kw = dict(loss_type=2, t_lo=0, batch=24, compute_loss=True)
    fused, _ = Evaluator(dec, ch, fused=True, **kw).run(
        params, [0.0], 96, 0.0, data=data)
    loop, _ = Evaluator(dec, ch, fused=False, **kw).run(
        params, [0.0], 96, 0.0, data=data)
    np.testing.assert_allclose(fused, loop, rtol=1e-5, atol=1e-7)


def test_fused_under_mesh_matches_single(setup):
    code, dec, ch, params = setup
    sigmas = code.snr_sigmas([2.0])
    key = jax.random.PRNGKey(4)
    kw = dict(loss_type=0, t_lo=0, batch=64, compute_loss=False)
    single, _ = Evaluator(dec, ch, fused=True, **kw).run(
        params, sigmas, 128, 0.0, key=key)
    meshed, _ = Evaluator(dec, ch, fused=True, mesh=data_mesh(8), **kw).run(
        params, sigmas, 128, 0.0, key=key)
    np.testing.assert_allclose(single[:3], meshed[:3], rtol=1e-6)


def test_fused_compile_failure_falls_back_to_per_batch(setup, monkeypatch):
    """A remote-compiler crash on the fused sweep must degrade to the
    per-batch path (same counters), not kill the run (round-3 environment:
    tpu_compile_helper SIGSEGVs on some codes' sweep programs)."""
    code, dec, ch, params = setup
    sigmas = code.snr_sigmas([2.0, 3.0])
    key = jax.random.PRNGKey(3)
    kw = dict(loss_type=0, t_lo=0, batch=32, compute_loss=True)
    want, _ = Evaluator(dec, ch, fused=False, **kw).run(
        params, sigmas, 64, 0.0, key=key)

    ev2 = Evaluator(dec, ch, fused=True, **kw)

    def boom(*a, **k):
        raise jax.errors.JaxRuntimeError(
            "INTERNAL: remote_compile: HTTP 500: tpu_compile_helper "
            "subprocess exit signal SIGSEGV (11)")

    monkeypatch.setattr(ev2, "_get_fused", boom)
    with pytest.warns(UserWarning, match="falling back"):
        got, _ = ev2.run(params, sigmas, 64, 0.0, key=key)
    assert not ev2.fused
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
