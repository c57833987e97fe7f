"""Fused differentiable Pallas training path vs the scan backend.

The scan backend's gradients are themselves verified against
*executed-reference* TF gradients (tests/test_reference_trace.py), so
scan-vs-fused agreement here transitively anchors the kernel to the
reference (`Main_Functions.py:337-378`).  Runs in Pallas interpret mode on
the CPU test platform (ops/pallas_train.py auto-interprets off-TPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_error_floor_tpu.channel import AWGNChannel
from ldpc_error_floor_tpu.codes import TannerGraph, get_code
from ldpc_error_floor_tpu.models import (DecoderConfig, NMSDecoder,
                                         WeightSpec, init_weights)
from ldpc_error_floor_tpu.training.losses import multi_iteration_loss

CASES = [
    # (code, sharing, decoding_type, q_bit, T, loss_type, etha, neural_mode,
    #  systematic, fixed_iter)
    ("wman_N0576_R34_z24", (3, 0, 3), 2, 5, 3, 2, 0.5, "scale", 0, 0),
    ("wman_N0576_R34_z24", (3, 3, 3), 2, 5, 3, 2, 0.0, "scale", 0, 0),
    ("wman_N0576_R34_z24", (5, 0, 5), 2, 5, 4, 1, 0.8, "scale", 0, 0),
    ("wman_N0576_R34_z24", (1, 1, 0), 2, 5, 2, 0, 1.0, "scale", 0, 0),
    ("wman_N0576_R34_z24", (2, 2, 2), 1, 5, 3, 2, 0.5, "scale", 0, 0),
    ("wman_N0576_R34_z24", (3, 0, 3), 2, 5, 3, 2, 0.5, "offset", 0, 0),
    ("5G_LDPC_R0.50_n_dec640_n512_k256_z32_s257_320",
     (2, 2, 2), 2, 5, 3, 2, 0.5, "scale", 1, 0),
    ("MACKAY_N96_K48", (3, 0, 3), 3, 5, 3, 2, 0.5, "scale", 0, 0),
    # z=1 sublane-packed train pair (P=8): UCN + per-edge weights, the
    # BCH/Polar campaign regime
    ("MACKAY_N96_K48", (1, 1, 0), 2, 5, 2, 0, 1.0, "scale", 0, 0),
    # SP (tanh/atanh) training — fused since round 5 (decoding_type 0,
    # reference Main_Functions.py:238-245); plain and UCN-blended
    ("wman_N0576_R34_z24", (3, 0, 3), 0, 5, 3, 2, 0.5, "scale", 0, 0),
    ("wman_N0576_R34_z24", (2, 2, 2), 0, 5, 3, 1, 0.8, "scale", 0, 0),
]


def _setup(code_name, sharing, dt, q, T, neural_mode, systematic,
           fixed_iter, batch=0):
    code = get_code(code_name)
    graph = TannerGraph(code)
    spec = WeightSpec(sharing=sharing, n_iters=T, fixed_iter=fixed_iter)
    key = jax.random.PRNGKey(7)
    params = init_weights(spec, graph, -1.0, -1.0, key=key)
    ch = AWGNChannel(code, decoding_type=dt, q_bit=q)
    sigma = jnp.float32(code.snr_sigmas([2.5])[0])
    if not batch:
        zp = -(-code.z // 8) * 8
        batch = 2 * 8 * max(1, zp // code.z)  # 2 tiles of tb=8, packed
    llr = ch.sample(jax.random.PRNGKey(3),
                    jnp.full((batch,), sigma, jnp.float32))
    target = (code.N - code.M) if systematic else 0
    labels_dim = (target or code.N) * code.z
    labels = jnp.zeros((labels_dim, batch), jnp.float32)
    kw = dict(decoding_type=dt, q_bit=q, neural_mode=neural_mode,
              target_node=target)
    dec_x = NMSDecoder(code, DecoderConfig(**kw), spec, graph=graph)
    dec_p = NMSDecoder(code, DecoderConfig(**kw, backend="pallas",
                                           pallas_tb=8), spec, graph=graph)
    return params, llr, labels, dec_x, dec_p


@pytest.mark.parametrize(
    "code_name,sharing,dt,q,T,loss_type,etha,neural_mode,systematic,fi",
    CASES)
def test_fused_train_matches_scan(code_name, sharing, dt, q, T, loss_type,
                                  etha, neural_mode, systematic, fi):
    params, llr, labels, dec_x, dec_p = _setup(
        code_name, sharing, dt, q, T, neural_mode, systematic, fi)

    # forward: per-iteration APP stacks agree (bit-exact under QMS — the
    # grid re-snaps every iteration; plain MS accumulates f32 sum-order
    # noise of a few ULP per iteration, same as the stats kernel; SP's
    # atanh near saturation amplifies product-order ULPs further — same
    # 1e-4 band as the decode-kernel SP parity case)
    ax = dec_x.apply(params, llr, collect="apps").apps
    ap = dec_p.apply(params, llr, collect="apps").apps
    atol = 0.0 if dt == 2 else (1e-4 if dt == 0 else 1e-5)
    np.testing.assert_allclose(np.asarray(ax), np.asarray(ap),
                               rtol=0, atol=atol)

    def make_loss(dec):
        def f(p):
            res = dec.apply(p, llr, labels=labels, collect="apps")
            return multi_iteration_loss(res.apps, labels, loss_type, etha,
                                        t_start=0)
        return f

    lx, gx = jax.value_and_grad(make_loss(dec_x))(params)
    lp, gp = jax.value_and_grad(make_loss(dec_p))(params)
    assert np.allclose(float(lx), float(lp), rtol=1e-6)
    for kind in ("cn", "ucn", "vn"):
        if gx[kind] is None:
            assert gp[kind] is None
            continue
        scale = max(float(jnp.max(jnp.abs(gx[kind]))), 1e-8)
        np.testing.assert_allclose(
            np.asarray(gp[kind]), np.asarray(gx[kind]),
            rtol=5e-5, atol=5e-6 * scale,
            err_msg=f"{kind} gradient mismatch (scale {scale:.3e})")
        # gradients must be nonzero for the fused path to train anything
        assert float(jnp.max(jnp.abs(gp[kind]))) > 0.0


def test_fused_train_in_train_step():
    """The fused path drops into make_train_step and takes identical Adam
    steps to the scan backend."""
    from ldpc_error_floor_tpu.training.train import (make_optimizer,
                                                     make_train_step)
    params, llr, labels, dec_x, dec_p = _setup(
        "wman_N0576_R34_z24", (3, 0, 3), 2, 5, 3, "scale", 0, 0)
    opt = make_optimizer(1e-2)
    outs = {}
    for name, dec in (("xla", dec_x), ("pallas", dec_p)):
        p, st = params, opt.init(params)
        step = make_train_step(dec, dec.spec, loss_type=2, train_start=0,
                               train_end=3, optimizer=opt, donate=False)
        for _ in range(2):
            (p, st), loss = step(p, st, llr, labels, jnp.float32(0.5))
        outs[name] = (p, float(loss))
    assert np.isclose(outs["xla"][1], outs["pallas"][1], rtol=1e-5)
    for kind in ("cn", "vn"):
        np.testing.assert_allclose(np.asarray(outs["pallas"][0][kind]),
                                   np.asarray(outs["xla"][0][kind]),
                                   rtol=1e-5, atol=1e-7)


def test_app_emission_window_matches_full_stack():
    """pallas_app_t0 = T-1 (the static eta=0 training config): the emitted
    stack must equal the tail of the full stack, and last-iteration-loss
    gradients must be bit-identical to the full-stack kernel's."""
    from dataclasses import replace as dc_replace
    from ldpc_error_floor_tpu.models import DecoderConfig, NMSDecoder

    params, llr, labels, dec_x, dec_p = _setup(
        "wman_N0576_R34_z24", (3, 0, 3), 2, 5, 3, "scale", 0, 0)
    cfg_w = dc_replace(dec_p.cfg, pallas_app_t0=2)
    dec_w = NMSDecoder(dec_p.code, cfg_w, dec_p.spec, graph=dec_p.graph)

    full = dec_p.apply(params, llr, collect="apps").apps
    win = dec_w.apply(params, llr, collect="apps").apps
    assert win.shape[0] == 1
    np.testing.assert_array_equal(np.asarray(win[0]), np.asarray(full[2]))

    def loss_full(p):
        res = dec_p.apply(p, llr, labels=labels, collect="apps")
        return multi_iteration_loss(res.apps, labels, 2, 0.0, t_start=0)

    def loss_win(p):
        res = dec_w.apply(p, llr, labels=labels, collect="apps")
        return multi_iteration_loss(res.apps, labels, 2, 0.0, t_start=0)

    lf, gf = jax.value_and_grad(loss_full)(params)
    lw, gw = jax.value_and_grad(loss_win)(params)
    assert float(lf) == float(lw)
    for kind in ("cn", "vn"):
        np.testing.assert_array_equal(np.asarray(gf[kind]),
                                      np.asarray(gw[kind]))
