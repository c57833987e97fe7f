"""Training-step tests: loss decreases, block masks freeze rows, constraints
hold."""

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_error_floor_tpu.channel import AWGNChannel, mix_sigma_lanes
from ldpc_error_floor_tpu.codes import TannerGraph, get_code
from ldpc_error_floor_tpu.models import (DecoderConfig, NMSDecoder, WeightSpec,
                                         init_weights)
from ldpc_error_floor_tpu.training.train import (make_optimizer,
                                                 make_train_step)


def _setup(n_iters=4, sharing=(3, 0, 3), fixed_iter=0, code="MACKAY_N96_K48"):
    c = get_code(code)
    graph = TannerGraph(c)
    spec = WeightSpec(sharing=sharing, n_iters=n_iters, fixed_iter=fixed_iter)
    dec = NMSDecoder(c, DecoderConfig(decoding_type=1, remat=True), spec,
                     graph=graph)
    ch = AWGNChannel(c, decoding_type=1)
    return c, graph, spec, dec, ch


def test_loss_decreases_on_mackay():
    code, graph, spec, dec, ch = _setup()
    params = init_weights(spec, graph)
    opt = make_optimizer(5e-3)
    opt_state = opt.init(params)
    step = make_train_step(dec, spec, loss_type=0, train_start=0, train_end=4,
                           optimizer=opt, donate=False)
    sig = jnp.asarray(mix_sigma_lanes(code.snr_sigmas([2.0, 3.0]), 64))
    labels = jnp.zeros((code.n_full, 64), jnp.float32)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        llr = ch.sample(sub, sig)
        (params, opt_state), loss = step(params, opt_state, llr, labels,
                                         jnp.float32(0.0))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses
    # weights moved but respect the [0, 2] box constraint
    for k in ("cn", "vn"):
        arr = np.asarray(params[k])
        assert not np.allclose(arr, 1.0)
        assert arr.min() >= 0.0 and arr.max() <= 2.0


def test_block_mask_freezes_prefix_rows():
    code, graph, spec, dec, ch = _setup(n_iters=6)
    params = init_weights(spec, graph)
    opt = make_optimizer(1e-2)
    opt_state = opt.init(params)
    # train only block [4, 6) — rows 0..3 must not move
    step = make_train_step(dec, spec, loss_type=1, train_start=4, train_end=6,
                           optimizer=opt, donate=False)
    sig = jnp.asarray(mix_sigma_lanes(code.snr_sigmas([2.0]), 32))
    labels = jnp.zeros((code.n_full, 32), jnp.float32)
    key = jax.random.PRNGKey(1)
    before = {k: np.asarray(v) for k, v in params.items() if v is not None}
    for _ in range(5):
        key, sub = jax.random.split(key)
        (params, opt_state), _ = step(params, opt_state, ch.sample(sub, sig),
                                      labels, jnp.float32(0.0))
    for k in ("cn", "vn"):
        after = np.asarray(params[k])
        np.testing.assert_array_equal(after[:4], before[k][:4])
        assert not np.allclose(after[4:6], before[k][4:6])


def test_fixed_init_retrains_overlap():
    """Delta2: training block [4, 6) with fixed_init=2 also updates rows 2-3."""
    code, graph, spec, dec, ch = _setup(n_iters=6)
    params = init_weights(spec, graph)
    opt = make_optimizer(1e-2)
    opt_state = opt.init(params)
    step = make_train_step(dec, spec, loss_type=1, train_start=4, train_end=6,
                           fixed_init=2, optimizer=opt, donate=False)
    sig = jnp.asarray(mix_sigma_lanes(code.snr_sigmas([2.0]), 32))
    labels = jnp.zeros((code.n_full, 32), jnp.float32)
    key = jax.random.PRNGKey(2)
    before = np.asarray(params["cn"])
    for _ in range(5):
        key, sub = jax.random.split(key)
        (params, opt_state), _ = step(params, opt_state, ch.sample(sub, sig),
                                      labels, jnp.float32(0.0))
    after = np.asarray(params["cn"])
    np.testing.assert_array_equal(after[:2], before[:2])
    assert not np.allclose(after[2:6], before[2:6])


def test_temporal_sharing_trains_single_row():
    code, graph, spec, dec, ch = _setup(n_iters=4, sharing=(4, 0, 0),
                                        fixed_iter=1)
    params = init_weights(spec, graph)
    assert params["cn"].shape == (2, graph.E)
    opt = make_optimizer(1e-2)
    opt_state = opt.init(params)
    step = make_train_step(dec, spec, loss_type=1, train_start=1, train_end=4,
                           optimizer=opt, donate=False)
    sig = jnp.asarray(mix_sigma_lanes(code.snr_sigmas([2.0]), 32))
    labels = jnp.zeros((code.n_full, 32), jnp.float32)
    key = jax.random.PRNGKey(3)
    before = np.asarray(params["cn"])
    for _ in range(3):
        key, sub = jax.random.split(key)
        (params, opt_state), _ = step(params, opt_state, ch.sample(sub, sig),
                                      labels, jnp.float32(0.0))
    after = np.asarray(params["cn"])
    np.testing.assert_array_equal(after[0], before[0])  # below pivot: frozen
    assert not np.allclose(after[1], before[1])         # shared row trains


def test_epoch_runner_matches_sequential_steps():
    """The on-device epoch scan must reproduce make_train_step exactly
    (same key schedule: jax.random.split(key, n_steps))."""
    from ldpc_error_floor_tpu.training.train import make_epoch_step

    code, graph, spec, dec, ch = _setup(n_iters=3)
    params = init_weights(spec, graph)
    opt = make_optimizer(1e-2)
    opt_state = opt.init(params)
    B, n_steps = 32, 4
    sigmas = jnp.asarray(mix_sigma_lanes(code.snr_sigmas([2.0, 3.0]), B))
    labels = jnp.zeros((code.n_full, B), jnp.float32)
    key = jax.random.PRNGKey(13)
    etha = jnp.float32(0.5)

    # sequential reference (no donation so inputs stay alive)
    step = make_train_step(dec, spec, loss_type=0, train_start=0, train_end=3,
                           optimizer=opt, donate=False)
    p_ref, o_ref = params, opt_state
    losses = []
    for sub in jax.random.split(key, n_steps):
        llr = ch.sample(sub, sigmas)
        (p_ref, o_ref), loss = step(p_ref, o_ref, llr, labels, etha)
        losses.append(float(loss))

    runner = make_epoch_step(dec, spec, loss_type=0, train_start=0,
                             train_end=3, fixed_init=0, optimizer=opt,
                             n_steps=n_steps, labels=labels, channel=ch,
                             sigmas=sigmas)
    p_run, o_run, mean_loss = runner(params, opt_state, key, etha)
    for k in params:
        if params[k] is not None:
            np.testing.assert_allclose(np.asarray(p_run[k]),
                                       np.asarray(p_ref[k]), rtol=2e-6)
    np.testing.assert_allclose(float(mean_loss), np.mean(losses), rtol=2e-6)


def test_epoch_runner_data_mode_slices_in_order():
    from ldpc_error_floor_tpu.training.train import make_epoch_step

    code, graph, spec, dec, ch = _setup(n_iters=3)
    params = init_weights(spec, graph)
    opt = make_optimizer(1e-2)
    opt_state = opt.init(params)
    B, n_steps = 16, 3
    labels = jnp.zeros((code.n_full, B), jnp.float32)
    sigmas = jnp.full((B,), float(code.snr_sigmas([2.0])[0]), jnp.float32)
    rows = np.asarray(jax.vmap(lambda k: ch.sample(k, sigmas).T)(
        jax.random.split(jax.random.PRNGKey(3), n_steps))).reshape(
            n_steps * B, code.n_full)

    step = make_train_step(dec, spec, loss_type=0, train_start=0, train_end=3,
                           optimizer=opt, donate=False)
    p_ref, o_ref = params, opt_state
    for i in range(n_steps):
        llr = jnp.asarray(rows[i * B:(i + 1) * B].T)
        (p_ref, o_ref), _ = step(p_ref, o_ref, llr, labels, jnp.float32(0.0))

    runner = make_epoch_step(dec, spec, loss_type=0, train_start=0,
                             train_end=3, fixed_init=0, optimizer=opt,
                             n_steps=n_steps, labels=labels, data_mode=True)
    p_run, _, _ = runner(params, opt_state, jnp.asarray(rows),
                         jnp.float32(0.0))
    for k in params:
        if params[k] is not None:
            np.testing.assert_allclose(np.asarray(p_run[k]),
                                       np.asarray(p_ref[k]), rtol=2e-6)


def test_offset_min_sum_trains():
    """OMS offsets are trainable through the same block machinery."""
    code, graph, spec, _, ch = _setup(n_iters=4, sharing=(2, 0, 2))
    spec = WeightSpec(sharing=(2, 0, 2), n_iters=4, min_w=0.0, max_w=1.0)
    dec = NMSDecoder(code, DecoderConfig(decoding_type=1,
                                         neural_mode="offset", remat=True),
                     spec, graph=graph)
    params = init_weights(spec, graph, init_cn=0.0, init_vn=1.0)
    opt = make_optimizer(5e-2)
    opt_state = opt.init(params)
    step = make_train_step(dec, spec, loss_type=0, train_start=0, train_end=4,
                           optimizer=opt, donate=False)
    B = 128
    sigmas = jnp.asarray(mix_sigma_lanes(code.snr_sigmas([2.0]), B))
    labels = jnp.zeros((code.n_full, B), jnp.float32)
    losses = []
    for sub in jax.random.split(jax.random.PRNGKey(2), 20):
        llr = ch.sample(sub, sigmas)
        (params, opt_state), loss = step(params, opt_state, llr, labels,
                                         jnp.float32(0.0))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    cn = np.asarray(params["cn"])
    assert cn.min() >= 0.0 and cn.max() <= 1.0 and cn.max() > 0.0


def test_frozen_rows_outside_box_survive_clip():
    """Frozen-prefix rows whose file values lie outside [min_w, max_w] must
    pass through training untouched — the reference's box constraint attaches
    only to the trainable variables it creates (Main_Functions.py:434)."""
    code, graph, spec, dec, ch = _setup(n_iters=6)
    params = init_weights(spec, graph)
    # frozen rows 0..3 hold out-of-box values (box is [0, 2])
    params["cn"] = params["cn"].at[:4].set(2.5)
    params["vn"] = params["vn"].at[:4].set(-0.5)
    opt = make_optimizer(1e-2)
    opt_state = opt.init(params)
    step = make_train_step(dec, spec, loss_type=1, train_start=4, train_end=6,
                           optimizer=opt, donate=False)
    sig = jnp.asarray(mix_sigma_lanes(code.snr_sigmas([2.0]), 32))
    labels = jnp.zeros((code.n_full, 32), jnp.float32)
    key = jax.random.PRNGKey(7)
    for _ in range(3):
        key, sub = jax.random.split(key)
        (params, opt_state), _ = step(params, opt_state, ch.sample(sub, sig),
                                      labels, jnp.float32(0.0))
    np.testing.assert_array_equal(np.asarray(params["cn"])[:4], 2.5)
    np.testing.assert_array_equal(np.asarray(params["vn"])[:4], -0.5)
    # trainable rows still respect the box
    assert np.asarray(params["cn"])[4:].max() <= 2.0
    assert np.asarray(params["vn"])[4:].min() >= 0.0


def test_set_learning_rate_changes_applied_update():
    """Epoch-wise lr decay (main_Base.py:194-195): mutating the injected
    hyperparam must change the update magnitude of the already-jitted step."""
    from ldpc_error_floor_tpu.training.train import set_learning_rate

    code, graph, spec, dec, ch = _setup(n_iters=3)
    params = init_weights(spec, graph)
    opt = make_optimizer(1e-2)
    opt_state = opt.init(params)
    step = make_train_step(dec, spec, loss_type=0, train_start=0, train_end=3,
                           optimizer=opt, donate=False)
    sig = jnp.asarray(mix_sigma_lanes(code.snr_sigmas([2.0]), 32))
    labels = jnp.zeros((code.n_full, 32), jnp.float32)
    llr = ch.sample(jax.random.PRNGKey(9), sig)

    (p1, o1), _ = step(params, opt_state, llr, labels, jnp.float32(0.0))
    d_full = np.abs(np.asarray(p1["cn"]) - np.asarray(params["cn"])).max()

    o_small = set_learning_rate(opt_state, 1e-6)
    (p2, _), _ = step(params, o_small, llr, labels, jnp.float32(0.0))
    d_small = np.abs(np.asarray(p2["cn"]) - np.asarray(params["cn"])).max()

    assert d_full > 0.0
    assert d_small < d_full * 1e-2, (d_full, d_small)
