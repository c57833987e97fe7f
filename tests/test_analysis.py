"""Failure analysis: (a, b) trapping-set classification of harvested words
must match a hand computation on the decoder's final decisions."""

import jax.numpy as jnp
import numpy as np

from ldpc_error_floor_tpu.channel import AWGNChannel
from ldpc_error_floor_tpu.codes import TannerGraph, get_code
from ldpc_error_floor_tpu.models import (DecoderConfig, NMSDecoder, WeightSpec,
                                         init_weights)
from ldpc_error_floor_tpu.sim import UncorHarvester, classify_failures


def test_classify_failures_matches_hand_computation():
    import jax
    code = get_code("MACKAY_N96_K48")
    graph = TannerGraph(code)
    spec = WeightSpec(sharing=(3, 0, 3), n_iters=3)
    dec = NMSDecoder(code, DecoderConfig(decoding_type=1), spec, graph=graph)
    ch = AWGNChannel(code, decoding_type=1)
    params = init_weights(spec, graph)

    # harvest some real failures at low SNR
    h = UncorHarvester(dec, ch, batch=128, cap=128)
    rows = h.collect(params, 2.0, jax.random.PRNGKey(0),
                     target_words=10 ** 9, max_frames=512)
    assert rows.shape[0] > 4

    rep = classify_failures(dec, params, rows, batch=64)
    n = (rows.shape[0] // 64) * 64 or rows.shape[0]
    assert rep.total_words == n
    assert rep.still_failing + rep.rescued == n
    # harvested words decode to failure again by construction (same
    # decoder, deterministic) — modulo the batch-truncation remainder
    assert rep.still_failing == n

    # hand-check one batch's (a, b) classes
    H = graph.H.astype(np.int8)
    res = dec.decode(params, jnp.asarray(rows[:64].T, jnp.float32),
                     collect="stats")
    bits = np.asarray(res.app_last >= 0, np.int8)
    hand = {}
    for col in np.nonzero(np.asarray(res.uncor_mask))[0]:
        e = bits[:, col]
        key = (int(e.sum()), int(((H @ e) % 2).sum()))
        hand[key] = hand.get(key, 0) + 1
    for k, v in hand.items():
        assert rep.classes.get(k, 0) >= v

    # every failure has a nonzero error pattern; summary renders
    assert all(a > 0 for (a, _b) in rep.classes)
    assert "top (a=wrong bits" in rep.summary()
