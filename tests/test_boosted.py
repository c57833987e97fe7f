"""Boosted two-stage composition (base prefix + post decoder as one deep
decode, reference `weight_init` frozen-prefix load,
`Main_Functions.py:390-391,419-422`)."""

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_error_floor_tpu.channel import AWGNChannel
from ldpc_error_floor_tpu.codes import TannerGraph, get_code
from ldpc_error_floor_tpu.models import (DecoderConfig, NMSDecoder, WeightSpec,
                                         init_weights)
from ldpc_error_floor_tpu.models.boosted import (BoostedDecoder,
                                                 compose_boosted_params)


def test_compose_overwrites_prefix_rows():
    code = get_code("MACKAY_N96_K48")
    graph = TannerGraph(code)
    base_spec = WeightSpec(sharing=(3, 0, 3), n_iters=4)
    post_spec = WeightSpec(sharing=(3, 3, 3), n_iters=6, fixed_iter=4)
    base = init_weights(base_spec, graph, init_cn=0.5, init_vn=0.25)
    post = init_weights(post_spec, graph, init_cn=1.5, init_vn=1.75)
    comp = compose_boosted_params(graph, base_spec, base, post_spec, post)
    cn = np.asarray(comp["cn"])
    np.testing.assert_allclose(cn[:4], 0.5)
    np.testing.assert_allclose(cn[4:], 1.5)
    vn = np.asarray(comp["vn"])
    np.testing.assert_allclose(vn[:4], 0.25)
    np.testing.assert_allclose(vn[4:], 1.75)
    # UCN rows: base has none -> post rows kept everywhere
    np.testing.assert_allclose(np.asarray(comp["ucn"]), 1.5)


def test_boosted_prefix_matches_standalone_base():
    """The first `boundary` iterations of the composed decoder must produce
    exactly the standalone base decoder's per-iteration stats."""
    code = get_code("MACKAY_N96_K48")
    graph = TannerGraph(code)
    cfg = DecoderConfig(decoding_type=1)
    base_spec = WeightSpec(sharing=(3, 0, 3), n_iters=3)
    post_spec = WeightSpec(sharing=(3, 0, 3), n_iters=5, fixed_iter=3)
    key = jax.random.PRNGKey(0)
    base = {k: (None if v is None else v * 0.9)
            for k, v in init_weights(base_spec, graph).items()}
    post = init_weights(post_spec, graph, init_cn=1.2, init_vn=1.1)
    comp = compose_boosted_params(graph, base_spec, base, post_spec, post)

    chan = AWGNChannel(code, decoding_type=1)
    llr = chan.sample(key, jnp.full((32,), float(code.snr_sigmas([2.0])[0])))

    boosted = BoostedDecoder(code, cfg, post_spec, comp, boundary=3,
                             graph=graph)
    res_b = boosted.decode(llr, collect="stats")
    dec_base = NMSDecoder(code, cfg, base_spec, graph=graph)
    res_s = dec_base.decode(base, llr, collect="stats")

    np.testing.assert_array_equal(np.asarray(res_b.err_flags[:3]),
                                  np.asarray(res_s.err_flags))
    np.testing.assert_array_equal(np.asarray(res_b.bit_errors[:3]),
                                  np.asarray(res_s.bit_errors))
    np.testing.assert_array_equal(
        np.asarray(boosted.base_failure_mask(res_b)),
        np.asarray(res_s.uncor_mask))


def test_cli_simulate_boosted_composition(tmp_path, capsys):
    """`simulate --base-weights ... --boundary ...` composes and runs."""
    import json

    from ldpc_error_floor_tpu.cli import main
    from ldpc_error_floor_tpu.io.weight_files import write_weight_file
    from ldpc_error_floor_tpu.models import params_to_blocks

    code = get_code("MACKAY_N96_K48")
    graph = TannerGraph(code)
    base_spec = WeightSpec(sharing=(3, 0, 3), n_iters=3)
    base = init_weights(base_spec, graph, init_cn=0.9)
    base_file = str(tmp_path / "base.txt")
    write_weight_file(base_file, (3, 0, 3), params_to_blocks(base_spec, base))

    rc = main(["simulate", "--code", "MACKAY_N96_K48",
               "--sharing", "3", "0", "3", "--iters", "5",
               "--base-weights", base_file, "--boundary", "3",
               "--decoding-type", "1", "--snrs", "2.0",
               "--batch", "64", "--max-frames", "128",
               "--target-errors", "1000000", "--backend", "xla"])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    pt = json.loads(line)
    assert pt["frames"] == 128 and 0.0 <= pt["fer_genie"] <= 1.0
