"""Weight store + file-format tests, including golden round-trips against the
shipped reference artifacts (when /root/reference is mounted)."""

import os

import numpy as np
import pytest

import conftest
from ldpc_error_floor_tpu.codes import TannerGraph, get_code
from ldpc_error_floor_tpu.io.weight_files import (available_weight_sets,
                                                  read_weight_file,
                                                  read_weight_json,
                                                  write_weight_file)
from ldpc_error_floor_tpu.models import (WeightSpec, init_weights, load_params,
                                         params_from_blocks, params_to_blocks,
                                         trainable_mask)

REF_WEIGHT = os.path.join(conftest.REFERENCE_PATH,
                          "Weights/C0_wman_N0576_R34_z24_Opt_Weight_End20.txt")


def test_spec_validation():
    with pytest.raises(ValueError):
        WeightSpec(sharing=(3, 0, 1), n_iters=5)  # per-edge VN forbidden
    with pytest.raises(ValueError):
        WeightSpec(sharing=(3, 2, 3), n_iters=5)  # UCN must match CN
    WeightSpec(sharing=(2, 2, 2), n_iters=5)


def test_rows_and_temporal_map():
    spec = WeightSpec(sharing=(4, 0, 5), n_iters=10, fixed_iter=3)
    assert spec.n_rows("cn") == 4
    np.testing.assert_array_equal(spec.iter_to_row("cn"),
                                  [0, 1, 2, 3, 3, 3, 3, 3, 3, 3])
    spec2 = WeightSpec(sharing=(3, 0, 3), n_iters=4)
    np.testing.assert_array_equal(spec2.iter_to_row("vn"), [0, 1, 2, 3])


def test_trainable_mask_blocks():
    spec = WeightSpec(sharing=(3, 0, 3), n_iters=40, fixed_iter=0)
    m = trainable_mask(spec, train_start=20, train_end=40, fixed_init=5)
    rows = m["cn"]
    assert rows[:15].sum() == 0 and rows[15:40].all()
    spec_t = WeightSpec(sharing=(4, 0, 0), n_iters=40, fixed_iter=10)
    m = trainable_mask(spec_t, 10, 40)
    assert m["cn"].sum() == 1 and m["cn"][10]


def test_text_roundtrip(tmp_path):
    code = get_code("MACKAY_N96_K48")
    graph = TannerGraph(code)
    spec = WeightSpec(sharing=(2, 2, 2), n_iters=6)
    rng = np.random.default_rng(7)
    params = {k: (None if v is None
                  else np.asarray(rng.uniform(0, 2, v.shape), np.float32))
              for k, v in init_weights(spec, graph).items()}
    blocks = params_to_blocks(spec, params)
    p = tmp_path / "w.txt"
    write_weight_file(str(p), spec.sharing, blocks)
    sharing2, blocks2 = read_weight_file(str(p))
    assert sharing2 == spec.sharing
    params2 = params_from_blocks(spec, blocks2, graph)
    for k in params:
        if params[k] is None:
            assert params2[k] is None
        else:
            np.testing.assert_array_equal(params[k], np.asarray(params2[k]))


@pytest.mark.skipif(not conftest.has_reference(), reason="reference not mounted")
def test_reference_weight_file_bytes_roundtrip(tmp_path):
    """Reading the shipped WiMAX 20-iter artifact and re-writing it must
    reproduce the file byte-for-byte (format interop)."""
    sharing, blocks = read_weight_file(REF_WEIGHT)
    assert sharing == (3, 3, 3)
    assert all(len(blocks[k]) == 20 for k in ("cn", "ucn", "vn"))
    p = tmp_path / "rt.txt"
    write_weight_file(str(p), sharing, blocks)
    with open(REF_WEIGHT, "rb") as f:
        want = f.read()
    with open(p, "rb") as f:
        got = f.read()
    assert got == want


def test_bundled_weight_sets_load():
    code = get_code("wman_N0576_R34_z24")
    graph = TannerGraph(code)
    sets = available_weight_sets()
    assert "wman_N0576_R34_z24_base20" in sets
    spec = WeightSpec(sharing=(3, 3, 3), n_iters=20)
    params = load_params(spec, graph, "wman_N0576_R34_z24_base20")
    assert params["cn"].shape == (20, 1)
    # trained weights live inside the reference's [0, 2] clip range
    for k in ("cn", "ucn", "vn"):
        arr = np.asarray(params[k])
        assert arr.min() >= 0.0 and arr.max() <= 2.0


@pytest.mark.skipif(not conftest.has_reference(), reason="reference not mounted")
def test_bundled_json_matches_reference_text():
    sharing_t, blocks_t = read_weight_file(REF_WEIGHT)
    sharing_j, blocks_j = read_weight_json("wman_N0576_R34_z24_base20")
    assert sharing_t == sharing_j
    for k in ("cn", "ucn", "vn"):
        for a, b in zip(blocks_t[k], blocks_j[k]):
            np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_bundled_framework_trained_sets_load():
    """Round-3 additions: weight sets TRAINED BY THIS FRAMEWORK are bundled
    alongside the converted reference artifacts (provenance in each JSON's
    'source' field; runs under benchmarks/runs/)."""
    sets = available_weight_sets()
    cases = [
        ("wman_N0576_R34_z24_boosted30", "wman_N0576_R34_z24",
         (3, 3, 3), 30),
        ("5G_LDPC_R0.50_n_dec640_n512_k256_z32_s257_320_base20",
         "5G_LDPC_R0.50_n_dec640_n512_k256_z32_s257_320", (2, 2, 2), 20),
        ("5G_LDPC_R0.50_n_dec640_n512_k256_z32_s257_320_boosted30",
         "5G_LDPC_R0.50_n_dec640_n512_k256_z32_s257_320", (2, 2, 2), 30),
    ]
    for name, code_name, sharing, n_iters in cases:
        assert name in sets
        code = get_code(code_name)
        graph = TannerGraph(code)
        spec = WeightSpec(sharing=sharing, n_iters=n_iters)
        params = load_params(spec, graph, name)
        for k in ("cn", "ucn", "vn"):
            arr = np.asarray(params[k])
            assert arr.shape[0] == n_iters
            assert arr.min() >= 0.0 and arr.max() <= 2.0
