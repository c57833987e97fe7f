"""Golden-file interop tests against the upstream repo's shipped artifacts.

These run only when the read-only reference snapshot is mounted at
/root/reference; they prove the text-format readers/writers and the bundled
JSON conversions are faithful to the published data (SURVEY.md section 4:
"weight-file round-trip vs the shipped files (golden files!)")."""

import os

import numpy as np
import pytest

from conftest import REFERENCE_PATH, has_reference
from ldpc_error_floor_tpu.codes import get_code
from ldpc_error_floor_tpu.codes.protograph import load_proto_matrix
from ldpc_error_floor_tpu.io.weight_files import (KINDS, read_weight_file,
                                                  read_weight_json,
                                                  write_weight_file)

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference snapshot not mounted")

GOLDEN_WEIGHTS = [
    ("Weights/C0_wman_N0576_R34_z24_Opt_Weight_End20.txt",
     "wman_N0576_R34_z24_base20", (3, 3, 3), 20),
    ("Results/WiMAX/Weights_Iter50.txt", "wman_N0576_R34_z24_iter50",
     (3, 3, 3), 50),
    ("Results/WIFI/Weights_Iter50.txt", "802_11n_N648_R56_z27_iter50",
     (3, 3, 3), 50),
    ("Results/5G/5G_LDPC_R0.50_n_dec640_n512_k256_z32_s257_320_Weight_End50.txt",
     "5G_LDPC_R0.50_n_dec640_n512_k256_z32_s257_320_iter50", (2, 2, 2), 50),
]


@pytest.mark.parametrize("rel,bundled,sharing,n_iters", GOLDEN_WEIGHTS)
def test_bundled_weights_match_reference_text(rel, bundled, sharing, n_iters):
    sharing_t, blocks_t = read_weight_file(os.path.join(REFERENCE_PATH, rel))
    sharing_j, blocks_j = read_weight_json(bundled)
    assert sharing_t == sharing == sharing_j
    for kind in KINDS:
        if blocks_t[kind] is None:
            assert blocks_j[kind] is None
            continue
        assert len(blocks_t[kind]) == n_iters == len(blocks_j[kind])
        for rt, rj in zip(blocks_t[kind], blocks_j[kind]):
            np.testing.assert_array_equal(np.asarray(rt), np.asarray(rj))


@pytest.mark.parametrize("rel,bundled,sharing,n_iters", GOLDEN_WEIGHTS[:2])
def test_text_writer_roundtrip_on_goldens(rel, bundled, sharing, n_iters,
                                          tmp_path):
    src = os.path.join(REFERENCE_PATH, rel)
    sharing_1, blocks_1 = read_weight_file(src)
    out = str(tmp_path / "w.txt")
    write_weight_file(out, sharing_1, blocks_1)
    sharing_2, blocks_2 = read_weight_file(out)
    assert sharing_1 == sharing_2
    for kind in KINDS:
        if blocks_1[kind] is None:
            continue
        for r1, r2 in zip(blocks_1[kind], blocks_2[kind]):
            np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


GOLDEN_CODES = [
    ("BaseGraph/wman_N0576_R34_z24.txt", "wman_N0576_R34_z24"),
    ("BaseGraph/802_11n_N648_R56_z27.txt", "802_11n_N648_R56_z27"),
    ("BaseGraph/5G_LDPC_R0.50_n_dec640_n512_k256_z32_s257_320.txt",
     "5G_LDPC_R0.50_n_dec640_n512_k256_z32_s257_320"),
    ("BaseGraph/MACKAY_N96_K48.txt", "MACKAY_N96_K48"),
    ("BaseGraph/BCH_63_51.txt", "BCH_63_51"),
    ("BaseGraph/Polar_64_48.txt", "Polar_64_48"),
]


@pytest.mark.parametrize("rel,bundled", GOLDEN_CODES)
def test_bundled_protos_match_reference_text(rel, bundled):
    proto_t = load_proto_matrix(os.path.join(REFERENCE_PATH, rel))
    code = get_code(bundled)
    np.testing.assert_array_equal(proto_t, code.proto)
