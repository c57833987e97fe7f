"""The fused-kernel VMEM model (ops/pallas_decoder.kernel_vmem_bytes) must
reproduce the measured v5e compile outcomes that used to be a hand-tuned
``E*zp <= 3000`` constant in three call sites (round-3 VERDICT item #2).

Measurement source: benchmarks/vmem_calibrate.py run on the v5e chip
(round 4, in-place kernels).  Rows marked conservative=True are allowed to
predict "doesn't fit" for a config that actually compiled (auto_tb then
falls back to the next tile size, which also compiled) — but a config that
FAILED to compile must never be predicted to fit.
"""

import pytest

from ldpc_error_floor_tpu.codes import TannerGraph, get_code
from ldpc_error_floor_tpu.ops.pallas_decoder import (SCOPED_VMEM_BYTES,
                                                     auto_tb,
                                                     kernel_vmem_bytes)

Z64 = "5G_LDPC_R0.50_n_dec1280_n1024_k512_z64_s513_640"
Z72 = "5G_LDPC_R0.73_n_dec2304_n2112_k1536_z72_s1537_1584"
WMAN = "wman_N0576_R34_z24"

# (code, mode, ucn, tb, compiled_on_v5e, conservative_ok)
MEASURED = [
    (WMAN, "stats", False, 256, True, False),
    (WMAN, "stats", True, 256, True, False),
    (WMAN, "deploy", False, 256, True, False),
    (WMAN, "train", False, 256, True, False),
    (WMAN, "train", False, 128, True, False),
    (Z64, "stats", False, 256, True, False),
    (Z64, "stats", True, 256, True, True),   # model conservative here
    (Z64, "stats", True, 128, True, False),
    (Z64, "deploy", False, 256, True, False),
    (Z64, "train", False, 256, False, False),  # measured compile failure
    (Z64, "train", False, 128, True, False),
    (Z72, "stats", False, 256, False, False),  # measured compile failure
    (Z72, "stats", False, 128, True, False),
    (Z72, "stats", True, 128, True, False),
    (Z72, "deploy", False, 128, True, False),
    (Z72, "train", False, 128, False, False),  # measured compile failure
]


@pytest.mark.parametrize("code_name,mode,ucn,tb,compiled,conservative",
                         MEASURED)
def test_model_matches_measured_compiles(code_name, mode, ucn, tb, compiled,
                                         conservative):
    g = TannerGraph(get_code(code_name))
    pred = kernel_vmem_bytes(g, tb, n_iters=20, mode=mode, ucn=ucn)
    fits = pred <= SCOPED_VMEM_BYTES
    if not compiled:
        assert not fits, (f"{code_name}/{mode}/tb{tb} failed to compile on "
                          f"v5e but the model predicts it fits "
                          f"({pred / 2**20:.1f} MiB)")
    elif not conservative:
        assert fits, (f"{code_name}/{mode}/tb{tb} compiled on v5e but the "
                      f"model predicts {pred / 2**20:.1f} MiB > limit")


def test_auto_tb_selections():
    """The tile choices the pipelines actually make."""
    wman = TannerGraph(get_code(WMAN))
    z64 = TannerGraph(get_code(Z64))
    z72 = TannerGraph(get_code(Z72))
    assert auto_tb(wman, 4096, mode="stats") == 256
    # train prefers the tile whose DMA-overlap (double-buffered) variant
    # fits over a larger single-buffer tile: measured round 4, tb128 with
    # full overlap trains at 858k cw/s vs 653k for tb256 without the
    # backward overlap (wman tb256 bwd_db measured OOM at 18.87M scoped)
    assert auto_tb(wman, 2048, mode="train") == 128
    assert kernel_vmem_bytes(wman, 256, mode="train_bwd",
                             overlap=True) > SCOPED_VMEM_BYTES
    assert kernel_vmem_bytes(wman, 128, mode="train_bwd",
                             overlap=True) <= SCOPED_VMEM_BYTES
    # z64 5G: stats at 256, the train pair drops to 128 (BASELINE config #4
    # now rides the fused paths — round-3 VERDICT item #1)
    assert auto_tb(z64, 4096, mode="stats") == 256
    assert auto_tb(z64, 2048, mode="train") == 128
    # z72: every forward mode fits at 128; the differentiable pair does not
    # fit 16 MiB in f32 — auto_tb reports None and training stays on scan
    assert auto_tb(z72, 4096, mode="stats") == 128
    assert auto_tb(z72, 4096, mode="deploy") == 128
    assert auto_tb(z72, 2048, mode="train") is None
    # batches that don't fill a tile never get a kernel
    assert auto_tb(wman, 100, mode="stats") is None


def test_every_bundled_code_has_a_stats_tile():
    """Round-3 gap closed: no bundled code is excluded from the fused
    decode path any more."""
    from ldpc_error_floor_tpu.codes.library import available_codes
    for name in available_codes():
        g = TannerGraph(get_code(name))
        assert auto_tb(g, 4096, mode="stats", ucn=True) is not None, name
