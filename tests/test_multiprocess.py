"""Two-process `jax.distributed` execution — the real multi-host path.

Round 2 left `initialize_distributed` (parallel/mesh.py:19) and the
per-host harvest files (sim/harvest.py) wired but never executed with >1
process.  This test spawns two actual processes (4 virtual CPU devices
each, 8 global), runs a psum'd Monte-Carlo step, a sharded training step,
and a harvest, and asserts the pooled results equal a single-process
8-device run on the same seeds.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run(nproc: int, outdir: str, timeout: float = 600.0):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")}
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(nproc), str(i), str(port), outdir],
        env=env, cwd=ROOT, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for i in range(nproc)]
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"
    return outs


def _read_rows(path: str):
    with open(path) as f:
        return sorted(line.strip() for line in f if line.strip())


@pytest.fixture(scope="module")
def mp_out(tmp_path_factory):
    """Single-process 8-device reference, shared by every process layout."""
    out = str(tmp_path_factory.mktemp("mp"))
    _run(1, out)
    return out


def test_two_process_matches_single(mp_out):
    out = mp_out
    _run(2, out)

    with open(os.path.join(out, "res_1_0.json")) as f:
        ref = json.load(f)
    res = []
    for pid in range(2):
        with open(os.path.join(out, f"res_2_{pid}.json")) as f:
            res.append(json.load(f))

    # both processes observed the same replicated results
    assert res[0]["frames"] == res[1]["frames"]
    assert res[0]["genie_errors"] == res[1]["genie_errors"]

    # Monte-Carlo counters: exact equality with the single-process run
    for k in ("frames", "bit_errors", "frame_errors", "genie_errors"):
        assert res[0][k] == ref[k], (k, res[0][k], ref[k])
    assert ref["genie_errors"] > 0  # the point actually exercised errors

    # training: loss and updated weights match (f32 all-reduce order may
    # differ between 1- and 2-process collectives)
    assert np.isclose(res[0]["loss"], ref["loss"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res[0]["cn_after"]),
                               np.asarray(ref["cn_after"]),
                               rtol=1e-5, atol=1e-7)

    # deploy-mode (syndrome early termination) counters: exact equality
    # across process layouts
    for k in ("d_frames", "d_frame_errors", "d_undetected", "d_iters_sum"):
        assert res[0][k] == res[1][k] == ref[k], (k, res[0][k], ref[k])
    assert ref["d_frame_errors"] > 0

    # mid-run kill + resume of a sharded run_point: the checkpointed run
    # (killed at 128 frames, resumed to 256) must pool to the counters of
    # the uninterrupted 256-frame run, in BOTH process layouts, and both
    # must match the single-process reference
    for k in ("frames", "bit_errors", "frame_errors", "genie_errors"):
        assert ref[f"r_{k}"] == ref[f"u_{k}"], (k, ref)
        assert res[0][f"r_{k}"] == res[0][f"u_{k}"], (k, res[0])
        assert res[0][f"u_{k}"] == ref[f"u_{k}"], (k, res[0], ref)
        assert res[1][f"r_{k}"] == res[0][f"r_{k}"]
    assert ref["u_genie_errors"] > 0

    # harvest: pooled per-host .part files hold exactly the single-process
    # rows (as a multiset — drain order differs across hosts)
    single = _read_rows(os.path.join(out, "uncor_1.txt"))
    part0 = _read_rows(os.path.join(out, "uncor_2.txt.part0"))
    part1 = _read_rows(os.path.join(out, "uncor_2.txt.part1"))
    assert len(single) > 0
    assert len(part0) > 0 and len(part1) > 0  # both hosts found words
    assert sorted(part0 + part1) == single


def test_four_process_matches_single(mp_out):
    """4 processes x 2 devices each — the v5p-16-shaped scale-out rehearsal
    (BASELINE.json north star): pooled Monte-Carlo / deploy counters and the
    all-reduced training step must equal the 1-process 8-device run."""
    out = mp_out
    _run(4, out)

    with open(os.path.join(out, "res_1_0.json")) as f:
        ref = json.load(f)
    res = []
    for pid in range(4):
        with open(os.path.join(out, f"res_4_{pid}.json")) as f:
            res.append(json.load(f))

    # every process observed the same replicated pooled results
    for k in ("frames", "bit_errors", "frame_errors", "genie_errors",
              "d_frames", "d_frame_errors", "d_undetected", "d_iters_sum"):
        vals = {r[k] for r in res}
        assert vals == {ref[k]}, (k, vals, ref[k])
    assert ref["genie_errors"] > 0 and ref["d_frame_errors"] > 0

    # training: loss and updated weights match the single-process run
    assert np.isclose(res[0]["loss"], ref["loss"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(res[0]["cn_after"]),
                               np.asarray(ref["cn_after"]),
                               rtol=1e-5, atol=1e-7)

    # kill/resume parity holds in the 4-process layout too
    for k in ("frames", "bit_errors", "frame_errors", "genie_errors"):
        assert res[0][f"r_{k}"] == res[0][f"u_{k}"] == ref[f"u_{k}"], k

    # harvest: the 4 per-host .part files pool to the single-process rows
    single = _read_rows(os.path.join(out, "uncor_1.txt"))
    parts = []
    for pid in range(4):
        parts += _read_rows(os.path.join(out, f"uncor_4.txt.part{pid}"))
    assert len(single) > 0
    assert sorted(parts) == single
