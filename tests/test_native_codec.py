"""Native C++ uncor codec vs the NumPy fallback: byte-identical files,
identical parses, and correct reference-format semantics (3 metadata
columns, negated storage, '%.1f')."""

import os
import subprocess
import sys

import numpy as np
import pytest

from ldpc_error_floor_tpu import native
from ldpc_error_floor_tpu.io.uncor_files import (append_uncor_file,
                                                 read_uncor_file)


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def _rand_llrs(rows, cols, seed=0):
    rng = np.random.default_rng(seed)
    # one-decimal values (the on-disk precision) incl. negatives and zeros
    return np.round(rng.normal(0.0, 4.0, (rows, cols)) * 10) / 10


def test_native_write_matches_numpy_bytes(tmp_path, lib):
    llrs = _rand_llrs(50, 96).astype(np.float32)
    f_nat = str(tmp_path / "nat.txt")
    f_np = str(tmp_path / "np.txt")
    assert native.write_table(f_nat, llrs, meta_cols=3, scale=-1.0,
                              append=True)
    rows = np.concatenate([np.zeros((50, 3), np.float32), -llrs], axis=1)
    with open(f_np, "a") as f:
        np.savetxt(f, rows, fmt="%.1f", delimiter="\t")
    assert open(f_nat, "rb").read() == open(f_np, "rb").read()


def test_native_parse_matches_numpy(tmp_path, lib):
    llrs = _rand_llrs(40, 64, seed=3).astype(np.float32)
    path = str(tmp_path / "u.txt")
    append_uncor_file(path, llrs)
    append_uncor_file(path, llrs * 0.5)  # append mode

    got = native.parse_table(path, skip_cols=3, scale=-1.0)
    ref = -np.loadtxt(path, dtype=np.float32, delimiter="\t")[:, 3:]
    np.testing.assert_array_equal(got, ref)
    assert got.shape == (80, 64)


def test_uncor_roundtrip_through_public_api(tmp_path):
    llrs = _rand_llrs(20, 48, seed=7).astype(np.float32)
    path = str(tmp_path / "u.txt")
    append_uncor_file(path, llrs)
    back = read_uncor_file(path)
    np.testing.assert_allclose(back, llrs, atol=1e-6)
    with pytest.raises(ValueError):
        read_uncor_file(path, max_rows=21)


def test_fallback_matches_native(tmp_path):
    """The public API must behave identically with the codec disabled —
    exercised in a subprocess so the env var takes effect pre-import."""
    llrs = _rand_llrs(10, 32, seed=11).astype(np.float32)
    path = str(tmp_path / "u.txt")
    append_uncor_file(path, llrs)

    code = (
        "import numpy as np\n"
        "from ldpc_error_floor_tpu.io.uncor_files import read_uncor_file,"
        " append_uncor_file\n"
        f"back = read_uncor_file({path!r})\n"
        "np.save('%s', back)\n" % str(tmp_path / "fb.npy")
    )
    env = dict(os.environ, LDPC_TPU_NO_NATIVE="1",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   timeout=120)
    fb = np.load(str(tmp_path / "fb.npy"))
    np.testing.assert_array_equal(fb, read_uncor_file(path))


def test_native_parse_rejects_ragged(tmp_path, lib):
    path = str(tmp_path / "bad.txt")
    with open(path, "w") as f:
        f.write("0.0\t0.0\t0.0\t1.0\t2.0\n")
        f.write("0.0\t0.0\t0.0\t1.0\n")  # short row
    assert native.parse_table(path, skip_cols=3, scale=-1.0) is None
