"""Parity vs golden traces captured by EXECUTING the reference TF graph.

tools/capture_reference_trace.py runs the reference's own
`build_neural_network` (/root/reference/Main_Functions.py:157-385) on pinned
inputs/weights and records per-iteration APPs, the loss, and the gradients
w.r.t. the reference's var_list.  These tests assert both our backends
reproduce those numbers — an anchor fully independent of SURVEY.md and of
our NumPy oracle (VERDICT round-1, "What's weak" #1).
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_error_floor_tpu.codes import TannerGraph, get_code
from ldpc_error_floor_tpu.models import DecoderConfig, NMSDecoder, WeightSpec
from ldpc_error_floor_tpu.models.weights import stack_weights
from ldpc_error_floor_tpu.ops.pallas_decoder import FusedNMSKernel
from ldpc_error_floor_tpu.training.losses import multi_iteration_loss

TRACE_DIR = os.path.join(os.path.dirname(__file__), "data", "ref_traces")
TRACES = sorted(glob.glob(os.path.join(TRACE_DIR, "*.npz")))

KIND_IDX = {"cn": 0, "ucn": 1, "vn": 2}


def _load(path):
    d = dict(np.load(path))
    meta = {
        "code": d["code"].tobytes().decode(),
        "sharing": tuple(int(v) for v in d["sharing"]),
        "decoding_type": int(d["decoding_type"]),
        "q_bit": int(d["q_bit"]),
        "T": int(d["T"]),
        "loss_type": int(d["loss_type"]),
        "etha": float(d["etha"]),
        "fixed_iter": int(d["fixed_iter"]),
        "fixed_init": int(d["fixed_init"]),
        "target_node": int(d["target_node"]),
        "z": int(d["z"]),
    }
    return d, meta


def _setup(d, meta):
    code = get_code(meta["code"])
    graph = TannerGraph(code)
    spec = WeightSpec(sharing=meta["sharing"], n_iters=meta["T"],
                      fixed_iter=meta["fixed_iter"])
    target = meta["target_node"] if meta["target_node"] != code.N else 0
    cfg = DecoderConfig(decoding_type=meta["decoding_type"],
                        q_bit=meta["q_bit"], target_node=target)
    params = {}
    for kind, i in KIND_IDX.items():
        if meta["sharing"][i] == 0:
            params[kind] = None
            continue
        rows = [d[f"w_var_{i}_{t}"] for t in range(spec.n_rows(kind))]
        params[kind] = jnp.asarray(np.stack(rows), jnp.float32)
    xa = d["xa"]  # [B, N, z]
    llr = jnp.asarray(xa.transpose(1, 2, 0).reshape(-1, xa.shape[0]))
    return code, graph, spec, cfg, params, llr


@pytest.mark.parametrize("path", TRACES, ids=[os.path.basename(p)[:-4]
                                              for p in TRACES])
def test_scan_backend_matches_reference_apps(path):
    d, meta = _load(path)
    code, graph, spec, cfg, params, llr = _setup(d, meta)
    dec = NMSDecoder(code, cfg, spec, graph=graph)
    res = dec.decode(params, llr, collect="apps")
    ours = np.asarray(res.apps).transpose(0, 2, 1)       # [T, B, target*z]
    # SP needs a looser atol: float32 tanh/atanh differ in the last ulps
    # between TF and XLA and the error compounds over iterations
    atol = 2e-3 if meta["decoding_type"] == 0 else 2e-4
    np.testing.assert_allclose(ours, d["apps"], rtol=1e-5, atol=atol)


@pytest.mark.parametrize("path", TRACES, ids=[os.path.basename(p)[:-4]
                                              for p in TRACES])
def test_pallas_backend_matches_reference_apps(path):
    d, meta = _load(path)
    code, graph, spec, cfg, params, llr = _setup(d, meta)
    kern = FusedNMSKernel(graph, cfg, spec, tb=4, interpret=True)
    # the golden traces carry batch 4; packed kernels (z=1: P=8 codewords
    # per lane) need tb*P columns — tile the batch and compare the
    # original columns (lanes are independent)
    B = llr.shape[-1]
    reps = max(1, (kern.tb * kern.P) // B)
    llr_t = jnp.tile(llr, (1, reps)) if reps > 1 else llr
    app, _, _ = kern.decode_stats(stack_weights(spec, params), llr_t)
    app = app[:, :B]
    # the kernel emits only the final-iteration APP, over all N nodes;
    # the trace records the systematic target slice
    tz = d["apps"].shape[-1]
    atol = 2e-3 if meta["decoding_type"] == 0 else 2e-4
    np.testing.assert_allclose(np.asarray(app)[:tz].T, d["apps"][-1],
                               rtol=1e-5, atol=atol)


@pytest.mark.parametrize("path", TRACES, ids=[os.path.basename(p)[:-4]
                                              for p in TRACES])
def test_loss_and_gradients_match_reference(path):
    d, meta = _load(path)
    code, graph, spec, cfg, params, llr = _setup(d, meta)
    dec = NMSDecoder(code, cfg, spec, graph=graph)
    t_lo = max(meta["fixed_iter"] - meta["fixed_init"], meta["fixed_iter"])
    labels = jnp.zeros((dec.target * code.z, llr.shape[-1]), jnp.float32)

    def loss_fn(p):
        res = dec.apply(p, llr, labels=labels, collect="apps")
        return multi_iteration_loss(res.apps, labels, meta["loss_type"],
                                    meta["etha"], t_start=t_lo)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss), float(d["loss"]),
                               rtol=1e-4, atol=1e-6)

    checked = 0
    for kind, i in KIND_IDX.items():
        share = meta["sharing"][i]
        if share == 0:
            continue
        g_ours = np.asarray(grads[kind])
        if share in (4, 5):
            ref = d.get(f"g_var_{i}_{meta['fixed_iter']}")
            assert ref is not None
            np.testing.assert_allclose(g_ours[meta["fixed_iter"]], ref,
                                       rtol=2e-3, atol=1e-6,
                                       err_msg=f"{kind} pivot row")
            checked += 1
        else:
            for t in range(t_lo, meta["T"]):
                ref = d.get(f"g_var_{i}_{t}")
                assert ref is not None
                np.testing.assert_allclose(g_ours[t], ref, rtol=2e-3,
                                           atol=1e-6,
                                           err_msg=f"{kind} row {t}")
                checked += 1
    assert checked > 0


def test_traces_exist():
    assert len(TRACES) >= 6, TRACES
