"""Capture golden numeric traces by EXECUTING the reference implementation.

VERDICT.md round-1 flagged that all parity evidence was self-referential
(the NumPy oracle was written from the same SURVEY.md spec as the decoder).
This tool closes that hole: it imports the reference's actual TF1 graph
builder from /root/reference (read-only), builds the decoder graph for a set
of pinned configurations, runs it on pinned inputs, and records

  * the per-iteration APP outputs (``ya_output_target{t}``),
  * the loss (``lossa``),
  * the gradients of the loss w.r.t. the reference's own var_list,
  * the *actual* variable values read back from the session (so any
    file-format or assignment confusion cannot corrupt the anchor),

into ``tests/data/ref_traces/*.npz``.  tests/test_reference_trace.py then
asserts our scan and Pallas backends reproduce these numbers.

Run on CPU (TF has no TPU here):  python tools/capture_reference_trace.py

Provenance: everything fetched comes from executing
/root/reference/Main_Functions.py (build_neural_network 157-385,
weight_init 387-439, init_parameter 8-38, init_connecting_matrix 46-150)
with the graph-build sequence of /root/reference/main_Base.py:117-140.
"""

from __future__ import annotations

import os
import sys
import tempfile
import zlib

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
OUT_DIR = os.path.join(REPO, "tests", "data", "ref_traces")

sys.path.insert(0, REFERENCE)

import tensorflow.compat.v1 as tf  # noqa: E402

import Main_Functions as MF  # noqa: E402  (the reference module; read-only)

# (name, code file, z, sharing, decoding_type, q_bit, T, loss_type, etha,
#  fixed_iter, fixed_init, systematic, punct (start, end), short (start, end))
CASES = [
    # the flagship post-decoder shape: QMS + UCN weights, soft-FER loss
    ("wman_qms_ucn", "wman_N0576_R34_z24", 24, (3, 3, 3), 2, 5, 5, 2, 0.5,
     0, 0, 0, (0, 0), (0, 0)),
    # per-check-node weights + UCN, min-sum, BCE loss, eta=1
    ("wman_ms_pernode", "wman_N0576_R34_z24", 24, (2, 2, 2), 1, 5, 4, 0, 1.0,
     0, 0, 0, (0, 0), (0, 0)),
    # z=1 code, sum-product, soft-BER loss, eta=0 (0^0=1: last-iter only)
    ("mackay_sp", "MACKAY_N96_K48", 1, (3, 0, 3), 0, 5, 4, 1, 0.0,
     0, 0, 0, (0, 0), (0, 0)),
    # per-edge CN weights + per-node VN weights, QMS
    ("wman_qms_peredge", "wman_N0576_R34_z24", 24, (1, 0, 2), 2, 5, 4, 0, 0.8,
     0, 0, 0, (0, 0), (0, 0)),
    # temporal (dynamic) CN sharing past fixed_iter=2, frozen-prefix load
    ("wman_temporal", "wman_N0576_R34_z24", 24, (4, 0, 3), 2, 5, 6, 2, 0.5,
     2, 0, 0, (0, 0), (0, 0)),
    # 5G punctured/shortened code, systematic target restriction
    ("5g_punct_sys", "5G_LDPC_R0.50_n_dec640_n512_k256_z32_s257_320", 32,
     (2, 2, 2), 2, 5, 3, 0, 1.0, 0, 0, 1, (513, 640), (257, 320)),
]

B = 4
CLIP_LLR = 20.0
# per-case noise levels chosen so the pinned batch has MIXED decode outcomes
# (some frames correct, some not) -- saturated losses anchor less
SNR_SCALE = {"wman_temporal": 0.52, "mackay_sp": 0.75,
             "wman_qms_ucn": 0.55}
MIN_W, MAX_W = 0.0, 2.0


def var_dim(i: int, share: int, M: int, N: int, E: int) -> int:
    if share in (1, 4):
        return E
    if share in (2, 5):
        return M if i in (0, 1) else N
    return 1


def pinned_weights(rng, sharing, T, fixed_iter, M, N, E):
    """Values for every var the reference will create, keyed 'var_{i}_{t}'."""
    vals = {}
    for i, share in enumerate(sharing):
        if share == 0:
            continue
        end = (fixed_iter + 1) if share in (4, 5) else T
        d = var_dim(i, share, M, N, E)
        for t in range(end):
            center = 1.0 if i != 2 else 1.0
            vals[f"var_{i}_{t}"] = np.round(
                center + 0.3 * (rng.rand(d).astype(np.float32) - 0.5), 4)
    return vals


def write_frozen_file(path, sharing, start, fixed_iter, vals):
    """Reproduce print_weight's format (Print_Functions.py:74-96) for the
    frozen-prefix file `*_Opt_Weight_End{start}.txt` weight_init reads."""
    with open(path, "w") as f:
        print("{0} {1} {2}\n".format(*sharing), file=f)
        for i, share in enumerate(sharing):
            if share == 0:
                continue
            for t in range(start):
                tt = min(t, fixed_iter) if share in (4, 5) else t
                row = np.atleast_1d(vals[f"var_{i}_{tt}"])
                print("\t".join(str(v) for v in row), file=f)
            print("", file=f)


def pinned_llr(rng, N, z, punct, short, snr_scale=0.62):
    """All-zero-codeword-style LLRs (p1/p0: negative = bit 0) with noise;
    punctured columns -> 0, shortened -> -clip (Print_Functions.py:53-60)."""
    sigma = snr_scale
    y = -1.0 + sigma * rng.randn(B, N, z).astype(np.float32)
    llr = 2.0 * y / (sigma * sigma)
    flat = llr.reshape(B, N * z)
    if punct != (0, 0):
        flat[:, punct[0] - 1:punct[1]] = 0.0
    if short != (0, 0):
        flat[:, short[0] - 1:short[1]] = -CLIP_LLR
    return flat.reshape(B, N, z).astype(np.float32)


def capture(case):
    (name, fname, z, sharing, dec_type, q_bit, T, loss_type, etha,
     fixed_iter, fixed_init, systematic, punct, short) = case
    rng = np.random.RandomState(zlib.crc32(name.encode()) % (2 ** 31))

    proto = np.loadtxt(os.path.join(REFERENCE, "BaseGraph", fname + ".txt"),
                       int, delimiter="\t")
    snrs = np.array([2.0])
    (M, N, base, cn_deg, vn_deg, E, rate, _sig) = MF.init_parameter(
        proto, snrs, z, punct[0], punct[1], short[0], short[1])
    (L1, L2, W_o2e, W_skip2e, W_e2o, W_out, W_skip2o,
     W_e2o_self) = MF.init_connecting_matrix(
        proto, base, N, M, E, z, vn_deg, cn_deg, punct[0], punct[1])

    target_node = (N - M) if systematic else N
    start = fixed_iter  # training_iter_start (main_Base.py:109)
    vals = pinned_weights(rng, sharing, T, fixed_iter, M, N, E)

    tmp = tempfile.mkdtemp(prefix="ref_trace_")
    os.makedirs(os.path.join(tmp, "Weights"), exist_ok=True)
    out_filename = f"T_{fname}"
    if start > 0:
        write_frozen_file(
            os.path.join(tmp, "Weights",
                         f"{out_filename}_Opt_Weight_End{start}.txt"),
            sharing, start, fixed_iter, vals)
    cwd = os.getcwd()
    os.chdir(tmp)
    try:
        tf.reset_default_graph()
        net = {}
        net["etha"] = tf.placeholder(tf.float32, name="etha")
        net["learn_rate"] = tf.placeholder(tf.float32, name="learn_rate")
        net["xa"] = tf.placeholder(tf.float32, shape=[B, N, z], name="xa")
        net["ya"] = tf.placeholder(tf.float32, shape=[B, N * z], name="ya")
        net["LLRa0"] = tf.zeros((B, z, E), dtype=tf.float32)
        net["infoM_lastlayera0"] = tf.zeros((B, z, E), dtype=tf.float32)
        net = MF.weight_init(net, 0, out_filename, T, start, sharing,
                             E, M, N, MIN_W, MAX_W, 1.0, 1.0, T, fixed_iter)
        for i in range(T):
            net = MF.build_neural_network(
                net, list(sharing), dec_type, 0, loss_type, target_node, i,
                T, fixed_iter, fixed_init, start, T, N, M, E, z, B,
                L1, L2, W_o2e, W_skip2e, W_e2o, W_out, W_skip2o,
                W_e2o_self, q_bit, CLIP_LLR)

        # reference var_list reconstruction (Main_Functions.py:360-378)
        var_list, var_names = [], []
        for i, share in enumerate(sharing):
            if share == 0:
                continue
            if share in (1, 2, 3):
                lo, hi = max(start - fixed_init, fixed_iter), T
            else:
                lo, hi = fixed_iter, fixed_iter + 1
            for t in range(lo, hi):
                var_list.append(net[f"var_{i}_{t}"])
                var_names.append(f"var_{i}_{t}")
        grads_t = tf.gradients(net["lossa"], var_list)

        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            # pin the trainable-range variables (frozen prefix came from the
            # file); read EVERY var back as the source of truth
            assigns = [tf.assign(net[k], vals[k]) for k in vals if k in net]
            sess.run(assigns)
            actual_vals = {k: sess.run(net[k]) for k in vals if k in net}

            xa = pinned_llr(rng, N, z, punct, short,
                            snr_scale=SNR_SCALE.get(name, 0.62))
            ya = np.zeros((B, N * z), np.float32)
            feed = {net["xa"]: xa, net["ya"]: ya, net["etha"]: etha}
            fetches = [net[f"ya_output_target{t}"] for t in range(T)]
            outs = sess.run(fetches, feed_dict=feed)
            loss, grads = sess.run([net["lossa"], grads_t], feed_dict=feed)
    finally:
        os.chdir(cwd)

    payload = {
        "xa": xa, "loss": np.float32(loss), "etha": np.float32(etha),
        "sharing": np.array(sharing), "decoding_type": np.int32(dec_type),
        "q_bit": np.int32(q_bit), "T": np.int32(T),
        "loss_type": np.int32(loss_type), "fixed_iter": np.int32(fixed_iter),
        "fixed_init": np.int32(fixed_init), "target_node": np.int32(target_node),
        "z": np.int32(z), "code": np.bytes_(fname.encode()),
        "apps": np.stack(outs),  # [T, B, target*z]
    }
    for k, v in actual_vals.items():
        payload["w_" + k] = np.atleast_1d(np.asarray(v, np.float32))
    for nm, g in zip(var_names, grads):
        payload["g_" + nm] = np.atleast_1d(np.asarray(g, np.float32))
    out_path = os.path.join(OUT_DIR, name + ".npz")
    np.savez_compressed(out_path, **payload)
    print(f"{name}: wrote {out_path} (loss={loss:.6f}, "
          f"{len(actual_vals)} vars, {len(grads)} grads)")


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    for case in CASES:
        capture(case)


if __name__ == "__main__":
    main()
