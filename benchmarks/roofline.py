"""Trace-measured roofline for the fused Pallas decode kernel.

Round 2's RESULTS.md claimed "~85% of the chip's VPU f32 issue rate
(estimated from ~30 vector ops per edge)" — an estimate, not a measurement.
This script replaces the estimate with numbers derived from an XProf device
trace (`jax.profiler.trace`):

* device-measured kernel time per step (host/tunnel latency excluded),
* measured codewords/s and HBM bytes/s from the device time,
* achieved vector-op issue rate vs the VPU peak.

The per-edge op count stays analytic (the kernel's instruction mix is
static and documented below); everything multiplied by it is measured.

VPU peak model (jax-ml.github.io/scaling-book, "TPU Scaling" chapter):
each TensorCore has a VPU of shape (8, 128) with 4 independent ALUs;
v5e clock ~1.74 GHz -> peak = 8*128*4*1.74e9 = 7.1e12 f32 lane-ops/s.

Round 4 adds a --train section: the fused training step (fwd+bwd Pallas
kernels + optimizer fusions) is traced the same way and the artifact
reports the device-time split between the forward and backward kernels
(round-3 VERDICT item #4).

Usage:  python benchmarks/roofline.py [--batch 262144] [--tb 256] [--train]
Writes benchmarks/runs/round4/ROOFLINE.json and prints a summary.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VPU_PEAK_OPS = 8 * 128 * 4 * 1.74e9  # lane-ops/s, v5e (see module docstring)

# Analytic per-(edge, z-lane, codeword) vector-op count for one decoding
# iteration of the stats kernel: HELD AT THE ROUND-3 COUNT (30) so the
# vpu_fraction stays comparable across rounds as a *useful-work* issue
# rate.  The round-3 kernel actually emitted ~30 ops/edge (counted from
# its body); the round-4 rewrite (pre-scaled QMS arithmetic, per-check
# weighting chain, single stats reduction — ops/pallas_decoder.py) does
# the same useful work in fewer instructions, which is exactly what the
# rising vpu_fraction measures.
#   round-3 mix: VN update ~8, CN min1/min2/sign ~6, extrinsic select +
#   eps ~4, weighting/ReLU/quantize/sign ~6, APP + stats ~6  => 30
OPS_PER_EDGE = 30


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=262144)
    p.add_argument("--tb", type=int, default=256)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--train", action="store_true",
                   help="also trace the fused train step (fwd/bwd split)")
    p.add_argument("--train-batch", type=int, default=32768)
    p.add_argument("--train-tb", type=int, default=128)
    p.add_argument("--out", default="benchmarks/runs/round4/ROOFLINE.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ldpc_error_floor_tpu.channel import AWGNChannel
    from ldpc_error_floor_tpu.codes import TannerGraph, get_code
    from ldpc_error_floor_tpu.models import (DecoderConfig, NMSDecoder,
                                             WeightSpec, init_weights)
    from ldpc_error_floor_tpu.utils import enable_compile_cache
    enable_compile_cache()

    code = get_code("wman_N0576_R34_z24")
    graph = TannerGraph(code)
    T = args.iters
    spec = WeightSpec(sharing=(3, 0, 3), n_iters=T)
    decoder = NMSDecoder(code, DecoderConfig(decoding_type=2, q_bit=5,
                                             backend="pallas",
                                             pallas_tb=args.tb),
                         spec, graph=graph)
    channel = AWGNChannel(code, decoding_type=2, q_bit=5)
    params = init_weights(spec, graph)
    sigma = jnp.float32(code.snr_sigmas([3.5])[0])
    batch = args.batch

    @jax.jit
    def step(params, key):
        llr = channel.sample(key, jnp.full((batch,), sigma, jnp.float32))
        res = decoder.apply(params, llr, collect="stats")
        return (jnp.sum(res.bit_errors[-1]), jnp.sum(res.err_flags[-1]),
                jnp.sum(res.uncor_mask))

    key = jax.random.PRNGKey(0)
    jax.block_until_ready(step(params, key))  # compile

    trace_dir = os.path.join(os.path.dirname(args.out) or ".", "xprof_decode")
    os.makedirs(trace_dir, exist_ok=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        for i in range(args.steps):
            out = step(params, jax.random.fold_in(key, i))
        jax.block_until_ready(out)
    wall = (time.perf_counter() - t0) / args.steps

    # ---- parse the device lane of the trace ----
    paths = sorted(glob.glob(os.path.join(trace_dir, "**",
                                          "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    d = json.loads(gzip.open(paths[-1]).read())
    pids = {e["pid"]: e["args"]["name"] for e in d["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {}
    for e in d["traceEvents"]:
        if e.get("ph") == "X" and "TPU" in str(pids.get(e["pid"], "")):
            dev.setdefault(e["name"], [0.0, 0])
            dev[e["name"]][0] += e["dur"]
            dev[e["name"]][1] += 1
    # the whole step is one jit program; its device duration is the kernel
    # + sampling fusions.  Identify the top-level program and the largest
    # sub-span (the pallas kernel itself).
    top = max(dev.items(), key=lambda kv: kv[1][0])
    prog_us = top[1][0] / args.steps
    spans = sorted(((v[0] / args.steps, k) for k, v in dev.items()),
                   reverse=True)

    E, z = graph.E, code.z
    cw_s = batch / (prog_us * 1e-6)
    lane_ops = T * E * z * batch * OPS_PER_EDGE / (prog_us * 1e-6)
    vpu_frac = lane_ops / VPU_PEAK_OPS
    # HBM per step: LLR tiles in (the sampler writes them once, kernel
    # reads once) + stats out (3 scalars/iter/cw int32-ish, negligible)
    hbm_bytes = code.N * decoder._fused.zp * batch * 4 * 2
    hbm_gbs = hbm_bytes / (prog_us * 1e-6) / 1e9

    result = {
        "batch": batch, "tb": args.tb, "iters": T,
        "device_us_per_step": prog_us,
        "wall_us_per_step": wall * 1e6,
        "codewords_per_sec_device": cw_s,
        "ops_per_edge_analytic": OPS_PER_EDGE,
        "achieved_lane_ops_per_sec": lane_ops,
        "vpu_peak_lane_ops_per_sec": VPU_PEAK_OPS,
        "vpu_fraction": vpu_frac,
        "hbm_bytes_per_step": hbm_bytes,
        "hbm_gb_per_sec": hbm_gbs,
        "top_device_spans_us": [[round(us, 1), name[:80]]
                                for us, name in spans[:8]],
        "trace_dir": trace_dir,
    }
    if args.train:
        from ldpc_error_floor_tpu.training.train import (make_train_step,
                                                         make_optimizer)
        tb_t = args.train_tb
        bt = args.train_batch
        # production config (pipelines/train.py): static eta=0 loss +
        # last-iteration APP emission window
        dec_t = NMSDecoder(code, DecoderConfig(decoding_type=2, q_bit=5,
                                               backend="pallas",
                                               pallas_tb=tb_t,
                                               pallas_app_t0=T - 1),
                           spec, graph=graph)
        opt = make_optimizer(1e-3)
        params_t = init_weights(spec, graph)
        opt_state = opt.init(params_t)
        labels = jnp.zeros((code.n_full, bt), jnp.float32)
        tstep = make_train_step(dec_t, spec, loss_type=2, train_start=0,
                                train_end=T, fixed_init=0, optimizer=opt,
                                static_etha=0.0)

        @jax.jit
        def train_step(p, o, k):
            llr = channel.sample(k, jnp.full((bt,), sigma, jnp.float32))
            return tstep(p, o, llr, labels, jnp.float32(0.0))

        out_t = train_step(params_t, opt_state, key)
        jax.block_until_ready(out_t)
        tdir = os.path.join(os.path.dirname(args.out) or ".", "xprof_train")
        os.makedirs(tdir, exist_ok=True)
        with jax.profiler.trace(tdir):
            for i in range(args.steps):
                out_t = train_step(params_t, opt_state,
                                   jax.random.fold_in(key, 100 + i))
            jax.block_until_ready(out_t)
        paths = sorted(glob.glob(os.path.join(tdir, "**",
                                              "*.trace.json.gz"),
                                 recursive=True), key=os.path.getmtime)
        d = json.loads(gzip.open(paths[-1]).read())
        pids = {e["pid"]: e["args"]["name"] for e in d["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"}
        devt = {}
        for e in d["traceEvents"]:
            if e.get("ph") == "X" and "TPU" in str(pids.get(e["pid"], "")):
                devt.setdefault(e["name"], [0.0, 0])
                devt[e["name"]][0] += e["dur"]
                devt[e["name"]][1] += 1
        spans_t = sorted(((v[0] / args.steps, k) for k, v in devt.items()),
                         reverse=True)
        topt = spans_t[0][0]
        # the custom-vjp pallas kernels appear as jvp (forward) and
        # transpose_jvp (backward) spans in the device lane
        fwd_us = sum(us for us, n in spans_t
                     if n.startswith("jvp") and "transpose" not in n)
        bwd_us = sum(us for us, n in spans_t if n.startswith("transpose_jvp"))
        result["train"] = {
            "batch": bt, "tb": tb_t,
            "device_us_per_step": topt,
            "trained_cw_per_sec_device": bt / (topt * 1e-6),
            "fwd_kernel_us_per_step": fwd_us,
            "bwd_kernel_us_per_step": bwd_us,
            "bwd_over_fwd": (bwd_us / fwd_us) if fwd_us else None,
            "top_device_spans_us": [[round(us, 1), n[:80]]
                                    for us, n in spans_t[:10]],
            "trace_dir": tdir,
        }

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    print(f"\ndevice {prog_us/1e3:.2f} ms/step -> {cw_s:,.0f} cw/s; "
          f"VPU fraction {vpu_frac:.2f} "
          f"(@{OPS_PER_EDGE} analytic ops/edge); HBM {hbm_gbs:.0f} GB/s",
          file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
