"""On-chip validation + throughput for the sublane-packed kernels (round 5).

For z < 8 codes (MacKay/BCH/Polar, z=1) the fused kernels pack
P = zp // z batch groups into the 8 sublanes of every tile
(ops/pallas_decoder.py).  CPU-side parity vs the scan backend is covered by
tests/test_pallas_decoder.py; this script checks the MOSAIC-compiled kernel
on the real chip against the Pallas interpreter (same device, same inputs —
the scan path is unusable here: tpu_compile_helper SIGSEGVs on z=1 scan
programs, a known environment fault), then measures packed decode and
train throughput.

Usage: python benchmarks/packed_check.py [--code MACKAY_N96_K48]
       [--batch 131072] [--tb 256] [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--code", default="MACKAY_N96_K48")
    p.add_argument("--sharing", type=int, nargs=3, default=[3, 0, 3])
    p.add_argument("--batch", type=int, default=131072)
    p.add_argument("--parity-batch", type=int, default=4096)
    p.add_argument("--tb", type=int, default=256)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--parity-iters", type=int, default=8,
                   help="shallower unroll for the mosaic-vs-interpret "
                        "parity leg (the interpret kernel's XLA graph "
                        "compile grows with T*E)")
    p.add_argument("--train-batch", type=int, default=32768)
    p.add_argument("--skip-train", action="store_true")
    args = p.parse_args()

    from ldpc_error_floor_tpu.utils import enable_compile_cache
    enable_compile_cache()
    from ldpc_error_floor_tpu.channel import AWGNChannel
    from ldpc_error_floor_tpu.codes import TannerGraph, get_code
    from ldpc_error_floor_tpu.models import (DecoderConfig, NMSDecoder,
                                             WeightSpec, init_weights)
    from ldpc_error_floor_tpu.models.weights import stack_weights
    from ldpc_error_floor_tpu.ops.pallas_decoder import FusedNMSKernel

    code = get_code(args.code)
    graph = TannerGraph(code)
    spec = WeightSpec(sharing=tuple(args.sharing), n_iters=args.iters)
    spec_p = WeightSpec(sharing=tuple(args.sharing),
                        n_iters=args.parity_iters)
    cfg = DecoderConfig(decoding_type=2, q_bit=5)
    params = jax.tree.map(lambda w: w * 0.9 if w is not None else None,
                          init_weights(spec, graph))
    params_p = jax.tree.map(lambda w: w[:args.parity_iters]
                            if w is not None else None, params)
    stacked = stack_weights(spec_p, params_p)
    channel = AWGNChannel(code, decoding_type=2, q_bit=5)
    sigma = jnp.float32(code.snr_sigmas([3.5])[0])
    key = jax.random.PRNGKey(7)

    kern_n = FusedNMSKernel(graph, cfg, spec_p, tb=args.tb, interpret=False)
    kern_i = FusedNMSKernel(graph, cfg, spec_p, tb=args.tb, interpret=True)
    print(f"{args.code}: z={code.z} zp={kern_n.zp} pack P={kern_n.P} "
          f"-> {kern_n.P * args.tb} codewords/tile", flush=True)

    llr = channel.sample(key, jnp.full((args.parity_batch,), sigma))
    app_n, err_n, nerr_n = jax.block_until_ready(
        kern_n.decode_stats(stacked, llr))
    app_i, err_i, nerr_i = jax.block_until_ready(
        kern_i.decode_stats(stacked, llr))
    ok_err = bool(np.array_equal(np.asarray(err_n), np.asarray(err_i)))
    ok_ne = bool(np.array_equal(np.asarray(nerr_n), np.asarray(nerr_i)))
    ok_app = bool(np.array_equal(np.asarray(app_n), np.asarray(app_i)))
    print(f"parity mosaic-vs-interpret: err={'OK' if ok_err else 'FAIL'} "
          f"nerr={'OK' if ok_ne else 'FAIL'} "
          f"app_bitexact={'OK' if ok_app else 'FAIL'}", flush=True)
    if not (ok_err and ok_ne):
        return 1

    dec = NMSDecoder(code, DecoderConfig(decoding_type=2, q_bit=5,
                                         backend="pallas",
                                         pallas_tb=args.tb),
                     spec, graph=graph)

    @jax.jit
    def step(params, key, sigma):
        llr = channel.sample(key, jnp.full((args.batch,), sigma))
        res = dec.apply(params, llr, collect="stats")
        return (jnp.sum(res.bit_errors[-1]), jnp.sum(res.err_flags[-1]),
                jnp.sum(res.uncor_mask))

    t0 = time.perf_counter()
    jax.block_until_ready(step(params, key, sigma))
    print(f"decode compile+first: {time.perf_counter() - t0:.1f} s",
          flush=True)
    for _ in range(2):
        jax.block_until_ready(step(params, key, sigma))
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        out = step(params, key, sigma)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"decode throughput: {args.batch / dt:,.0f} cw/s "
          f"({dt * 1e3:.2f} ms/step, batch {args.batch}, tb {args.tb})",
          flush=True)

    if not args.skip_train:
        from ldpc_error_floor_tpu.training.train import (make_optimizer,
                                                         make_train_step)
        opt = make_optimizer(1e-3)
        tb_tr = 128
        dec_t = NMSDecoder(code, DecoderConfig(decoding_type=2, q_bit=5,
                                               backend="pallas",
                                               pallas_tb=tb_tr),
                           spec, graph=graph)
        tstep = make_train_step(dec_t, spec, loss_type=2, train_start=0,
                                train_end=args.iters, optimizer=opt,
                                donate=False)
        tp = params
        st = opt.init(tp)
        bt = args.train_batch
        labels = jnp.zeros((code.N * code.z, bt), jnp.float32)
        llr_t = channel.sample(key, jnp.full((bt,), sigma))
        t0 = time.perf_counter()
        (tp, st), loss = tstep(tp, st, llr_t, labels, jnp.float32(0.0))
        jax.block_until_ready(loss)
        print(f"train compile+first: {time.perf_counter() - t0:.1f} s",
              flush=True)
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            (tp, st), loss = tstep(tp, st, llr_t, labels, jnp.float32(0.0))
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / n
        print(f"train throughput: {bt / dt:,.0f} trained cw/s "
              f"({dt * 1e3:.2f} ms/step, batch {bt}, tb {tb_tr})",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
