"""Fast parity + throughput harness for decode-kernel optimization work.

Parity: the Pallas stats kernel must produce bit-identical error counters
(and allclose APPs) vs the scan backend on-chip.  Throughput: fused
sample+decode+count at a fixed large batch, kernel variants selected via
env (LDPC_KERNEL_UNROLL etc.).

Usage: python benchmarks/kernel_opt_check.py [--batch 131072] [--skip-parity]
       [--sharing 3 0 3] [--code wman_N0576_R34_z24] [--tb 256]
(UCN parity is exercised by passing a sharing triple with a nonzero UCN
entry, e.g. --sharing 3 3 3.)
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=131072)
    p.add_argument("--parity-batch", type=int, default=2048)
    p.add_argument("--code", default="wman_N0576_R34_z24")
    p.add_argument("--sharing", type=int, nargs=3, default=[3, 0, 3])
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--skip-parity", action="store_true")
    p.add_argument("--skip-throughput", action="store_true")
    p.add_argument("--tb", type=int, default=256)
    args = p.parse_args()

    from ldpc_error_floor_tpu.utils import enable_compile_cache
    enable_compile_cache()
    from ldpc_error_floor_tpu.channel import AWGNChannel
    from ldpc_error_floor_tpu.codes import TannerGraph, get_code
    from ldpc_error_floor_tpu.models import (DecoderConfig, NMSDecoder,
                                             WeightSpec, init_weights)

    code = get_code(args.code)
    graph = TannerGraph(code)
    spec = WeightSpec(sharing=tuple(args.sharing), n_iters=args.iters)
    params = init_weights(spec, graph)
    # non-trivial weights so weighting paths are exercised
    params = jax.tree.map(
        lambda w: w * 0.9 if w is not None else None, params)
    channel = AWGNChannel(code, decoding_type=2, q_bit=5)
    sigma = jnp.float32(code.snr_sigmas([3.5])[0])
    key = jax.random.PRNGKey(7)

    if not args.skip_parity:
        dcfg_x = DecoderConfig(decoding_type=2, q_bit=5, backend="xla")
        dcfg_p = DecoderConfig(decoding_type=2, q_bit=5, backend="pallas",
                               pallas_tb=min(args.tb, args.parity_batch))
        dec_x = NMSDecoder(code, dcfg_x, spec, graph=graph)
        dec_p = NMSDecoder(code, dcfg_p, spec, graph=graph)
        llr = channel.sample(key, jnp.full((args.parity_batch,), sigma))
        rx = jax.jit(lambda p, l: dec_x.apply(p, l, collect="stats"))(
            params, llr)
        rp = jax.jit(lambda p, l: dec_p.apply(p, l, collect="stats"))(
            params, llr)
        ef_x = np.asarray(rx.err_flags)
        ef_p = np.asarray(rp.err_flags)
        be_x = np.asarray(rx.bit_errors)
        be_p = np.asarray(rp.bit_errors)
        app_x = np.asarray(rx.app_last)
        app_p = np.asarray(rp.app_last)
        assert ef_x.shape == ef_p.shape
        ok_ef = bool((ef_x == ef_p).all())
        ok_be = bool((be_x == be_p).all())
        ok_app = bool(np.array_equal(app_x, app_p))
        print(f"parity err_flags={'OK' if ok_ef else 'FAIL'} "
              f"bit_errors={'OK' if ok_be else 'FAIL'} "
              f"app_bitexact={'OK' if ok_app else 'FAIL'} "
              f"max|dapp|={np.abs(app_x - app_p).max():.3e}")
        if not (ok_ef and ok_be):
            bad = np.nonzero(be_x != be_p)
            print("first mismatches:", bad[0][:5], bad[1][:5])
            return 1

    if not args.skip_throughput:
        dcfg = DecoderConfig(decoding_type=2, q_bit=5, backend="pallas",
                             pallas_tb=args.tb)
        dec = NMSDecoder(code, dcfg, spec, graph=graph)

        @jax.jit
        def step(params, key, sigma):
            llr = channel.sample(key, jnp.full((args.batch,), sigma))
            res = dec.apply(params, llr, collect="stats")
            return (jnp.sum(res.bit_errors[-1]), jnp.sum(res.err_flags[-1]),
                    jnp.sum(res.uncor_mask))

        t0 = time.perf_counter()
        out = step(params, key, sigma)
        jax.block_until_ready(out)
        print(f"compile+first: {time.perf_counter() - t0:.1f} s", flush=True)
        for _ in range(2):
            jax.block_until_ready(step(params, key, sigma))
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            out = step(params, key, sigma)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n
        print(f"throughput: {args.batch / dt:,.0f} cw/s  "
              f"({dt * 1e3:.2f} ms/step, batch {args.batch}, tb {args.tb})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
