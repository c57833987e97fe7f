"""Training-throughput experiment: trained codewords/s for the
differentiable scan decoder across batch sizes, remat, and scan-unroll
factors (the forward-only Pallas kernel is ~14x the scanned XLA forward
because its state never leaves VMEM; unrolling moves the scan path in that
direction).  Prints one line per configuration; pick winners into
pipelines defaults / RESULTS.md.

Usage: python benchmarks/train_throughput.py [--iters 20] [--batches 2048 4096]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--batches", type=int, nargs="+",
                   default=[1024, 2048, 4096])
    p.add_argument("--unrolls", type=int, nargs="+", default=[1, 4, 20])
    p.add_argument("--remat", type=int, nargs="+", default=[1, 0])
    args = p.parse_args()

    from ldpc_error_floor_tpu.utils import enable_compile_cache
    enable_compile_cache()
    from ldpc_error_floor_tpu.channel import AWGNChannel
    from ldpc_error_floor_tpu.codes import TannerGraph, get_code
    from ldpc_error_floor_tpu.models import (DecoderConfig, NMSDecoder,
                                             WeightSpec, init_weights)
    from ldpc_error_floor_tpu.training.train import (make_optimizer,
                                                     make_train_step)

    code = get_code("wman_N0576_R34_z24")
    graph = TannerGraph(code)
    T = args.iters
    spec = WeightSpec(sharing=(3, 0, 3), n_iters=T)
    channel = AWGNChannel(code, decoding_type=2, q_bit=5)
    sigma = jnp.float32(code.snr_sigmas([3.0])[0])
    key = jax.random.PRNGKey(0)
    opt = make_optimizer(1e-3)
    best = (0.0, None)
    for batch in args.batches:
        llr = channel.sample(key, jnp.full((batch,), sigma, jnp.float32))
        labels = jnp.zeros((code.n_full, batch), jnp.float32)
        for remat in args.remat:
            for unroll in args.unrolls:
                dec = NMSDecoder(code, DecoderConfig(
                    decoding_type=2, q_bit=5, remat=bool(remat),
                    unroll=unroll), spec, graph=graph)
                params = init_weights(spec, graph)
                opt_state = opt.init(params)
                step = make_train_step(dec, spec, loss_type=2, train_start=0,
                                       train_end=T, optimizer=opt,
                                       donate=False)
                try:
                    out = step(params, opt_state, llr, labels,
                               jnp.float32(0.0))
                    jax.block_until_ready(out[1])
                    t0 = time.perf_counter()
                    for _ in range(10):
                        out = step(params, opt_state, llr, labels,
                                   jnp.float32(0.0))
                    jax.block_until_ready(out[1])
                    dt = (time.perf_counter() - t0) / 10
                except Exception as e:
                    print(f"batch {batch} remat {remat} unroll {unroll}: "
                          f"FAILED {type(e).__name__}", flush=True)
                    continue
                rate = batch / dt
                tag = f"batch {batch} remat {remat} unroll {unroll:2d}"
                print(f"{tag}: {rate:10,.0f} trained cw/s "
                      f"({dt*1e3:7.2f} ms/step)", flush=True)
                if rate > best[0]:
                    best = (rate, tag)
    print(f"best: {best[0]:,.0f} trained cw/s  [{best[1]}]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
