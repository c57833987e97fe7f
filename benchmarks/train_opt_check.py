"""Fast train-path throughput probe for the fused Pallas train kernels
(mirrors bench.py's train diagnostic: fwd+bwd+Adam, whole-epoch dispatch).

Usage: python benchmarks/train_opt_check.py [--batches 2048 32768] [--tb 128]
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
    p.add_argument("--batches", type=int, nargs="+", default=[2048, 32768])
    p.add_argument("--tb", type=int, nargs="+", default=[128, 256])
    p.add_argument("--sharing", type=int, nargs=3, default=[3, 0, 3])
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--decoding-type", type=int, default=2,
                   help="0 SP / 1 MS / 2 QMS / 3 MS_RAW (round 5: SP has "
                        "a fused backward too)")
    args = p.parse_args()

    from ldpc_error_floor_tpu.utils import enable_compile_cache
    enable_compile_cache()
    from ldpc_error_floor_tpu.channel import AWGNChannel
    from ldpc_error_floor_tpu.codes import TannerGraph, get_code
    from ldpc_error_floor_tpu.models import (DecoderConfig, NMSDecoder,
                                             WeightSpec, init_weights)
    from ldpc_error_floor_tpu.training.train import (make_epoch_step,
                                                     make_optimizer)

    code = get_code("wman_N0576_R34_z24")
    graph = TannerGraph(code)
    T = args.iters
    spec = WeightSpec(sharing=tuple(args.sharing), n_iters=T)
    channel = AWGNChannel(code, decoding_type=args.decoding_type, q_bit=5)
    sigma = jnp.float32(code.snr_sigmas([3.0])[0])
    key = jax.random.PRNGKey(3)
    opt = make_optimizer(1e-3)
    n_steps = args.steps

    for tb in args.tb:
        for batch in args.batches:
            # production config: static eta=0 loss -> last-iteration APP
            # emission window (pipelines/train.py sets the same)
            dc = DecoderConfig(decoding_type=args.decoding_type, q_bit=5,
                               backend="pallas",
                               pallas_tb=tb, pallas_app_t0=T - 1)
            try:
                dec = NMSDecoder(code, dc, spec, graph=graph)
                params = init_weights(spec, graph)
                opt_state = opt.init(params)
                labels = jnp.zeros((code.n_full, batch), jnp.float32)
                sigmas = jnp.full((batch,), sigma, jnp.float32)
                estep = make_epoch_step(dec, spec, loss_type=2,
                                        train_start=0, train_end=T,
                                        fixed_init=0, optimizer=opt,
                                        n_steps=n_steps, labels=labels,
                                        channel=channel, sigmas=sigmas,
                                        static_etha=0.0)

                def run(p, o, k):
                    return estep(jax.tree.map(jnp.copy, p),
                                 jax.tree.map(jnp.copy, o), k,
                                 jnp.float32(0.0))

                out = run(params, opt_state, key)
                jax.block_until_ready(out)
                for _ in range(2):
                    jax.block_until_ready(run(params, opt_state, key))
                t0 = time.perf_counter()
                reps = 5
                for _ in range(reps):
                    out = run(params, opt_state, key)
                jax.block_until_ready(out)
                dt = (time.perf_counter() - t0) / reps
            except Exception as e:
                print(f"tb {tb} batch {batch}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                continue
            rate = batch * n_steps / dt
            print(f"tb {tb} batch {batch}: {rate:,.0f} trained cw/s "
                  f"({dt*1e3/n_steps:.2f} ms/step)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
