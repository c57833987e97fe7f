"""Round-5 extension of the 5G boosted deep curve: one point at 5.5 dB on
the bundled framework-trained boosted-30 weights (round-3 campaign,
`benchmarks/runs/round3/DEEP_BOOSTED_5G.json` ends at 1.18e-8 @ 5.0 dB).

Usage: python benchmarks/round5_deep_5g.py [--snr 5.5] [--target-errors 30]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

CODE = "5G_LDPC_R0.50_n_dec640_n512_k256_z32_s257_320"


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--run-dir", default="benchmarks/runs/round5")
    p.add_argument("--snr", type=float, default=5.5)
    p.add_argument("--target-errors", type=int, default=30)
    p.add_argument("--max-frames", type=float, default=6e10)
    p.add_argument("--batch", type=int, default=131072)
    p.add_argument("--seed", type=int, default=41)
    args = p.parse_args()
    os.makedirs(args.run_dir, exist_ok=True)

    from ldpc_error_floor_tpu.utils import enable_compile_cache
    enable_compile_cache()
    from ldpc_error_floor_tpu.channel import AWGNChannel
    from ldpc_error_floor_tpu.codes import TannerGraph, get_code
    from ldpc_error_floor_tpu.models import (DecoderConfig, NMSDecoder,
                                             WeightSpec, load_params)
    from ldpc_error_floor_tpu.sim import FERSimulator

    code = get_code(CODE)
    graph = TannerGraph(code)
    ch = AWGNChannel(code, decoding_type=2, q_bit=5)
    spec = WeightSpec(sharing=(2, 2, 2), n_iters=30, fixed_iter=20)
    params = load_params(spec, graph, f"{CODE}_boosted30")
    on_tpu = jax.default_backend() == "tpu"
    dcfg = DecoderConfig(decoding_type=2, q_bit=5,
                         backend="pallas" if on_tpu else "xla",
                         pallas_tb=256, pallas_early_stop=on_tpu,
                         target_node=code.N - code.M)
    dec = NMSDecoder(code, dcfg, spec, graph=graph)
    sim = FERSimulator(dec, ch, batch=args.batch,
                       inner_steps=8 if on_tpu else 1)
    ck = os.path.join(args.run_dir, f"deep5g_boosted_snr{args.snr}.json")
    pt = sim.run_point(params, args.snr, jax.random.PRNGKey(args.seed),
                       max_frames=int(args.max_frames),
                       target_frame_errors=args.target_errors, ckpt_path=ck)
    out = dataclasses.asdict(pt)
    print(f"[round5_deep_5g] boosted30 SNR {args.snr}: {out}", flush=True)
    path = os.path.join(args.run_dir, "DEEP_5G_EXT.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
