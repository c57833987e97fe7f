"""Round-5 north-star re-measurement (VERDICT round-4 item 6).

Re-runs the deepest wman point — the published 50-iteration WiMAX weights
(`/root/reference/Results/WiMAX/Weights_Iter50.txt`) at 6.25 dB, the
8.6e-10 FER_genie point BASELINE.json's north star cares about — on the
round-4/5 kernels, and adds the deploy-mode (syndrome early-termination)
counters next to the genie ones: FER at each frame's own stop iteration,
the undetected-error rate (convergence to a wrong codeword — the quantity
a deployed decoder's CRC layer must absorb, which the reference cannot
measure, `Print_Functions.py:100-118` has only genie flags), and the
average iterations per frame.

Resumable per mode via FERSimulator's --ckpt JSONs.

Usage: python benchmarks/round5_deep.py [--snr 6.25] [--target-errors 30]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

CODE = "wman_N0576_R34_z24"
WEIGHTS = f"{CODE}_iter50"   # the reference's Results/WiMAX/Weights_Iter50.txt
ITERS = 50


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--run-dir", default="benchmarks/runs/round5")
    p.add_argument("--snr", type=float, default=6.25)
    p.add_argument("--target-errors", type=int, default=30)
    p.add_argument("--max-frames", type=float, default=6e10)
    p.add_argument("--batch", type=int, default=131072)
    p.add_argument("--seed", type=int, default=31)
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
    spec = WeightSpec(sharing=(3, 3, 3), n_iters=ITERS)
    params = load_params(spec, graph, WEIGHTS)
    on_tpu = jax.default_backend() == "tpu"

    out_path = os.path.join(args.run_dir, "DEEP_NORTHSTAR.json")
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)

    for mode in ("genie", "syndrome"):
        if mode in results:
            print(f"[round5_deep] {mode}: already done, skipping")
            continue
        dcfg = DecoderConfig(decoding_type=2, q_bit=5,
                             backend="pallas" if on_tpu else "xla",
                             pallas_tb=256,
                             pallas_early_stop=(on_tpu and mode == "genie"))
        dec = NMSDecoder(code, dcfg, spec, graph=graph)
        sim = FERSimulator(dec, ch, batch=args.batch,
                           inner_steps=8 if on_tpu else 1,
                           stop=mode)
        ck = os.path.join(args.run_dir, f"deep_{mode}_snr{args.snr}.json")
        key = jax.random.PRNGKey(args.seed + (0 if mode == "genie" else 1))
        t0 = time.perf_counter()
        pt = sim.run_point(params, args.snr, key,
                           max_frames=int(args.max_frames),
                           target_frame_errors=args.target_errors,
                           ckpt_path=ck)
        results[mode] = dataclasses.asdict(pt)
        results[mode]["wall_s"] = time.perf_counter() - t0
        print(f"[round5_deep] {mode}: {results[mode]}", flush=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    print(f"[round5_deep] wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
