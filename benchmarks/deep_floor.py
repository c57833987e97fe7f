"""Deep error-floor sweep: extend the base-vs-boosted wman FER curves past
1e-8 with the fused early-stop kernel (the north-star measurement in
BASELINE.json).  Resumable: every point keeps a --ckpt JSON, so a
preempted sweep restarts mid-point.

Usage: python benchmarks/deep_floor.py --run-dir benchmarks/runs/boosted_wman_full
       [--snrs 5.25 5.5 5.75 6.0] [--target-errors 30] [--max-frames 2e10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

CODE = "wman_N0576_R34_z24"
BASE_WEIGHTS = f"{CODE}_base20"


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--run-dir", default="benchmarks/runs/boosted_wman_full")
    p.add_argument("--snrs", type=float, nargs="+",
                   default=[5.25, 5.5, 5.75, 6.0])
    p.add_argument("--target-errors", type=int, default=30)
    p.add_argument("--max-frames", type=float, default=2e10)
    p.add_argument("--batch", type=int, default=131072)
    p.add_argument("--seed", type=int, default=23)
    args = p.parse_args()

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
    post_file = os.path.join(args.run_dir, "Weights",
                             f"C0_{CODE}_Opt_Weight_End30.txt")
    out_path = os.path.join(args.run_dir, "DEEP_FLOOR.json")
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)

    for tag, iters, weights in (("base", 20, BASE_WEIGHTS),
                                ("boosted", 30, post_file)):
        spec = WeightSpec(sharing=(3, 3, 3), n_iters=iters)
        on_tpu = jax.default_backend() == "tpu"
        dcfg = DecoderConfig(decoding_type=2, q_bit=5,
                             backend="pallas" if on_tpu else "xla",
                             pallas_tb=256, pallas_early_stop=on_tpu)
        dec = NMSDecoder(code, dcfg, spec, graph=graph)
        params = load_params(spec, graph, weights)
        sim = FERSimulator(dec, ch, batch=args.batch,
                           inner_steps=8 if on_tpu else 1)
        pts = results.setdefault(tag, [])
        done = {pt["snr"] for pt in pts}
        key = jax.random.PRNGKey(args.seed)
        for snr in args.snrs:
            key, sub = jax.random.split(key)
            if snr in done:
                continue
            ck = os.path.join(args.run_dir, f"deep_{tag}_snr{snr}.json")
            t0 = time.perf_counter()
            pt = sim.run_point(params, snr, sub,
                               max_frames=int(args.max_frames),
                               target_frame_errors=args.target_errors,
                               ckpt_path=ck)
            print(f"[deep_floor] {tag:8s} SNR {snr}: FER_genie "
                  f"{pt.fer_genie:.3e} ({pt.frames:,} frames, "
                  f"{pt.frames_per_sec:,.0f} fr/s, "
                  f"{time.perf_counter()-t0:.0f} s)", flush=True)
            pts.append({"snr": snr, "fer_genie": pt.fer_genie,
                        "fer_last": pt.fer_last, "ber_last": pt.ber_last,
                        "frames": int(pt.frames),
                        "frames_per_sec": pt.frames_per_sec})
            with open(out_path, "w") as f:
                json.dump(results, f, indent=2)
    print(f"[deep_floor] wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
