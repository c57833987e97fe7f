"""Measured FER points for every bundled code family (round-3 breadth).

Rounds 1-2 measured deep curves for wman and one 5G code; round 3 adds
WiFi (campaign A) and MacKay (campaign B).  This sweep covers the rest so
every code in `codes/library.py` has at least a measured waterfall
segment on real TPU hardware:

* the three remaining shipped 50-iteration 5G NR weight sets
  (`/root/reference/Results/5G/*_Weight_End50.txt`, per-check sharing
  (2,2,2), systematic metrics as in `main_Base.py:29`),
* the z=72 5G code (no shipped set in the reference -> plain QMS),
* BCH_63_51 and Polar_64_48 (dense z=1 parity checks, plain QMS —
  the reference ships no trained weights for these either).

Results -> benchmarks/runs/round3/ALLCODES.json (resumable per point).

Usage: python benchmarks/all_codes_sweep.py
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

RUN_DIR = os.path.join(ROOT, "benchmarks", "runs", "round3")
OUT_JSON = os.path.join(RUN_DIR, "ALLCODES.json")

# (tag, code, weights-or-None, sharing, iters, systematic, snrs, batch)
SWEEPS = [
    ("5g_r033_z32_shipped50",
     "5G_LDPC_R0.33_n_dec896_n768_k256_z32_s257_320",
     "5G_LDPC_R0.33_n_dec896_n768_k256_z32_s257_320_iter50",
     (2, 2, 2), 50, 1, [1.0, 1.5, 2.0, 2.5], 65536),
    ("5g_r050_z64_shipped50",
     "5G_LDPC_R0.50_n_dec1280_n1024_k512_z64_s513_640",
     "5G_LDPC_R0.50_n_dec1280_n1024_k512_z64_s513_640_iter50",
     (2, 2, 2), 50, 1, [1.5, 2.0, 2.5, 3.0], 32768),
    ("5g_r073_z32_shipped50",
     "5G_LDPC_R0.73_n_dec480_n352_k256_z32_s257_320",
     "5G_LDPC_R0.73_n_dec480_n352_k256_z32_s257_320_iter50",
     (2, 2, 2), 50, 1, [3.0, 3.5, 4.0, 4.5], 65536),
    ("5g_r073_z72_plain_qms20",
     "5G_LDPC_R0.73_n_dec2304_n2112_k1536_z72_s1537_1584",
     None, (0, 0, 0), 20, 1, [3.5, 4.0, 4.5], 32768),
    ("bch_63_51_plain_qms20", "BCH_63_51",
     None, (0, 0, 0), 20, 0, [4.0, 5.0, 6.0, 7.0], 131072),
    ("polar_64_48_plain_qms20", "Polar_64_48",
     None, (0, 0, 0), 20, 0, [4.0, 5.0, 6.0, 7.0], 131072),
]


def main() -> int:
    import jax

    from ldpc_error_floor_tpu.channel import AWGNChannel
    from ldpc_error_floor_tpu.codes import TannerGraph, get_code
    from ldpc_error_floor_tpu.models import (DecoderConfig, NMSDecoder,
                                             WeightSpec, init_weights,
                                             load_params)
    from ldpc_error_floor_tpu.sim import FERSimulator
    from ldpc_error_floor_tpu.utils import enable_compile_cache
    enable_compile_cache()

    os.makedirs(RUN_DIR, exist_ok=True)
    results = {}
    if os.path.exists(OUT_JSON):
        with open(OUT_JSON) as f:
            results = json.load(f)

    on_tpu = jax.default_backend() == "tpu"
    for tag, code_name, weights, sharing, iters, systematic, snrs, batch \
            in SWEEPS:
        code = get_code(code_name)
        graph = TannerGraph(code)
        spec = WeightSpec(sharing=sharing, n_iters=iters)
        target = (code.N - code.M) if systematic else 0
        # scoped VMEM is 16 MiB on v5e: the [E, zp, tb] f32 state plus live
        # per-edge intermediates overflow tb=256 for big E*zp codes (the
        # z=64 5G code exceeds the limit by 240 KB — measured compile error)
        zp = -(-code.z // 8) * 8
        tb = 256 if (batch % 256 == 0 and graph.E * zp <= 3000) else 128
        dcfg = DecoderConfig(decoding_type=2, q_bit=5, target_node=target,
                             backend="pallas" if on_tpu else "xla",
                             pallas_tb=tb,
                             pallas_early_stop=on_tpu)
        dec = NMSDecoder(code, dcfg, spec, graph=graph)
        params = (load_params(spec, graph, weights) if weights
                  else init_weights(spec, graph))
        ch = AWGNChannel(code, decoding_type=2, q_bit=5)
        sim = FERSimulator(dec, ch, batch=batch,
                           inner_steps=4 if on_tpu else 1)
        pts = results.setdefault(tag, [])
        done = {pt["snr"] for pt in pts}
        key = jax.random.PRNGKey(11)
        for snr in snrs:
            key, sub = jax.random.split(key)
            if snr in done:
                continue
            t0 = time.perf_counter()
            pt = sim.run_point(params, snr, sub, max_frames=200_000_000,
                               target_frame_errors=100,
                               ckpt_path=os.path.join(
                                   RUN_DIR, f"ckpt_{tag}_snr{snr}.json"))
            print(f"[allcodes] {tag} SNR {snr}: FER {pt.fer_genie:.3e} "
                  f"BER {pt.ber_last:.3e} ({pt.frames:,} fr, "
                  f"{pt.frames_per_sec:,.0f} fr/s, "
                  f"{time.perf_counter()-t0:.0f} s)", flush=True)
            pts.append({"snr": snr, "fer_genie": pt.fer_genie,
                        "fer_last": pt.fer_last, "ber_last": pt.ber_last,
                        "frames": int(pt.frames),
                        "frames_per_sec": pt.frames_per_sec})
            with open(OUT_JSON, "w") as f:
                json.dump(results, f, indent=2)
    print("[allcodes] done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
