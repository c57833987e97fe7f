import sys, os, json, time
sys.path.insert(0, "/root/repo")
import jax
from ldpc_error_floor_tpu.utils import enable_compile_cache
enable_compile_cache()
from ldpc_error_floor_tpu.channel import AWGNChannel
from ldpc_error_floor_tpu.codes import TannerGraph, get_code
from ldpc_error_floor_tpu.models import DecoderConfig, NMSDecoder, WeightSpec, load_params
from ldpc_error_floor_tpu.sim import FERSimulator

CODE = "5G_LDPC_R0.50_n_dec640_n512_k256_z32_s257_320"
RUN = "/root/repo/benchmarks/runs/round3"
OUT = os.path.join(RUN, "DEEP_BOOSTED_5G.json")
results = json.load(open(OUT)) if os.path.exists(OUT) else {}

code = get_code(CODE); graph = TannerGraph(code)
ch = AWGNChannel(code, decoding_type=2, q_bit=5)
target = code.N - code.M
for tag, iters, wfile in (
    ("base20", 20, f"{RUN}/5g_base_scratch/Weights/C0_{CODE}_Opt_Weight_End20.txt"),
    ("boosted30", 30, f"{RUN}/boosted_5g/Weights/C0_{CODE}_Opt_Weight_End30.txt"),
):
    spec = WeightSpec(sharing=(2, 2, 2), n_iters=iters)
    dcfg = DecoderConfig(decoding_type=2, q_bit=5, target_node=target,
                         backend="pallas", pallas_tb=256,
                         pallas_early_stop=True)
    dec = NMSDecoder(code, dcfg, spec, graph=graph)
    params = load_params(spec, graph, wfile)
    sim = FERSimulator(dec, ch, batch=131072, inner_steps=8)
    pts = results.setdefault(tag, [])
    done = {p["snr"] for p in pts}
    key = jax.random.PRNGKey(41)
    for snr in (4.5, 5.0):
        key, sub = jax.random.split(key)
        if snr in done: continue
        t0 = time.perf_counter()
        pt = sim.run_point(params, snr, sub, max_frames=60_000_000_000,
                           target_frame_errors=40,
                           ckpt_path=f"{RUN}/ckpt_deep5g_{tag}_{snr}.json")
        print(f"[deep5g] {tag} SNR {snr}: FER {pt.fer_genie:.3e} "
              f"({pt.frames:,} fr, {pt.frames_per_sec:,.0f} fr/s, "
              f"{time.perf_counter()-t0:.0f} s)", flush=True)
        pts.append({"snr": snr, "fer_genie": pt.fer_genie,
                    "fer_last": pt.fer_last, "ber_last": pt.ber_last,
                    "frames": int(pt.frames),
                    "frames_per_sec": pt.frames_per_sec})
        json.dump(results, open(OUT, "w"), indent=2)
print("[deep5g] done", flush=True)
