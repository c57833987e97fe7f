"""Round-4 measurement campaigns: trained-NMS campaigns for the two dense
z=1 algebraic codes the reference ships as graph-capability checks
(`/root/reference/BaseGraph/BCH_63_51.txt`, `Polar_64_48.txt`) — the last
code families with capability-but-no-measurement coverage (round-3 VERDICT
item #5).

Each code gets TWO trainings at the full reference recipe
(`main_Base.py:49-55,63`: 200 epochs x 500 steps of batch 20, QMS q=5,
soft-FER loss, eta=0, lr 1e-3):

  * per-iteration scalar sharing (3,0,3) — the reference's base-decoder
    default (`main_Base.py:25`);
  * per-edge sharing (1,1,0) — the one sharing regime nothing else in the
    repo measures (legal per `check_params`: VN must not be per-edge,
    UCN sharing must equal CN sharing, `Main_Functions.py:507-521`; the
    z=1 dense codes are exactly where per-edge weights have room to act,
    E=336/400 free parameters per iteration).

plus trained-vs-plain waterfall FER curves.

Results land in benchmarks/runs/round4/CAMPAIGNS.json; each phase is
idempotent (skipped when its artifact exists).

Usage: python benchmarks/round4_campaigns.py [--only E F]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

RUN_DIR = os.path.join(ROOT, "benchmarks", "runs", "round4")
OUT_JSON = os.path.join(RUN_DIR, "CAMPAIGNS.json")

BCH = "BCH_63_51"
POLAR = "Polar_64_48"

# the full reference training recipe (main_Base.py:49-55,63)
RECIPE = dict(decoding_type=2, q_bit=5, neural_mode="scale", clip_llr=20.0,
              sampling_type=0, train_on_zero_word=1, loss_type=2,
              opt_metric=1, etha_start=0.0, learn_rate_start=1e-3,
              batch_size=20, training_num=10000, epochs=200, valid_flag=1,
              valid_num=10000, test_flag=0, eval_loss=0, init_from_file=0,
              init_weight=1.0, init_vn_weight=1.0, max_weight=2.0,
              min_weight=0.0, checkpoint_every=20, resume=1, seed=2,
              input_dir="./Inputs")


def log(msg: str) -> None:
    print(f"[round4] {msg}", flush=True)


def load_results() -> dict:
    if os.path.exists(OUT_JSON):
        with open(OUT_JSON) as f:
            return json.load(f)
    return {}


def save_results(res: dict) -> None:
    os.makedirs(RUN_DIR, exist_ok=True)
    with open(OUT_JSON, "w") as f:
        json.dump(res, f, indent=2)


def train(tag: str, code: str, sharing, iters: int, snrs,
          eval_batch=2048) -> str:
    """Full-recipe training via the CLI; returns the Opt weight path.

    z=1 dense codes follow the round-3 MacKay precautions: scan_unroll=1
    (fully-unrolled z=1 scan bodies SIGSEGV the remote TPU compiler) and
    loss-free evaluation at a tile-aligned batch (eval rides the Pallas
    stats kernel)."""
    out_dir = os.path.join(RUN_DIR, tag, "Weights")
    prefix = f"C0_{code}"
    opt = os.path.join(out_dir, f"{prefix}_Opt_Weight_End{iters}.txt")
    done = os.path.join(out_dir, "DONE")
    cfg_path = os.path.join(RUN_DIR, f"{tag}_cfg.json")
    if os.path.exists(opt) and os.path.exists(done):
        log(f"{tag}: already trained ({opt})")
        return opt
    cfg = dict(RECIPE, code=code, sharing=list(sharing), iters_max=iters,
               fixed_iter=0, fixed_init=0, iter_step=iters,
               systematic=0, snrs=list(snrs), out_dir=out_dir,
               out_prefix=prefix, scan_unroll=1)
    os.makedirs(RUN_DIR, exist_ok=True)
    with open(cfg_path, "w") as f:
        json.dump(cfg, f, indent=2)
    log(f"{tag}: training {code} sharing {sharing} iters {iters} "
        f"snrs {list(snrs)}")
    t0 = time.perf_counter()
    subprocess.run([sys.executable, "-m", "ldpc_error_floor_tpu.cli",
                    "train", "--config", cfg_path,
                    "--eval-batch", str(eval_batch)],
                   check=True, cwd=ROOT)
    with open(done, "w") as f:
        f.write("ok\n")
    log(f"{tag}: trained in {time.perf_counter() - t0:.0f} s")
    return opt


def fer_curve(tag: str, code: str, weights, sharing, iters: int, snrs,
              target_errors: int, max_frames: float, results: dict,
              seed=41, batch=131072) -> None:
    """Resumable FER sweep (round3_campaigns.py pattern)."""
    import jax

    from ldpc_error_floor_tpu.channel import AWGNChannel
    from ldpc_error_floor_tpu.codes import TannerGraph, get_code
    from ldpc_error_floor_tpu.models import (DecoderConfig, NMSDecoder,
                                             WeightSpec, init_weights,
                                             load_params)
    from ldpc_error_floor_tpu.ops.pallas_decoder import auto_tb
    from ldpc_error_floor_tpu.sim import FERSimulator

    code_obj = get_code(code)
    graph = TannerGraph(code_obj)
    spec = WeightSpec(sharing=tuple(sharing), n_iters=iters)
    on_tpu = jax.default_backend() == "tpu"
    tb = auto_tb(graph, batch, mode="stats", ucn=spec.ucn_enabled,
                 n_iters=iters) or 128
    dcfg = DecoderConfig(decoding_type=2, q_bit=5,
                         backend="pallas" if on_tpu else "xla",
                         pallas_tb=tb, pallas_early_stop=on_tpu)
    dec = NMSDecoder(code_obj, dcfg, spec, graph=graph)
    params = (load_params(spec, graph, weights) if weights
              else init_weights(spec, graph))
    ch = AWGNChannel(code_obj, decoding_type=2, q_bit=5)
    sim = FERSimulator(dec, ch, batch=batch,
                       inner_steps=8 if on_tpu else 1)
    pts = results.setdefault(tag, [])
    done = {pt["snr"] for pt in pts}
    key = jax.random.PRNGKey(seed)
    for snr in snrs:
        key, sub = jax.random.split(key)
        if snr in done:
            continue
        ck = os.path.join(RUN_DIR, f"ckpt_{tag}_snr{snr}.json")
        t0 = time.perf_counter()
        pt = sim.run_point(params, snr, sub, max_frames=int(max_frames),
                           target_frame_errors=target_errors, ckpt_path=ck)
        log(f"{tag} SNR {snr}: FER_genie {pt.fer_genie:.3e} "
            f"BER {pt.ber_last:.3e} ({pt.frames:,} frames, "
            f"{pt.frames_per_sec:,.0f} fr/s, "
            f"{time.perf_counter() - t0:.0f} s)")
        pts.append({"snr": snr, "fer_genie": pt.fer_genie,
                    "fer_last": pt.fer_last, "ber_last": pt.ber_last,
                    "frames": int(pt.frames),
                    "frames_per_sec": pt.frames_per_sec})
        save_results(load_results() | {tag: pts})


def campaign_E(results: dict) -> None:
    """BCH (63,51) trained campaigns."""
    # plain QMS-20 measures FER 1.8e-2 at 6.0 dB (round-3 ALLCODES) ->
    # the reference-style training window (FER ~ 1e-1..1e-3) sits at
    # SNR ~ 4..6 for this code
    snrs_train = [4.0, 4.5, 5.0, 5.5, 6.0]
    w_scalar = train("bch_scalar", BCH, (3, 0, 3), 20, snrs_train)
    w_edge = train("bch_peredge", BCH, (1, 1, 0), 20, snrs_train)
    curve = [3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
    kw = dict(target_errors=100, max_frames=1e9, results=results)
    fer_curve("bch_trained_scalar", BCH, w_scalar, (3, 0, 3), 20, curve, **kw)
    fer_curve("bch_trained_peredge", BCH, w_edge, (1, 1, 0), 20, curve, **kw)
    fer_curve("bch_plain_qms", BCH, None, (0, 0, 0), 20, curve, **kw)


def campaign_F(results: dict) -> None:
    """Polar (64,48)-as-LDPC trained campaigns."""
    snrs_train = [4.0, 4.5, 5.0, 5.5, 6.0]
    w_scalar = train("polar_scalar", POLAR, (3, 0, 3), 20, snrs_train)
    w_edge = train("polar_peredge", POLAR, (1, 1, 0), 20, snrs_train)
    curve = [3.0, 4.0, 5.0, 6.0, 7.0, 8.0]
    kw = dict(target_errors=100, max_frames=1e9, results=results)
    fer_curve("polar_trained_scalar", POLAR, w_scalar, (3, 0, 3), 20,
              curve, **kw)
    fer_curve("polar_trained_peredge", POLAR, w_edge, (1, 1, 0), 20,
              curve, **kw)
    fer_curve("polar_plain_qms", POLAR, None, (0, 0, 0), 20, curve, **kw)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--only", nargs="+", default=["E", "F"])
    args = p.parse_args()
    from ldpc_error_floor_tpu.utils import enable_compile_cache
    enable_compile_cache()
    os.makedirs(RUN_DIR, exist_ok=True)
    results = load_results()
    for name, fn in (("E", campaign_E), ("F", campaign_F)):
        if name in args.only:
            log(f"=== campaign {name} ===")
            fn(results)
            results = load_results() | results
            save_results(results)
    log("all campaigns done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
