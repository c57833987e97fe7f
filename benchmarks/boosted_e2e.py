"""End-to-end boosted two-stage decoding experiment (the NeurIPS'23 headline
pipeline, SURVEY.md section 2.6) on one TPU chip:

  1. materialize the published 20-iteration base weights
     (`Weights/C0_wman_N0576_R34_z24_Opt_Weight_End20.txt` in the reference);
  2. harvest uncorrected words at one error-floor SNR with the fused
     early-stop kernel (reference sampling_type=2, `main_Base.py`);
  3. split them into train/valid/test datasets (reference leaves this manual);
  4. train the post decoder (iterations 20..30, UCN weights on, frozen base
     prefix) on the harvested words (reference `main_Post.py`);
  5. evaluate base-only vs boosted FER at error-floor SNRs, plus the fraction
     of held-out uncorrected test words the post stage rescues.

Each phase is idempotent (skipped when its artifact already exists), so the
script can resume after interruption.  Results are written to
`{run_dir}/RESULTS.json`.

Usage: python benchmarks/boosted_e2e.py [--run-dir DIR] [--collect-snr 4.2]
       [--words 20000] [--post-epochs 40] [--eval-snrs 4.0 4.25 4.5] ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# set from CLI args in main(); defaults = the NeurIPS'23 WiMAX 20+10 pipeline
CODE = "wman_N0576_R34_z24"
PREFIX = f"C0_{CODE}"
BASE_WEIGHTS = "wman_N0576_R34_z24_base20"
BASE_ITERS = 20
TOTAL_ITERS = 30
SHARING = (3, 3, 3)
SYSTEMATIC = 0


def log(msg: str) -> None:
    print(f"[boosted_e2e] {msg}", flush=True)


def phase_base_weights(run_dir: str) -> str:
    """Write the bundled base-20 weights in the reference text format where
    the post-training block loader expects its frozen prefix."""
    from ldpc_error_floor_tpu.codes import TannerGraph, get_code
    from ldpc_error_floor_tpu.io.weight_files import write_weight_file
    from ldpc_error_floor_tpu.models import (WeightSpec, load_params,
                                             params_to_blocks)
    out = os.path.join(run_dir, "Weights",
                       f"{PREFIX}_Opt_Weight_End{BASE_ITERS}.txt")
    if os.path.exists(out):
        return out
    os.makedirs(os.path.dirname(out), exist_ok=True)
    graph = TannerGraph(get_code(CODE))
    spec = WeightSpec(sharing=SHARING, n_iters=BASE_ITERS)
    params = load_params(spec, graph, BASE_WEIGHTS)
    write_weight_file(out, SHARING, params_to_blocks(spec, params))
    log(f"wrote frozen base prefix -> {out}")
    return out


def phase_collect(run_dir: str, snr: float, words: int, batch: int,
                  seed: int, max_frames: int = 30_000_000_000) -> str:
    from ldpc_error_floor_tpu.io.uncor_files import read_uncor_file
    from ldpc_error_floor_tpu.pipelines import ExperimentConfig, run_collection
    uncor = os.path.join(run_dir, "Uncor.txt")
    if os.path.exists(uncor) and read_uncor_file(uncor).shape[0] >= words:
        log(f"collection already done ({uncor})")
        return uncor
    cfg = ExperimentConfig(code=CODE, sharing=SHARING,
                           iters_max=BASE_ITERS, systematic=SYSTEMATIC,
                           snrs=[snr], seed=seed,
                           out_dir=os.path.join(run_dir, "Weights"))
    t0 = time.perf_counter()
    got = run_collection(cfg, target_words=words, batch=batch,
                         out_file=uncor, max_frames=max_frames,
                         ckpt_path=uncor + ".ckpt.json")
    log(f"collected {got.shape[0]} words at {snr} dB "
        f"in {time.perf_counter() - t0:.0f} s")
    return uncor


def phase_split(run_dir: str, uncor: str, n_train: int, n_valid: int,
                n_test: int) -> str:
    from ldpc_error_floor_tpu.pipelines import split_uncor_dataset
    input_dir = os.path.join(run_dir, "Inputs")
    test_file = os.path.join(input_dir, f"[Uncor]_{CODE}_Test.txt")
    if os.path.exists(test_file):
        return input_dir
    split_uncor_dataset(uncor, CODE, input_dir, n_train, n_valid, n_test)
    log(f"split -> {input_dir}")
    return input_dir


def phase_post_train(run_dir: str, epochs: int, batch: int, n_train: int,
                     n_valid: int, n_test: int, lr: float, seed: int,
                     eval_batch: int = 0, scan_unroll: int = 0,
                     eval_loss: int = 1) -> str:
    from ldpc_error_floor_tpu.pipelines import ExperimentConfig, run_training
    out = os.path.join(run_dir, "Weights",
                       f"{PREFIX}_Opt_Weight_End{TOTAL_ITERS}.txt")
    if os.path.exists(out):
        log(f"post training already done ({out})")
        return out
    # main_Post.py configuration, TPU batch size (reference: batch 20,
    # 200 epochs x 500 steps on a 2080 Ti)
    cfg = ExperimentConfig(
        code=CODE, sharing=SHARING, systematic=SYSTEMATIC,
        decoding_type=2, q_bit=5,
        iters_max=TOTAL_ITERS, fixed_iter=BASE_ITERS,
        iter_step=TOTAL_ITERS - BASE_ITERS, fixed_init=0,
        sampling_type=1, loss_type=2, opt_metric=2,
        etha_start=0.0, learn_rate_start=lr,
        batch_size=batch, training_num=n_train, epochs=epochs,
        valid_flag=1, valid_num=n_valid, test_flag=1, test_num=n_test,
        snrs=[0.0], seed=seed,
        out_dir=os.path.join(run_dir, "Weights"),
        input_dir=os.path.join(run_dir, "Inputs"),
        checkpoint_every=10, resume=1, scan_unroll=scan_unroll,
        eval_loss=eval_loss)
    t0 = time.perf_counter()
    res = run_training(cfg, verbose=True, eval_batch=eval_batch or None)
    log(f"post training done in {time.perf_counter() - t0:.0f} s; "
        f"best valid genie-FER(sum) {res.best_metric:.4f}")
    return out


def _make_sim(spec_iters: int, batch: int):
    from ldpc_error_floor_tpu.channel import AWGNChannel
    from ldpc_error_floor_tpu.codes import TannerGraph, get_code
    from ldpc_error_floor_tpu.models import DecoderConfig, NMSDecoder, WeightSpec
    from ldpc_error_floor_tpu.sim import FERSimulator
    code = get_code(CODE)
    graph = TannerGraph(code)
    spec = WeightSpec(sharing=SHARING, n_iters=spec_iters, fixed_iter=0)
    on_tpu = jax.default_backend() == "tpu"
    dcfg = DecoderConfig(decoding_type=2, q_bit=5,
                         backend="pallas" if on_tpu else "xla",
                         pallas_tb=256 if batch % 256 == 0 else 128,
                         pallas_early_stop=on_tpu,
                         target_node=(code.N - code.M) if SYSTEMATIC else 0)
    dec = NMSDecoder(code, dcfg, spec, graph=graph)
    ch = AWGNChannel(code, decoding_type=2, q_bit=5)
    return dec, FERSimulator(dec, ch, batch=batch), spec, graph


def phase_eval(run_dir: str, post_file: str, snrs, target_errors: int,
               max_frames: int, batch: int, seed: int) -> dict:
    from ldpc_error_floor_tpu.io.uncor_files import read_uncor_file
    from ldpc_error_floor_tpu.models import load_params
    results = {"base": [], "boosted": []}

    for tag, iters, weights in (("base", BASE_ITERS, BASE_WEIGHTS),
                                ("boosted", TOTAL_ITERS, post_file)):
        dec, sim, spec, graph = _make_sim(iters, batch)
        params = load_params(spec, graph, weights)
        key = jax.random.PRNGKey(seed + 1)
        for snr in snrs:
            pt = sim.run_point(params, snr, key,
                               max_frames=max_frames,
                               target_frame_errors=target_errors)
            key, _ = jax.random.split(key)
            log(f"{tag:8s} iters={iters} SNR {snr}: FER_genie "
                f"{pt.fer_genie:.3e} ({pt.frames} frames, "
                f"{pt.frames_per_sec:,.0f} fr/s)")
            results[tag].append({"snr": snr, "fer_genie": pt.fer_genie,
                                 "fer_last": pt.fer_last,
                                 "ber_last": pt.ber_last,
                                 "frames": int(pt.frames)})

    # held-out rescue rate: harvested test words the post stage corrects
    test_file = os.path.join(run_dir, "Inputs", f"[Uncor]_{CODE}_Test.txt")
    rows = read_uncor_file(test_file)
    dec, _, spec, graph = _make_sim(TOTAL_ITERS, batch)
    params = load_params(spec, graph, post_file)
    tb = dec.cfg.pallas_tb if dec.cfg.backend == "pallas" else 1
    n = (rows.shape[0] // tb) * tb
    rescued = 0
    for lo in range(0, n, 4096):
        chunk = rows[lo:lo + 4096]
        if chunk.shape[0] % tb:
            chunk = chunk[: (chunk.shape[0] // tb) * tb]
        res = dec.decode(params, jnp.asarray(chunk.T), collect="stats")
        rescued += int(np.sum(~np.asarray(res.uncor_mask)))
    results["test_words"] = int(n)
    results["test_rescued"] = int(rescued)
    results["rescue_rate"] = rescued / max(n, 1)
    log(f"post stage rescues {rescued}/{n} held-out base failures "
        f"({results['rescue_rate']:.1%})")
    return results


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--run-dir", default="benchmarks/runs/boosted_wman")
    p.add_argument("--collect-snr", type=float, default=4.2)
    p.add_argument("--words", type=int, default=20000)
    p.add_argument("--collect-batch", type=int, default=131072)
    p.add_argument("--split", type=int, nargs=3, default=[10000, 5000, 5000])
    p.add_argument("--post-epochs", type=int, default=40)
    p.add_argument("--post-batch", type=int, default=500)
    p.add_argument("--post-eval-batch", type=int, default=0,
                   help="validation/test batch during post training "
                        "(0 = use --post-batch); a larger value folds the "
                        "5k-word eval splits into a few device dispatches")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--eval-snrs", type=float, nargs="+",
                   default=[4.0, 4.25, 4.5])
    p.add_argument("--target-errors", type=int, default=40)
    p.add_argument("--max-frames", type=int, default=200_000_000)
    p.add_argument("--eval-batch", type=int, default=131072)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--base-weights", default="wman_N0576_R34_z24_base20",
                   help="bundled weight set (or file) for the frozen base "
                        "stage, e.g. wman_N0576_R34_z24_iter50")
    p.add_argument("--base-iters", type=int, default=20)
    p.add_argument("--total-iters", type=int, default=30)
    p.add_argument("--code", default="wman_N0576_R34_z24")
    p.add_argument("--sharing", type=int, nargs=3, default=[3, 3, 3])
    p.add_argument("--no-eval-loss", action="store_true",
                   help="skip the per-epoch eval loss so evaluation rides "
                        "the Pallas stats kernel (works around remote-"
                        "compiler SIGSEGVs on the eval loss program)")
    p.add_argument("--scan-unroll", type=int, default=0,
                   help="force the training scan unroll factor (1 avoids "
                        "remote-compiler SIGSEGVs on some codes; 0 = auto)")
    p.add_argument("--systematic", action="store_true",
                   help="count errors over info bits only (5G codes: "
                        "excludes the degree-1 parity tail, reference "
                        "main_Base.py:29)")
    args = p.parse_args()

    global BASE_WEIGHTS, BASE_ITERS, TOTAL_ITERS, CODE, PREFIX, SHARING, \
        SYSTEMATIC
    CODE = args.code
    PREFIX = f"C0_{CODE}"
    BASE_WEIGHTS = args.base_weights
    BASE_ITERS = args.base_iters
    TOTAL_ITERS = args.total_iters
    SHARING = tuple(args.sharing)
    SYSTEMATIC = 1 if args.systematic else 0

    from ldpc_error_floor_tpu.utils import enable_compile_cache
    enable_compile_cache()
    os.makedirs(args.run_dir, exist_ok=True)

    phase_base_weights(args.run_dir)
    uncor = phase_collect(args.run_dir, args.collect_snr, args.words,
                          args.collect_batch, args.seed)
    phase_split(args.run_dir, uncor, *args.split)
    post = phase_post_train(args.run_dir, args.post_epochs, args.post_batch,
                            args.split[0], args.split[1], args.split[2],
                            args.lr, args.seed,
                            eval_batch=args.post_eval_batch,
                            scan_unroll=args.scan_unroll,
                            eval_loss=0 if args.no_eval_loss else 1)
    results = phase_eval(args.run_dir, post, args.eval_snrs,
                         args.target_errors, args.max_frames,
                         args.eval_batch, args.seed)
    results["config"] = {k: getattr(args, k) for k in vars(args)}
    out = os.path.join(args.run_dir, "RESULTS.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    log(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
