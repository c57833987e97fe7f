"""Command-line interface.

The reference has no CLI — experiments are run by hand-editing module
constants in `main_Base.py`/`main_Post.py`.  Here every phase of the
boosting pipeline is a subcommand over a JSON config:

    python -m ldpc_error_floor_tpu.cli codes
    python -m ldpc_error_floor_tpu.cli train --config base.json
    python -m ldpc_error_floor_tpu.cli collect --config collect.json --words 20000
    python -m ldpc_error_floor_tpu.cli split-uncor --uncor Uncor.txt --code wman_N0576_R34_z24 \
        --train 10000 --valid 5000 --test 5000
    python -m ldpc_error_floor_tpu.cli simulate --code wman_N0576_R34_z24 \
        --weights wman_N0576_R34_z24_base20 --sharing 3 3 3 --iters 20 \
        --snrs 3.0 3.5 4.0 --target-errors 100
    python -m ldpc_error_floor_tpu.cli init-config --out base.json
"""

from __future__ import annotations

import argparse
import json
import sys


def _cmd_codes(args) -> int:
    from ldpc_error_floor_tpu.codes import available_codes, get_code
    for name in available_codes():
        c = get_code(name)
        print(f"{name}: M={c.M} N={c.N} z={c.z} E={c.n_edges} "
              f"n={c.n} k={c.k} R={c.rate:.3f}")
    return 0


def _cmd_weights(args) -> int:
    from ldpc_error_floor_tpu.io.weight_files import (available_weight_sets,
                                                      read_weight_json)
    for name in available_weight_sets():
        sharing, blocks = read_weight_json(name)
        rows = next(len(v) for v in blocks.values() if v is not None)
        print(f"{name}: sharing {sharing}, {rows} iterations")
    return 0


def _cmd_convert_weights(args) -> int:
    """Convert between the reference text format and the JSON format (both
    directions, by file extension)."""
    from ldpc_error_floor_tpu.io.weight_files import (read_weight_file,
                                                      read_weight_json,
                                                      write_weight_file,
                                                      write_weight_json)
    if args.src.endswith(".json"):
        sharing, blocks = read_weight_json(args.src)
    else:
        sharing, blocks = read_weight_file(args.src)
    if args.out.endswith(".json"):
        write_weight_json(args.out, sharing, blocks)
    else:
        write_weight_file(args.out, sharing, blocks)
    print(f"converted {args.src} -> {args.out} (sharing {sharing})")
    return 0


def _cmd_init_config(args) -> int:
    from ldpc_error_floor_tpu.pipelines import base_config_wman, post_config_wman
    cfg = post_config_wman() if args.post else base_config_wman()
    cfg.to_json(args.out)
    print(f"wrote {args.out}")
    return 0


def _cmd_train(args) -> int:
    from ldpc_error_floor_tpu.parallel import data_mesh
    from ldpc_error_floor_tpu.pipelines import ExperimentConfig, run_training
    cfg = ExperimentConfig.from_json(args.config)
    mesh = data_mesh(args.mesh_devices) if args.mesh else None
    res = run_training(cfg, eval_batch=args.eval_batch, mesh=mesh)
    print(f"done; best metric {res.best_metric:.3e}")
    return 0


def _cmd_evaluate(args) -> int:
    """Evaluate a weight file on fresh noise or the harvested valid/test
    datasets — the reference's only evaluation path is epoch 0 of a
    training run (`main_Base.py:150`, SURVEY.md section 3.4)."""
    import jax
    import numpy as np

    from ldpc_error_floor_tpu.channel import AWGNChannel
    from ldpc_error_floor_tpu.codes import TannerGraph, get_code
    from ldpc_error_floor_tpu.io.uncor_files import read_uncor_file
    from ldpc_error_floor_tpu.models import (DecoderConfig, NMSDecoder,
                                             WeightSpec, load_params)
    from ldpc_error_floor_tpu.pipelines import ExperimentConfig
    from ldpc_error_floor_tpu.pipelines.evaluate import Evaluator

    cfg = ExperimentConfig.from_json(args.config).validate()
    code = get_code(cfg.code, z=cfg.z, punct=cfg.punct, short=cfg.short)
    graph = TannerGraph(code)
    spec = WeightSpec(sharing=cfg.sharing, n_iters=cfg.iters_max,
                      fixed_iter=cfg.fixed_iter)
    weights = args.weights or (
        f"{cfg.out_dir}/{cfg.out_prefix}_Opt_Weight_End{cfg.iters_max}.txt")
    params = load_params(spec, graph, weights)
    target = (code.N - code.M) if cfg.systematic else 0
    dec = NMSDecoder(code, DecoderConfig(decoding_type=cfg.decoding_type,
                                         q_bit=cfg.q_bit,
                                         clip_llr=cfg.clip_llr,
                                         target_node=target),
                     spec, graph=graph)
    channel = AWGNChannel(code, decoding_type=cfg.decoding_type,
                          q_bit=cfg.q_bit, clip_llr=cfg.clip_llr)
    key = jax.random.PRNGKey(cfg.seed)
    if cfg.sampling_type == 1:  # harvested datasets
        base = f"{cfg.input_dir}/[Uncor]_{cfg.code}"
        splits = [("valid", base + "_Valid.txt", cfg.valid_num),
                  ("test", base + "_Test.txt", cfg.test_num)]
        for name, path, num in splits:
            data = read_uncor_file(path, max_rows=num)
            rows = min(num, data.shape[0])
            # clamp to the split size (a split smaller than --batch must
            # still evaluate) and report any dropped trailing remainder
            eb = min(args.batch, rows)
            used = (rows // eb) * eb
            if used < rows:
                print(f"# {name}: evaluating {used}/{rows} rows "
                      f"({rows - used} trailing rows don't fill a batch "
                      f"of {eb})", flush=True)
            ev = Evaluator(dec, channel, cfg.loss_type, batch=eb)
            res, dt = ev.run(params, [0.0], used, cfg.etha_start, data=data)
            print(json.dumps({"split": name, "ber_last": res[0, 0],
                              "fer_last": res[1, 0], "fer": res[2, 0],
                              "loss": res[3, 0], "seconds": dt,
                              "rows_used": used}))
    else:
        ev = Evaluator(dec, channel, cfg.loss_type, batch=args.batch)
        sigmas = code.snr_sigmas(cfg.snrs)
        res, dt = ev.run(params, sigmas, args.frames, cfg.etha_start,
                         key=key)
        for i, snr in enumerate(cfg.snrs):
            print(json.dumps({"snr": snr, "ber_last": res[0, i],
                              "fer_last": res[1, i], "fer": res[2, i],
                              "loss": res[3, i]}))
    return 0


def _cmd_analyze_uncor(args) -> int:
    """Trapping-set classification of a harvested Uncor dataset: decode it
    with the given weights and report (a, b) failure classes + hot
    variable nodes (sim/analysis.py)."""
    from ldpc_error_floor_tpu.codes import TannerGraph, get_code
    from ldpc_error_floor_tpu.io.uncor_files import read_uncor_file
    from ldpc_error_floor_tpu.models import (DecoderConfig, NMSDecoder,
                                             WeightSpec, load_params)
    from ldpc_error_floor_tpu.sim import classify_failures

    code = get_code(args.code)
    graph = TannerGraph(code)
    spec = WeightSpec(sharing=tuple(args.sharing), n_iters=args.iters)
    dec = NMSDecoder(code, DecoderConfig(decoding_type=args.decoding_type,
                                         q_bit=args.q_bit), spec, graph=graph)
    params = load_params(spec, graph, args.weights)
    rows = read_uncor_file(args.uncor, max_rows=args.max_rows or None)
    rep = classify_failures(dec, params, rows, batch=args.batch)
    print(rep.summary(args.top))
    return 0


def _cmd_collect(args) -> int:
    from ldpc_error_floor_tpu.pipelines import ExperimentConfig, run_collection
    cfg = ExperimentConfig.from_json(args.config)
    words = run_collection(cfg, weight_file=args.weights,
                           target_words=args.words, batch=args.batch,
                           out_file=args.out, ckpt_path=args.ckpt)
    print(f"collected {words.shape[0]} uncorrected words -> {args.out}")
    return 0


def _cmd_split_uncor(args) -> int:
    from ldpc_error_floor_tpu.pipelines import split_uncor_dataset
    split_uncor_dataset(args.uncor, args.code, args.input_dir,
                        args.train, args.valid, args.test)
    print(f"split {args.uncor} into {args.input_dir}/[Uncor]_{args.code}*")
    return 0


def _cmd_simulate(args) -> int:
    import jax

    from ldpc_error_floor_tpu.channel import AWGNChannel
    from ldpc_error_floor_tpu.codes import TannerGraph, get_code
    from ldpc_error_floor_tpu.models import (DecoderConfig, NMSDecoder,
                                             WeightSpec, init_weights,
                                             load_params)
    from ldpc_error_floor_tpu.parallel import data_mesh
    from ldpc_error_floor_tpu.sim import FERSimulator

    code = get_code(args.code)
    graph = TannerGraph(code)
    spec = WeightSpec(sharing=tuple(args.sharing), n_iters=args.iters,
                      fixed_iter=args.fixed_iter)
    backend = args.backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    # kernel tiles must divide the PER-DEVICE batch under a mesh; auto_tb
    # sizes the tile from the modeled scoped-VMEM footprint (kernel_vmem_bytes)
    from ldpc_error_floor_tpu.ops.pallas_decoder import auto_tb
    local = args.batch // jax.device_count() if args.mesh else args.batch
    target = (code.N - code.M) if args.systematic else 0
    # --stop syndrome builds the deploy-mode kernel, whose footprint adds
    # an [N, zp, TB] APP scratch — size the tile for the kernel actually
    # compiled, or a code near the VMEM knee dies at compile instead of
    # falling back a tile size
    tb_mode = "deploy" if args.stop == "syndrome" else "stats"
    tb = auto_tb(graph, local, mode=tb_mode, ucn=spec.ucn_enabled,
                 target=target, n_iters=args.iters)
    if tb is None:
        backend, tb = "xla", 128
    dec = NMSDecoder(code, DecoderConfig(decoding_type=args.decoding_type,
                                         q_bit=args.q_bit, backend=backend,
                                         pallas_tb=tb,
                                         pallas_early_stop=args.early_stop,
                                         neural_mode=args.neural_mode,
                                         target_node=target),
                     spec, graph=graph)
    if args.weights:
        params = load_params(spec, graph, args.weights)
    else:
        params = init_weights(spec, graph)
    if args.base_weights:
        # boosted composition: overwrite iterations [0, boundary) with the
        # base stage's rows (reference main_Post frozen-prefix load,
        # Main_Functions.py:390-391,419-422)
        from ldpc_error_floor_tpu.models import compose_boosted_params
        boundary = args.boundary or args.fixed_iter
        if not 0 < boundary <= args.iters:
            raise SystemExit("--base-weights needs --boundary (or "
                             "--fixed-iter) in (0, iters]")
        base_spec = WeightSpec(
            sharing=tuple(args.base_sharing or args.sharing),
            n_iters=boundary)
        base_params = load_params(base_spec, graph, args.base_weights)
        params = compose_boosted_params(graph, base_spec, base_params,
                                        spec, params)
    ch = AWGNChannel(code, decoding_type=args.decoding_type, q_bit=args.q_bit)
    mesh = data_mesh() if args.mesh else None
    sim = FERSimulator(dec, ch, batch=args.batch, mesh=mesh,
                       inner_steps=args.inner_steps, stop=args.stop,
                       codewords=args.codewords)
    key = jax.random.PRNGKey(args.seed)
    points = sim.run_curve(params, args.snrs, key,
                           max_frames=args.max_frames,
                           target_frame_errors=args.target_errors,
                           ckpt_prefix=args.ckpt)
    for pt in points:
        print(json.dumps(vars(pt)))
    return 0


def _init_distributed(args) -> None:
    """Multi-host wiring: `jax.distributed.initialize` from CLI flags or the
    LDPC_TPU_COORDINATOR / LDPC_TPU_NUM_PROCESSES / LDPC_TPU_PROCESS_ID
    environment (SURVEY.md section 5.8).  No-op single-host."""
    import os

    from ldpc_error_floor_tpu.parallel import initialize_distributed
    coord = args.coordinator or os.environ.get("LDPC_TPU_COORDINATOR")
    if not coord:
        return
    nprocs = args.num_processes
    if nprocs is None and os.environ.get("LDPC_TPU_NUM_PROCESSES"):
        nprocs = int(os.environ["LDPC_TPU_NUM_PROCESSES"])
    pid = args.process_id
    if pid is None and os.environ.get("LDPC_TPU_PROCESS_ID"):
        pid = int(os.environ["LDPC_TPU_PROCESS_ID"])
    initialize_distributed(coordinator_address=coord, num_processes=nprocs,
                           process_id=pid)


def main(argv=None) -> int:
    from ldpc_error_floor_tpu.utils import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser(prog="ldpc_error_floor_tpu")
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator address host:port "
                        "(or env LDPC_TPU_COORDINATOR)")
    p.add_argument("--num-processes", type=int, default=None,
                   dest="num_processes")
    p.add_argument("--process-id", type=int, default=None, dest="process_id")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("codes", help="list bundled codes")
    sub.add_parser("weights", help="list bundled trained weight sets")

    pw = sub.add_parser("convert-weights",
                        help="convert weight files text<->json by extension")
    pw.add_argument("--src", required=True)
    pw.add_argument("--out", required=True)

    pc = sub.add_parser("init-config", help="write a template config")
    pc.add_argument("--out", default="config.json")
    pc.add_argument("--post", action="store_true",
                    help="post-decoder template (UCN, uncor data)")

    pt = sub.add_parser("train", help="train a decoder (base or post)")
    pt.add_argument("--config", required=True)
    pt.add_argument("--eval-batch", type=int, default=None)
    pt.add_argument("--mesh", action="store_true",
                    help="data-parallel training: shard each batch over all "
                         "devices (params replicated, grads psum'd over ICI)")
    pt.add_argument("--mesh-devices", type=int, default=None,
                    dest="mesh_devices",
                    help="use only the first N devices of the mesh")

    pe = sub.add_parser("evaluate",
                        help="evaluate weights on fresh noise or the "
                             "harvested valid/test datasets (4 metric rows)")
    pe.add_argument("--config", required=True)
    pe.add_argument("--weights", default=None,
                    help="weight file / bundled set (default: the config's "
                         "Opt_Weight_End{iters_max}.txt)")
    pe.add_argument("--batch", type=int, default=1000)
    pe.add_argument("--frames", type=int, default=10000,
                    help="frames per SNR for fresh-noise evaluation")

    pa = sub.add_parser("analyze-uncor",
                        help="trapping-set (a,b) classification of a "
                             "harvested Uncor dataset")
    pa.add_argument("--uncor", required=True)
    pa.add_argument("--code", required=True)
    pa.add_argument("--weights", required=True)
    pa.add_argument("--sharing", type=int, nargs=3, default=[3, 3, 3])
    pa.add_argument("--iters", type=int, default=20)
    pa.add_argument("--decoding-type", type=int, default=2,
                    dest="decoding_type")
    pa.add_argument("--q-bit", type=int, default=5, dest="q_bit")
    pa.add_argument("--batch", type=int, default=1024)
    pa.add_argument("--max-rows", type=int, default=0, dest="max_rows")
    pa.add_argument("--top", type=int, default=10)

    pl = sub.add_parser("collect", help="harvest uncorrected words")
    pl.add_argument("--config", required=True)
    pl.add_argument("--weights", default=None)
    pl.add_argument("--words", type=int, default=20000)
    pl.add_argument("--batch", type=int, default=4096)
    pl.add_argument("--out", default="Uncor.txt")
    pl.add_argument("--ckpt", default=None,
                    help="JSON resume checkpoint: a killed harvest restarts "
                         "from its last counters + RNG position")

    ps = sub.add_parser("split-uncor", help="split Uncor.txt into datasets")
    ps.add_argument("--uncor", required=True)
    ps.add_argument("--code", required=True)
    ps.add_argument("--input-dir", default="./Inputs")
    ps.add_argument("--train", type=int, required=True)
    ps.add_argument("--valid", type=int, required=True)
    ps.add_argument("--test", type=int, required=True)

    pm = sub.add_parser("simulate", help="Monte-Carlo FER curve")
    pm.add_argument("--code", required=True)
    pm.add_argument("--weights", default=None,
                    help="weight file / bundled set (default: all-ones)")
    pm.add_argument("--sharing", type=int, nargs=3, default=[3, 3, 3])
    pm.add_argument("--base-weights", default=None, dest="base_weights",
                    help="boosted composition: base-stage weight set for "
                         "iterations [0, boundary)")
    pm.add_argument("--base-sharing", type=int, nargs=3, default=None,
                    dest="base_sharing")
    pm.add_argument("--boundary", type=int, default=0,
                    help="base/post boundary iteration (default: --fixed-iter)")
    pm.add_argument("--iters", type=int, default=20)
    pm.add_argument("--fixed-iter", type=int, default=0, dest="fixed_iter")
    pm.add_argument("--decoding-type", type=int, default=2, dest="decoding_type")
    pm.add_argument("--neural-mode", choices=["scale", "offset"],
                    default="scale", dest="neural_mode",
                    help="scale: multiplicative NMS weights (reference); "
                         "offset: trainable offset min-sum (OMS)")
    pm.add_argument("--q-bit", type=int, default=5, dest="q_bit")
    pm.add_argument("--snrs", type=float, nargs="+", required=True)
    pm.add_argument("--batch", type=int, default=4096)
    pm.add_argument("--max-frames", type=int, default=10_000_000,
                    dest="max_frames")
    pm.add_argument("--target-errors", type=int, default=100,
                    dest="target_errors")
    pm.add_argument("--seed", type=int, default=0)
    pm.add_argument("--inner-steps", type=int, default=1, dest="inner_steps",
                    help="on-device batches per host sync (hides host/tunnel "
                         "round-trip latency in deep error-floor sweeps)")
    pm.add_argument("--mesh", action="store_true",
                    help="shard the batch over all devices")
    pm.add_argument("--backend", choices=["auto", "xla", "pallas"],
                    default="auto",
                    help="decoder backend (auto: fused Pallas kernel on TPU)")
    pm.add_argument("--codewords", choices=["zero", "random"], default="zero",
                    help="random: encode fresh random messages per batch "
                         "(GF(2) encoder) instead of the all-zero word")
    pm.add_argument("--stop", choices=["genie", "syndrome"], default="genie",
                    help="genie: reference metric semantics (fixed iters); "
                         "syndrome: deployable per-frame early termination "
                         "(reports FER at stop, undetected-error rate, "
                         "average iterations)")
    pm.add_argument("--early-stop", action="store_true", dest="early_stop",
                    help="genie-exact early termination (Pallas backend)")
    pm.add_argument("--ckpt", default=None,
                    help="resume-checkpoint prefix: per-SNR JSON files "
                         "{ckpt}_snr{s}.json (deep error-floor sweeps "
                         "survive preemption)")
    pm.add_argument("--systematic", action="store_true",
                    help="count errors over info (systematic) bits only — "
                         "excludes e.g. the degree-1 parity tail of 5G codes "
                         "(reference `systematic` option, main_Base.py:29)")

    args = p.parse_args(argv)
    _init_distributed(args)
    return {"codes": _cmd_codes, "weights": _cmd_weights,
            "convert-weights": _cmd_convert_weights,
            "init-config": _cmd_init_config,
            "train": _cmd_train, "collect": _cmd_collect,
            "evaluate": _cmd_evaluate, "analyze-uncor": _cmd_analyze_uncor,
            "split-uncor": _cmd_split_uncor,
            "simulate": _cmd_simulate}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
