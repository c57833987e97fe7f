"""Training driver: the reference's `main_Base.py` / `main_Post.py` epoch and
block loops as a reusable function.

Capabilities (SURVEY.md C11/C12/C15/C16):
* block-wise Delta1/Delta2 schedule with frozen-prefix weight loading from the
  previous block's best (`*_Opt_Weight_End{start}.txt`);
* per-epoch: train steps (epoch 0 = evaluation of the initialization only),
  weight-file dump, best-on-valid snapshot by the configured metric, perf
  log, eta / learning-rate step decay;
* data sources: fresh AWGN SNR-mix batches (sampling_type 0) or harvested
  uncorrected-word datasets (sampling_type 1, `main_Post.py` path);
* optional test-set evaluation for the post-decoder flow.

Differences from the reference (deliberate):
* channel sampling runs on-device inside jit, not host NumPy;
* the decode graph is a scan, so block changes don't rebuild Python graphs —
  only the (cached) XLA program for the new depth;
* `init_from_file` transfer learning reads weight rows aligned per
  iteration (the reference's sequential row counter misaligns rows when
  combined with a frozen prefix — `Main_Functions.py:418-426`).
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass, field, replace as dataclasses_replace
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ldpc_error_floor_tpu.channel.awgn import AWGNChannel, mix_sigma_lanes
from ldpc_error_floor_tpu.codes import Code, TannerGraph, get_code
from ldpc_error_floor_tpu.io.perflog import PerfLog
from ldpc_error_floor_tpu.io.uncor_files import read_uncor_file
from ldpc_error_floor_tpu.io.weight_files import (read_weight_file,
                                                  write_weight_file)
from ldpc_error_floor_tpu.models import (DecoderConfig, NMSDecoder, WeightSpec,
                                         init_weights, load_params,
                                         params_from_blocks, params_to_blocks,
                                         partial_update_from_blocks)
from ldpc_error_floor_tpu.pipelines.config import (ExperimentConfig,
                                                   SAMPLING_AWGN,
                                                   SAMPLING_COLLECT,
                                                   SAMPLING_READ_UNCOR)
from ldpc_error_floor_tpu.pipelines.evaluate import Evaluator
from ldpc_error_floor_tpu.training.schedule import training_blocks
from ldpc_error_floor_tpu.training.train import (make_epoch_step,
                                                 make_optimizer,
                                                 set_learning_rate)


@dataclass
class TrainResult:
    params: dict
    spec: WeightSpec
    best_metric: float
    history: List[dict] = field(default_factory=list)


def _load_code(cfg: ExperimentConfig) -> Code:
    return get_code(cfg.code, z=cfg.z, punct=cfg.punct, short=cfg.short)


def _load_uncor_data(cfg: ExperimentConfig):
    """process_data parity (`Main_Functions.py:526-576`)."""
    base = os.path.join(cfg.input_dir, f"[Uncor]_{cfg.code}")
    train = read_uncor_file(base + ".txt", max_rows=cfg.training_num)
    valid = (read_uncor_file(base + "_Valid.txt", max_rows=cfg.valid_num)
             if cfg.valid_flag else None)
    test = (read_uncor_file(base + "_Test.txt", max_rows=cfg.test_num)
            if cfg.test_flag else None)
    return train, valid, test


def _opt_metric_value(results: np.ndarray, opt_metric: int) -> float:
    """Sum over SNRs of the selected metric row (`compute_opt_value`,
    `Print_Functions.py:167-181`)."""
    return float(results[opt_metric].sum())


def run_training(cfg: ExperimentConfig, verbose: bool = True,
                 eval_batch: Optional[int] = None,
                 mesh=None) -> TrainResult:
    """With `mesh` (a 1-D ``('data',)`` `jax.sharding.Mesh`), every train and
    eval batch is sharded over the mesh's data axis (params replicated,
    gradients/counters reduced over ICI by GSPMD).  The reference's analog
    is a single-GPU pin (`main_Base.py:14-15`); here the same pipeline
    scales to a pod slice unchanged."""
    cfg = cfg.validate()
    code = _load_code(cfg)
    if mesh is not None and cfg.batch_size % mesh.shape["data"] != 0:
        raise ValueError(f"batch_size {cfg.batch_size} not divisible by "
                         f"mesh data axis ({mesh.shape['data']} devices)")
    graph = TannerGraph(code)
    target_node = (code.N - code.M) if cfg.systematic else 0
    os.makedirs(cfg.out_dir, exist_ok=True)
    prefix = os.path.join(cfg.out_dir, cfg.out_prefix)
    log = PerfLog(prefix + "_Performance.txt", echo=verbose)
    log.header(cfg)

    channel = AWGNChannel(code, decoding_type=cfg.decoding_type,
                          q_bit=cfg.q_bit, clip_llr=cfg.clip_llr)
    snr_sigmas = code.snr_sigmas(cfg.snrs)
    train_sigmas = jnp.asarray(mix_sigma_lanes(snr_sigmas, cfg.batch_size))

    data_train = data_valid = data_test = None
    if cfg.sampling_type == SAMPLING_READ_UNCOR:
        data_train, data_valid, data_test = _load_uncor_data(cfg)

    key = jax.random.PRNGKey(cfg.seed)
    result: Optional[TrainResult] = None

    for start, end in training_blocks(cfg.iters_max, cfg.fixed_iter,
                                      cfg.iter_step):
        spec = WeightSpec(sharing=cfg.sharing, n_iters=end,
                          fixed_iter=cfg.fixed_iter,
                          min_w=cfg.min_weight, max_w=cfg.max_weight)
        key, sub = jax.random.split(key)
        params = init_weights(spec, graph, cfg.init_weight, cfg.init_vn_weight,
                              key=sub)
        if cfg.init_from_file:
            in_file = f"{prefix}_In_Weight_End{cfg.iters_max}.txt"
            sharing_f, blocks = read_weight_file(in_file)
            if tuple(sharing_f) != tuple(cfg.sharing):
                raise ValueError(f"{in_file}: sharing mismatch")
            params = params_from_blocks(spec, blocks, graph)
        if start > 0:
            frozen_file = f"{prefix}_Opt_Weight_End{start}.txt"
            _, blocks = read_weight_file(frozen_file)
            params = partial_update_from_blocks(spec, params, blocks, start,
                                                graph)

        # Training-decoder compilation policy (benchmarks/train_throughput.py,
        # re-measured on v5e at batches 2048/4096/8192): full scan unroll +
        # no remat wins at EVERY batch size (160k vs 66-75k trained cw/s at
        # 2048; 125k vs 45-57k at 4096; 80k vs 35-44k at 8192, no OOM), and
        # remat-off also avoids a TPU compiler SIGSEGV on remat'd scan
        # bodies with tiny lane dims (batch 20 + remat crashes
        # tpu_compile_helper).  Remat only pays past ~16k lanes where the
        # unrolled activation footprint outgrows HBM headroom.
        big = cfg.batch_size >= 16384
        unroll = cfg.scan_unroll or (1 if big else end)
        dcfg = DecoderConfig(decoding_type=cfg.decoding_type, q_bit=cfg.q_bit,
                             clip_llr=cfg.clip_llr, target_node=target_node,
                             neural_mode=cfg.neural_mode, remat=big,
                             unroll=unroll)
        # fused differentiable Pallas path (ops/pallas_train.py): on TPU,
        # when the per-device batch fills kernel tiles, train through the
        # custom-VJP kernel — gradients match the scan backend
        # (tests/test_pallas_train.py), throughput is several x; round 5
        # added the SP (tanh/atanh) backward, so every decoding type rides
        # the kernel like the reference's one uniform path
        # (Main_Functions.py:238-245).  auto_tb
        # sizes the tile from the modeled scoped-VMEM footprint of the
        # train kernel pair (ops/pallas_decoder.kernel_vmem_bytes) — in
        # round 4 the in-place kernels fit every bundled code incl. the
        # z=64/z=72 5G ones.
        from ldpc_error_floor_tpu.ops.pallas_decoder import auto_tb
        dcfg_scan = dcfg
        local_bs = cfg.batch_size // (mesh.shape["data"] if mesh else 1)
        tb_train = auto_tb(graph, local_bs, mode="train",
                           ucn=spec.ucn_enabled, target=target_node or 0,
                           n_iters=end)
        # SP at tb 256 crashes the v5e compile helper (measured round 5:
        # tpu_compile_helper exit 1 on the tanh/log-heavy pair; tb 128
        # compiles and runs at 762k trained cw/s) — cap the tile.  A
        # residual compile failure still degrades to scan at runtime.
        if cfg.decoding_type == 0 and tb_train is not None:
            tb_train = min(tb_train, 128)
            if local_bs % (tb_train * max(1, (-(-code.z // 8) * 8)
                                          // max(code.z, 1))) != 0:
                tb_train = None
        if (jax.default_backend() == "tpu"
                and not cfg.scan_unroll and tb_train is not None):
            # static eta == 0 (the recipe default): the fused kernel emits
            # only the last iteration's APPs — the skipped iterations'
            # cotangents are structurally zero, so gradients are identical
            # while the APP-stack HBM traffic drops by T x
            app_t0 = (end - 1) if cfg.etha_start == 0.0 else 0
            dcfg = dataclasses_replace(dcfg, backend="pallas",
                                       pallas_tb=tb_train,
                                       pallas_app_t0=app_t0)
        decoder = NMSDecoder(code, dcfg, spec, graph=graph)
        optimizer = make_optimizer(cfg.learn_rate_start)
        opt_state = optimizer.init(params)
        t_lo = max(start - cfg.fixed_init, cfg.fixed_iter)
        eb = eval_batch or cfg.batch_size
        need_loss = bool(cfg.eval_loss) or cfg.opt_metric == 3
        # eval batches may not fill kernel tiles, so the evaluator gets its
        # own decoder: scan config by default, fused stats kernel when the
        # batch allows and no loss is needed
        eval_decoder = NMSDecoder(code, dcfg_scan, spec, graph=graph)
        tb_eval = auto_tb(graph, eb, mode="stats", ucn=spec.ucn_enabled,
                          target=target_node or 0, n_iters=end)
        if (not need_loss and jax.default_backend() == "tpu"
                and tb_eval is not None):
            # stats-only eval rides the fused Pallas kernel (tile sized by
            # the same VMEM model; Evaluator.run still auto-falls-back to
            # per-batch dispatch if the surrounding sweep fails to compile)
            eval_decoder = NMSDecoder(
                code, dataclasses_replace(dcfg_scan, backend="pallas",
                                          pallas_tb=tb_eval),
                spec, graph=graph)
        evaluator = Evaluator(eval_decoder, channel, cfg.loss_type, t_lo=t_lo,
                              batch=eb, compute_loss=need_loss, mesh=mesh)
        nbits = decoder.target * code.z
        labels = jnp.zeros((nbits, cfg.batch_size), jnp.float32)
        n_train_batches = cfg.training_num // cfg.batch_size
        # whole-epoch on-device runner: one dispatch per epoch instead of
        # one per batch (the reference's per-batch sess.run, main_Base:151)
        data_mode = cfg.sampling_type == SAMPLING_READ_UNCOR
        encoder = None
        if not cfg.train_on_zero_word:
            from ldpc_error_floor_tpu.codes.encoder import Encoder
            encoder = Encoder(graph)
        # eta identically zero (the reference recipe default,
        # main_Base.py:49 etha=0): the loss takes its exact
        # last-iteration-only fast path at compile time (losses.py) —
        # 0 * discount stays 0, so the per-epoch decay never changes it
        static_etha = 0.0 if cfg.etha_start == 0.0 else None

        def build_epoch_step(dec):
            return make_epoch_step(
                dec, spec, cfg.loss_type, start, end, cfg.fixed_init,
                optimizer, n_steps=n_train_batches, labels=labels,
                channel=channel, sigmas=train_sigmas, data_mode=data_mode,
                mesh=mesh, encoder=encoder, static_etha=static_etha)

        epoch_step = build_epoch_step(decoder)
        fused_train = dcfg.backend == "pallas"

        def run_epoch_step(*args):
            """First dispatch per block may hit a fused-train compile
            failure the VMEM model didn't predict (the model is calibrated
            to one Mosaic version; a toolchain bump can shift the real
            footprint).  Mirror the Evaluator's degrade path
            (pipelines/evaluate.py:178-194): log the full traceback, rebuild
            the decoder on the scan backend, and continue — gradients match
            between the backends (tests/test_pallas_train.py), so only
            throughput is lost, not the run."""
            nonlocal epoch_step, decoder, fused_train
            try:
                return epoch_step(*args)
            except (ValueError, TypeError):
                raise            # argument/shape errors are user-caused
            except Exception as e:
                if not fused_train:
                    raise
                import traceback
                import warnings
                warnings.warn("fused train step failed "
                              f"({type(e).__name__}: "
                              f"{str(e).splitlines()[0][:120]}); falling "
                              "back to the scan backend. Full traceback:\n"
                              f"{traceback.format_exc()}")
                fused_train = False
                decoder = NMSDecoder(code, dcfg_scan, spec, graph=graph)
                epoch_step = build_epoch_step(decoder)
                return epoch_step(*args)
        if mesh is not None:
            from ldpc_error_floor_tpu.parallel.mesh import replicate
            params = replicate(mesh, params)
            opt_state = replicate(mesh, opt_state)
        data_train_dev = None
        if data_mode:
            data_train_dev = jnp.asarray(
                data_train[:n_train_batches * cfg.batch_size], jnp.float32)

        etha_curr = cfg.etha_start
        lr_curr = cfg.learn_rate_start
        opt_valid = opt_test = 1e5
        best_metric = 1e5
        history: List[dict] = []

        # full-state checkpoint/resume (beyond the reference's weight dumps)
        first_epoch = 0
        ckpt_dir = None
        if cfg.checkpoint_every or cfg.resume:
            from ldpc_error_floor_tpu.training.checkpoint import (
                block_ckpt_dir, restore_train_state, save_train_state)
            ckpt_dir = block_ckpt_dir(cfg.out_dir, cfg.out_prefix, start, end)
        if cfg.resume and ckpt_dir is not None:
            restored = restore_train_state(ckpt_dir, params, opt_state)
            if restored is not None:
                epoch_r, params, opt_state, key, extra = restored
                first_epoch = epoch_r + 1
                etha_curr = float(extra.get("etha", etha_curr))
                lr_curr = float(extra.get("lr", lr_curr))
                opt_valid = float(extra.get("opt_valid", opt_valid))
                best_metric = opt_valid
                if verbose:
                    print(f"resumed block [{start},{end}) at epoch {first_epoch}")

        for epoch in range(first_epoch, cfg.epochs + 1):
            t0 = time.perf_counter()
            avg_loss = 0.0
            if (epoch > 0 and cfg.sampling_type != SAMPLING_COLLECT
                    and n_train_batches > 0):
                set_learning_rate(opt_state, lr_curr)
                if data_mode:
                    params, opt_state, loss = run_epoch_step(
                        params, opt_state, data_train_dev,
                        jnp.float32(etha_curr))
                else:
                    key, sub = jax.random.split(key)
                    params, opt_state, loss = run_epoch_step(
                        params, opt_state, sub, jnp.float32(etha_curr))
                avg_loss = float(loss)
            t_train = time.perf_counter() - t0

            # dump weights + train log
            write_weight_file(f"{prefix}_Weight_End{end}.txt", cfg.sharing,
                              params_to_blocks(spec, params))
            log.train_result(epoch, cfg.epochs, start, end, avg_loss)

            # validation (in collect mode this is also the harvesting pass,
            # reference `Print_Functions.py:147-156`; the dedicated
            # `pipelines.collect.run_collection` is the faster path)
            t_valid = t_test = 0.0
            uncor_path = (os.path.join(cfg.out_dir, "Uncor.txt")
                          if cfg.sampling_type == SAMPLING_COLLECT else None)
            if cfg.valid_flag:
                key, sub = jax.random.split(key)
                results, t_valid = evaluator.run(
                    params, snr_sigmas, cfg.valid_num, etha_curr, key=sub,
                    data=data_valid, collect_uncor_path=uncor_path)
                metric = _opt_metric_value(results, cfg.opt_metric)
                improved = metric < opt_valid
                if improved:
                    opt_valid = metric
                    shutil.copyfile(f"{prefix}_Weight_End{end}.txt",
                                    f"{prefix}_Opt_Weight_End{end}.txt")
                best_metric = opt_valid
                log.eval_result("Valid", results, opt_valid)
                history.append({"epoch": epoch, "block": (start, end),
                                "train_loss": avg_loss,
                                "valid": results.tolist(),
                                "metric": metric, "improved": improved})

            if (cfg.sampling_type == SAMPLING_READ_UNCOR and cfg.test_flag
                    and data_test is not None):
                key, sub = jax.random.split(key)
                results_t, t_test = evaluator.run(
                    params, snr_sigmas, cfg.test_num, etha_curr, key=sub,
                    data=data_test)
                opt_test = min(opt_test,
                               _opt_metric_value(results_t, cfg.opt_metric))
                log.eval_result("Test", results_t, opt_test)

            log.timing(t_train, t_valid, t_test)

            # step decays (main_Base.py:191-195)
            if cfg.etha_discount and cfg.etha_discount_step and \
                    (epoch + 1) % cfg.etha_discount_step == 0:
                etha_curr *= cfg.etha_discount
            if cfg.learn_rate_discount and cfg.learn_rate_step and \
                    (epoch + 1) % cfg.learn_rate_step == 0:
                lr_curr *= cfg.learn_rate_discount

            if (cfg.checkpoint_every and ckpt_dir is not None
                    and epoch % cfg.checkpoint_every == 0):
                save_train_state(ckpt_dir, epoch, params, opt_state, key,
                                 extra={"etha": etha_curr, "lr": lr_curr,
                                        "opt_valid": opt_valid})

        # ensure an Opt file exists even without validation
        if not cfg.valid_flag:
            shutil.copyfile(f"{prefix}_Weight_End{end}.txt",
                            f"{prefix}_Opt_Weight_End{end}.txt")
        result = TrainResult(params=params, spec=spec, best_metric=best_metric,
                             history=history)

    return result
