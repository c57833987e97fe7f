"""Uncorrected-word collection driver (the reference's sampling_type=2 run,
SURVEY.md section 3.3): decode fresh noise at one SNR with frozen weights and
append every never-corrected frame to an Uncor file.

Uses the TPU-native harvester (device-side mask, host pull only on hits), so
collection runs at full decode throughput — the phase that dominates the
boosting pipeline at error-floor SNRs (~1e7 decodes per collected word)."""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from ldpc_error_floor_tpu.channel.awgn import AWGNChannel
from ldpc_error_floor_tpu.codes import TannerGraph, get_code
from ldpc_error_floor_tpu.models import (DecoderConfig, NMSDecoder, WeightSpec,
                                         load_params)
from ldpc_error_floor_tpu.pipelines.config import ExperimentConfig
from ldpc_error_floor_tpu.sim.harvest import UncorHarvester


def run_collection(cfg: ExperimentConfig, weight_file: Optional[str] = None,
                   target_words: int = 20000, batch: int = 4096,
                   out_file: str = "Uncor.txt", mesh=None,
                   max_frames: int = 1_000_000_000,
                   backend: Optional[str] = None,
                   ckpt_path: Optional[str] = None) -> np.ndarray:
    """Collect `target_words` uncorrected words at cfg.snrs[0].

    `weight_file` defaults to the trained base decoder's best snapshot
    ({out_dir}/{prefix}_Opt_Weight_End{iters_max}.txt).  On TPU the fused
    Pallas kernel with genie-exact early stopping is used by default — at
    error-floor SNRs most tiles converge long before iters_max, which is
    the regime harvesting lives in (~1e7 decodes per collected word)."""
    cfg = cfg.validate()
    if len(cfg.snrs) != 1:
        raise ValueError("collection runs at a single SNR")
    code = get_code(cfg.code, z=cfg.z, punct=cfg.punct, short=cfg.short)
    graph = TannerGraph(code)
    spec = WeightSpec(sharing=cfg.sharing, n_iters=cfg.iters_max,
                      fixed_iter=cfg.fixed_iter, min_w=cfg.min_weight,
                      max_w=cfg.max_weight)
    if weight_file is None:
        weight_file = os.path.join(
            cfg.out_dir, f"{cfg.out_prefix}_Opt_Weight_End{cfg.iters_max}.txt")
    params = load_params(spec, graph, weight_file)
    if backend is None:
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    from ldpc_error_floor_tpu.ops.pallas_decoder import auto_tb
    local = batch // mesh.shape["data"] if mesh is not None else batch
    target = (code.N - code.M) if cfg.systematic else 0
    # kernel tiles must divide the per-device batch; auto_tb sizes them
    # from the modeled scoped-VMEM footprint (kernel_vmem_bytes)
    tb = auto_tb(graph, local, mode="stats", ucn=spec.ucn_enabled,
                 target=target, n_iters=cfg.iters_max)
    if tb is None:
        backend, tb = "xla", 128
    dcfg = DecoderConfig(decoding_type=cfg.decoding_type, q_bit=cfg.q_bit,
                         clip_llr=cfg.clip_llr, backend=backend,
                         pallas_tb=tb, pallas_early_stop=(backend == "pallas"),
                         target_node=target)
    decoder = NMSDecoder(code, dcfg, spec, graph=graph)
    channel = AWGNChannel(code, decoding_type=cfg.decoding_type,
                          q_bit=cfg.q_bit, clip_llr=cfg.clip_llr)
    harvester = UncorHarvester(decoder, channel, batch=batch, mesh=mesh)
    key = jax.random.PRNGKey(cfg.seed)
    return harvester.collect(params, cfg.snrs[0], key, target_words,
                             max_frames=max_frames, out_file=out_file,
                             ckpt_path=ckpt_path)


def split_uncor_dataset(uncor_file: str, code_name: str, input_dir: str,
                        n_train: int, n_valid: int, n_test: int) -> None:
    """Split a harvested Uncor.txt into the three `[Uncor]_{code}` datasets
    the post-decoder training expects (the reference leaves this as a manual
    step; SURVEY.md section 2.6)."""
    from ldpc_error_floor_tpu.io.uncor_files import (append_uncor_file,
                                                     read_uncor_file)
    llrs = read_uncor_file(uncor_file)
    need = n_train + n_valid + n_test
    if llrs.shape[0] < need:
        raise ValueError(f"{uncor_file}: {llrs.shape[0]} rows < {need}")
    os.makedirs(input_dir, exist_ok=True)
    base = os.path.join(input_dir, f"[Uncor]_{code_name}")
    splits = [(".txt", llrs[:n_train]),
              ("_Valid.txt", llrs[n_train:n_train + n_valid]),
              ("_Test.txt", llrs[n_train + n_valid:need])]
    for suffix, rows in splits:
        path = base + suffix
        if os.path.exists(path):
            os.remove(path)
        append_uncor_file(path, rows)
