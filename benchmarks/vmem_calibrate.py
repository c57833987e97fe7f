"""Calibrate/validate the fused-kernel VMEM model against real compiles.

For each (code, mode, tb) combination, attempts to compile-and-run the
fused kernel on the local TPU chip with a one-tile batch and reports
whether it fit, alongside `kernel_vmem_bytes`'s prediction.  The model is
correct when prediction (fits/doesn't fit the scoped budget) matches the
compile outcome for every row; tests/test_vmem_budget.py pins the
resulting table.

Usage:  python benchmarks/vmem_calibrate.py [code ...]
        (default: the spanning set wman / wifi / 5G z32 / z64 / z72 /
         MACKAY / BCH / Polar)
"""

import sys
import os
import json
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from ldpc_error_floor_tpu.utils import enable_compile_cache
from ldpc_error_floor_tpu.codes import TannerGraph, get_code
from ldpc_error_floor_tpu.models import DecoderConfig, WeightSpec, init_weights
from ldpc_error_floor_tpu.models.weights import stack_weights
from ldpc_error_floor_tpu.ops.pallas_decoder import (FusedNMSKernel, auto_tb,
                                                     kernel_vmem_bytes,
                                                     SCOPED_VMEM_BYTES)

DEFAULT_CODES = [
    "wman_N0576_R34_z24",
    "802_11n_N648_R56_z27",
    "5G_LDPC_R0.50_n_dec640_n512_k256_z32_s257_320",
    "5G_LDPC_R0.50_n_dec1280_n1024_k512_z64_s513_640",
    "5G_LDPC_R0.73_n_dec2304_n2112_k1536_z72_s1537_1584",
    "MACKAY_N96_K48",
    "BCH_63_51",
    "Polar_64_48",
]

T = 20


def try_compile(code_name, mode, tb):
    code = get_code(code_name)
    graph = TannerGraph(code)
    ucn = mode == "stats_ucn"
    sharing = (3, 3, 3) if ucn else (2, 0, 2)
    spec = WeightSpec(sharing=sharing, n_iters=T)
    params = init_weights(spec, graph)
    stacked = stack_weights(spec, params)
    cfg = DecoderConfig(decoding_type=2, q_bit=5)
    # packed kernels decode P codewords per lane (round 5): one tile's
    # batch is tb * P
    zp = -(-max(code.z, 1) // 8) * 8
    pack = max(1, zp // max(code.z, 1))
    llr = jnp.full((code.N * code.z, tb * pack), -4.0, jnp.float32)
    if mode in ("stats", "stats_ucn", "deploy"):
        k = FusedNMSKernel(graph, cfg, spec, tb=tb, interpret=False,
                           mode="deploy" if mode == "deploy" else "stats")
        if mode == "deploy":
            out = k.decode_deploy(stacked, llr)
        else:
            out = k.decode_stats(stacked, llr)
        jax.block_until_ready(out)
    elif mode == "train":
        from ldpc_error_floor_tpu.ops.pallas_train import FusedTrainKernel
        k = FusedTrainKernel(graph, cfg, spec, tb=tb, interpret=False)

        def loss(p):
            apps = k.apps(stack_weights(spec, p), llr)
            return jnp.sum(apps)

        g = jax.jit(jax.grad(loss))(params)
        jax.block_until_ready(g)
    else:
        raise ValueError(mode)
    return True


def main():
    enable_compile_cache()
    codes = sys.argv[1:] or DEFAULT_CODES
    rows = []
    for name in codes:
        code = get_code(name)
        graph = TannerGraph(code)
        for mode in ("stats", "stats_ucn", "deploy", "train"):
            bmode = {"stats": "stats", "stats_ucn": "stats",
                     "deploy": "deploy", "train": "train"}[mode]
            for tb in (256, 128):
                pred = kernel_vmem_bytes(graph, tb, n_iters=T, mode=bmode,
                                         ucn=mode == "stats_ucn")
                fits = pred <= SCOPED_VMEM_BYTES
                try:
                    ok = try_compile(name, mode, tb)
                    err = ""
                except Exception as e:
                    ok = False
                    err = f"{type(e).__name__}: {str(e).splitlines()[0][:90]}"
                row = dict(code=name, mode=mode, tb=tb, model_mib=pred / 2**20,
                           model_fits=fits, compiled=ok, err=err)
                rows.append(row)
                print(json.dumps(row), flush=True)
    agree = sum(r["model_fits"] == r["compiled"] for r in rows)
    print(f"# model/compile agreement: {agree}/{len(rows)}", flush=True)


if __name__ == "__main__":
    main()
