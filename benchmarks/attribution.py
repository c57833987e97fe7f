"""Round-5 VPU idle-time attribution for the fused decode kernel
(round-4 VERDICT item 2).

Runs the wman stats kernel with each per-chain ablation toggle
(ops/pallas_decoder.py: LDPC_KERNEL_NO{ROLL,QUANT,WEIGHT,STATS,MIN}) in a
fresh subprocess and reports each chain's share of the step time as
time(base) - time(ablated).  The toggles break numerics — this is a
measurement harness, never a production path.

Usage: python benchmarks/attribution.py [--batch 262144] [--tb 256]
Writes benchmarks/runs/round5/ATTRIBUTION.json.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ABLATIONS = [
    ("base", None),
    ("roll", "LDPC_KERNEL_NOROLL"),          # circulant sublane rotations
    ("quantize", "LDPC_KERNEL_NOQUANT"),     # STE round chains
    ("weighting", "LDPC_KERNEL_NOWEIGHT"),   # neural weight read+multiply
    ("stats", "LDPC_KERNEL_NOSTATS"),        # per-lane error reduction
    ("minsum", "LDPC_KERNEL_NOMIN"),         # sequential min1/min2 chain
]


def run_one(env_var, args):
    env = dict(os.environ)
    if env_var:
        env[env_var] = "1"
    cmd = [sys.executable, "benchmarks/kernel_opt_check.py",
           "--skip-parity", "--batch", str(args.batch),
           "--tb", str(args.tb), "--iters", str(args.iters)]
    out = subprocess.run(cmd, cwd=ROOT, env=env, capture_output=True,
                         text=True, timeout=1800).stdout
    m = re.search(r"throughput: ([\d,]+) cw/s\s+\(([\d.]+) ms/step", out)
    if not m:
        raise RuntimeError(f"no throughput line for {env_var}:\n{out[-800:]}")
    return float(m.group(2)), int(m.group(1).replace(",", ""))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=262144)
    p.add_argument("--tb", type=int, default=256)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--out", default="benchmarks/runs/round5/ATTRIBUTION.json")
    args = p.parse_args()

    rows = {}
    for name, env_var in ABLATIONS:
        ms, cws = run_one(env_var, args)
        rows[name] = {"ms_per_step": ms, "cw_per_sec": cws}
        print(f"{name:10s}: {ms:8.2f} ms/step  {cws:,} cw/s", flush=True)

    base = rows["base"]["ms_per_step"]
    attr = {}
    for name in rows:
        if name == "base":
            continue
        saved = base - rows[name]["ms_per_step"]
        attr[name] = {"ms_saved": round(saved, 3),
                      "share_of_step": round(saved / base, 4)}
        print(f"chain {name:10s}: {saved:7.2f} ms saved "
              f"({100 * saved / base:5.1f}% of step)", flush=True)
    result = {"config": vars(args), "rows": rows, "attribution": attr}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
