"""Convert upstream data artifacts into this framework's formats.

Reads the (read-only) upstream research repo's data files — proto base-graph
matrices and published trained weight sets — and stores them under
`ldpc_error_floor_tpu/data/` in this framework's own compact JSON formats.
These are *data* (standards-defined base graphs and published trained weight
values), kept for interop/reproducibility; no code is taken from upstream.

Usage:  python tools/import_reference_artifacts.py [REFERENCE_PATH]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ldpc_error_floor_tpu.codes.protograph import save_proto_json  # noqa: E402
from ldpc_error_floor_tpu.io.weight_files import read_weight_file  # noqa: E402

DATA = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "ldpc_error_floor_tpu", "data")


def import_codes(ref: str) -> None:
    src = os.path.join(ref, "BaseGraph")
    out = os.path.join(DATA, "codes")
    os.makedirs(out, exist_ok=True)
    for fn in sorted(os.listdir(src)):
        if not fn.endswith(".txt"):
            continue
        proto = np.loadtxt(os.path.join(src, fn), dtype=np.int64, delimiter="\t")
        name = fn[:-4]
        save_proto_json(proto, os.path.join(out, name + ".json"),
                        meta={"source": f"upstream BaseGraph/{fn}"})
        print(f"codes: {name}  M={proto.shape[0]} N={proto.shape[1]}")


def import_weights(ref: str) -> None:
    out = os.path.join(DATA, "weights")
    os.makedirs(out, exist_ok=True)
    items = [
        ("Weights/C0_wman_N0576_R34_z24_Opt_Weight_End20.txt",
         "wman_N0576_R34_z24_base20.json"),
        ("Results/WiMAX/Weights_Iter50.txt", "wman_N0576_R34_z24_iter50.json"),
        ("Results/WIFI/Weights_Iter50.txt", "802_11n_N648_R56_z27_iter50.json"),
    ]
    for fn in sorted(os.listdir(os.path.join(ref, "Results", "5G"))):
        items.append((f"Results/5G/{fn}", fn.replace("_Weight_End50.txt", "_iter50.json")))
    for src, dst in items:
        path = os.path.join(ref, src)
        if not os.path.exists(path):
            print(f"skip missing {src}")
            continue
        sharing, blocks = read_weight_file(path)
        obj = {
            "sharing": list(sharing),
            "n_iters": len(next(b for b in blocks.values() if b is not None)),
            "source": f"upstream {src}",
            "blocks": {k: (None if v is None else [list(map(float, row)) for row in v])
                       for k, v in blocks.items()},
        }
        with open(os.path.join(out, dst), "w") as f:
            json.dump(obj, f)
        print(f"weights: {dst}  sharing={sharing}")


if __name__ == "__main__":
    ref = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
    import_codes(ref)
    import_weights(ref)
