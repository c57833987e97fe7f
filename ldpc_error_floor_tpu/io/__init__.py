from ldpc_error_floor_tpu.io.weight_files import (
    read_weight_file,
    write_weight_file,
    read_weight_json,
    write_weight_json,
    bundled_weight_path,
)
from ldpc_error_floor_tpu.io.uncor_files import read_uncor_file, append_uncor_file

__all__ = [
    "read_weight_file",
    "write_weight_file",
    "read_weight_json",
    "write_weight_json",
    "bundled_weight_path",
    "read_uncor_file",
    "append_uncor_file",
]
