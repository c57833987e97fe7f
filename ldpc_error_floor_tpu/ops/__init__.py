from ldpc_error_floor_tpu.ops.ste import (
    quantize_llr,
    quantize_ste,
    sign_ste,
    qms_clip_limit,
)

__all__ = ["quantize_llr", "quantize_ste", "sign_ste", "qms_clip_limit"]
