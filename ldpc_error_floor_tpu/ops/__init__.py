from ldpc_error_floor_tpu.ops.ste import (
    quantize_llr,
    quantize_ste,
    sign_ste,
    qms_clip_limit,
)

__all__ = ["quantize_llr", "quantize_ste", "sign_ste", "qms_clip_limit",
           "FusedNMSKernel"]


def __getattr__(name):
    # FusedNMSKernel imports pallas; keep it lazy so CPU-only import stays light
    if name == "FusedNMSKernel":
        from ldpc_error_floor_tpu.ops.pallas_decoder import FusedNMSKernel
        return FusedNMSKernel
    raise AttributeError(name)
