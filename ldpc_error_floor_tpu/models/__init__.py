from ldpc_error_floor_tpu.models.nms import (
    DecoderConfig,
    DecodeResult,
    DeployResult,
    NMSDecoder,
    SP,
    MS,
    QMS,
    MS_RAW,
)
from ldpc_error_floor_tpu.models.weights import (
    Params,
    WeightSpec,
    init_weights,
    clip_weights,
    stack_weights,
    trainable_mask,
    load_params,
    params_from_blocks,
    params_to_blocks,
    partial_update_from_blocks,
)
from ldpc_error_floor_tpu.models.boosted import BoostedDecoder, compose_boosted_params

__all__ = [
    "DecoderConfig", "DecodeResult", "DeployResult", "NMSDecoder", "SP", "MS", "QMS", "MS_RAW",
    "Params", "WeightSpec", "init_weights", "clip_weights", "stack_weights",
    "trainable_mask", "load_params", "params_from_blocks", "params_to_blocks",
    "partial_update_from_blocks", "BoostedDecoder", "compose_boosted_params",
]
