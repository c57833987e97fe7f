from ldpc_error_floor_tpu.utils.cache import enable_compile_cache
from ldpc_error_floor_tpu.utils.profiling import Timer, annotate, trace

__all__ = ["enable_compile_cache", "trace", "annotate", "Timer"]
