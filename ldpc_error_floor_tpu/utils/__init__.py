from ldpc_error_floor_tpu.utils.cache import enable_compile_cache

__all__ = ["enable_compile_cache"]
