from ldpc_error_floor_tpu.parallel.mesh import (data_mesh,
                                                initialize_distributed)

__all__ = ["data_mesh", "initialize_distributed"]
