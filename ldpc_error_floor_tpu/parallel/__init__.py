from ldpc_error_floor_tpu.parallel.mesh import (batch_constraint, data_mesh,
                                                initialize_distributed,
                                                replicate)

__all__ = ["batch_constraint", "data_mesh", "initialize_distributed",
           "replicate"]
