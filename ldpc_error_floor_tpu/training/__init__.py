from ldpc_error_floor_tpu.training.losses import multi_iteration_loss
from ldpc_error_floor_tpu.training.train import TrainState, make_train_step
from ldpc_error_floor_tpu.training.schedule import training_blocks

__all__ = ["multi_iteration_loss", "TrainState", "make_train_step",
           "training_blocks"]
