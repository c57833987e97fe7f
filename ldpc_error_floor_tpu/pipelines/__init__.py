from ldpc_error_floor_tpu.pipelines.config import (ExperimentConfig,
                                                   base_config_wman,
                                                   post_config_wman)
from ldpc_error_floor_tpu.pipelines.evaluate import Evaluator
from ldpc_error_floor_tpu.pipelines.train import TrainResult, run_training
from ldpc_error_floor_tpu.pipelines.collect import (run_collection,
                                                    split_uncor_dataset)

__all__ = ["ExperimentConfig", "base_config_wman", "post_config_wman",
           "Evaluator", "TrainResult", "run_training", "run_collection",
           "split_uncor_dataset"]
