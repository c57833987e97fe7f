from ldpc_error_floor_tpu.sim.fer import FERPoint, FERSimulator, SimCounters
from ldpc_error_floor_tpu.sim.harvest import UncorHarvester

__all__ = ["FERPoint", "FERSimulator", "SimCounters", "UncorHarvester"]
