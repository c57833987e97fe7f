"""Device-mesh setup for data-parallel Monte-Carlo and training.

The model is a few thousand scalar weights (replicated); the only
parallelism axis that matters is the codeword batch (SURVEY.md section 5.8).
A 1-D ``('data',)`` mesh over all chips/hosts carries it: batch lanes are
sharded, per-chip RNG streams come from `jax.random.fold_in` on the axis
index, and error counters / gradients reduce with `psum` over ICI/DCN."""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host setup; no-op on a single host with no coordinator given."""
    if coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def data_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first `n_devices` devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def batch_constraint(mesh: Optional[Mesh], axis: str = "data") -> Callable:
    """Sharding constraint for ``[nbits, B]`` batch tensors: batch lanes
    (the trailing axis) split over the mesh's data axis, bit dimension
    replicated.  Identity when `mesh` is None, so single-device code paths
    are unchanged.  Used inside jitted train/eval steps so GSPMD shards the
    Monte-Carlo batch and all-reduces gradients/counters over ICI."""
    if mesh is None:
        return lambda x: x
    sharding = NamedSharding(mesh, P(None, axis))
    return lambda x: jax.lax.with_sharding_constraint(x, sharding)


def replicate(mesh: Optional[Mesh], tree):
    """Place a pytree fully replicated on the mesh (no-op without a mesh)."""
    if mesh is None:
        return tree
    return jax.device_put(tree, NamedSharding(mesh, P()))
