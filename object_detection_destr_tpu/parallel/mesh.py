"""Mesh construction and batch sharding.

TPU-native replacement for a distributed backend: a 2-axis ``Mesh``
(('data', 'model')) over the ICI-connected slice. The batch is sharded on
'data'; parameters are replicated (the model is 256-d — tensor parallelism
is unnecessary, but the 'model' axis is reserved so TP can be added without
re-plumbing, SURVEY.md §2.2). XLA inserts the gradient all-reduce over ICI
from the shardings alone — there is no NCCL/MPI analog to write.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

__all__ = [
    "make_mesh",
    "auto_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
]


def auto_mesh(batch_size: int) -> "Mesh":
    """Mesh over the largest device count that divides ``batch_size``
    (a batch must split evenly across the 'data' axis).

    When ``batch_size`` is not divisible by the device count, a smaller
    mesh is chosen and the leftover devices sit idle — that is a silent
    throughput loss, so it is logged loudly (e.g. batch 12 on 8 devices
    -> 6-device mesh, 2 idle).
    """
    n = len(jax.devices())
    num_data = max(d for d in range(1, n + 1) if batch_size % d == 0)
    if num_data < n:
        logger.warning(
            "auto_mesh: batch_size=%d is not divisible by the %d available "
            "devices; using a %d-device data mesh and leaving %d device(s) "
            "idle. Pick a batch size divisible by %d for full utilization.",
            batch_size, n, num_data, n - num_data, n,
        )
    return make_mesh(num_data=num_data, num_model=1)


def make_mesh(
    num_data: Optional[int] = None,
    num_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """('data', 'model') mesh. Defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devices) // num_model
    if num_data * num_model > len(devices):
        raise ValueError(
            f"mesh {num_data}x{num_model} needs {num_data * num_model} devices, "
            f"have {len(devices)}"
        )
    grid = np.asarray(devices[: num_data * num_model]).reshape(num_data, num_model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis split across 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with its leading axis sharded on 'data'."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
