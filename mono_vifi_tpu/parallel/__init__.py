"""Device mesh + sharding helpers (the reference's DDP/NCCL equivalent).

The reference scales via one-process-per-GPU DDP with NCCL all-reduce and
SyncBatchNorm (train.py:205-227, :1179-1183). Here a single SPMD program runs
over a 1-D `data` mesh: batches are sharded on axis 0, parameters are
replicated, and XLA inserts the gradient all-reduces over ICI during jit
compilation. BatchNorm statistics are computed over the global (sharded)
batch automatically under GSPMD — SyncBatchNorm semantics with zero extra
code. Multi-host pods run the same program after jax.distributed.initialize.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("data",))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding for input batches."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated (parameters, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    return jax.device_put(batch, data_sharding(mesh))


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))
