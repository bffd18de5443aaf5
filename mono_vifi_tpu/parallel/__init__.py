"""Device mesh + sharding helpers (the reference's DDP/NCCL equivalent).

The reference scales via one-process-per-GPU DDP with NCCL all-reduce and
SyncBatchNorm (train.py:205-227, :1179-1183). Here a single SPMD program runs
over a 1-D `data` mesh: batches are sharded on axis 0, parameters are
replicated, and XLA inserts the gradient all-reduces over ICI during jit
compilation. BatchNorm statistics are computed over the global (sharded)
batch automatically under GSPMD — SyncBatchNorm semantics with zero extra
code.

Multi-host pods (the reference's `torch.distributed` env:// rendezvous,
train.py:1179-1183) run the SAME program after `initialize_distributed`:
jax.distributed.initialize reads the standard env rendezvous
(COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, or the TPU pod metadata),
`make_mesh` lays the global device set on the `data` axis (ICI within a
host/slice, DCN across), each process loads only its shard of the global
batch (StatefulDistributedSampler), and `shard_host_local_batch` assembles
the global sharded arrays from per-host data.
"""

from __future__ import annotations

import logging

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(cfg=None) -> tuple[int, int]:
    """Multi-host init (idempotent). Returns (process_index, process_count).

    Call before any other JAX API when running one process per host on a
    pod. Rendezvous comes from the standard JAX env (or cloud TPU metadata);
    equivalent of reference dist.init_process_group('nccl', 'env://')
    (train.py:1179-1183).
    """
    if cfg is not None and getattr(cfg, "distributed", False):
        if jax.process_count() == 1:  # not yet initialized
            try:
                jax.distributed.initialize()
            except Exception as e:  # missing env on single host: proceed local
                logging.warning("jax.distributed.initialize failed (%s); "
                                "continuing single-process", e)
    return jax.process_index(), jax.process_count()


def make_mesh(num_devices: int | None = None) -> Mesh:
    """1-D `data` mesh over the global device set."""
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


def shard_host_local_batch(batch: dict, mesh: Mesh) -> dict:
    """Assemble globally-sharded batch arrays from per-process local shards.

    Single-process: plain device_put with batch sharding. Multi-host: each
    process contributes its local slice of the global batch (local batch
    size = global // process_count, loaded via StatefulDistributedSampler);
    jax.make_array_from_process_local_data glues them into global arrays
    without any cross-host data movement.
    """
    sh = data_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(batch, sh)
    return {
        k: jax.make_array_from_process_local_data(sh, np.asarray(v))
        for k, v in batch.items()
    }


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))
