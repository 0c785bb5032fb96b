"""Device mesh + sharding helpers.

Replaces the reference's process-group machinery (reference behaviour:
deps/open_clip/src/training/distributed.py — NCCL/horovod init, SLURM env
discovery) with the JAX model: one process sees all local chips, a
``jax.sharding.Mesh`` spans them, and pjit/shard_map place computation.
Multi-host setups call :func:`init_distributed` (jax.distributed) before mesh
creation; collectives ride ICI inside jit.

The framework's parallelism is data-parallel over a 1-D ``('data',)`` mesh —
matching the reference, whose only training parallelism is DDP
(SURVEY.md §2e) — with optional ZeRO-style parameter sharding over the same
axis (the reference's Lightning 'fsdp' strategy flag equivalent).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def init_distributed(coordinator: Optional[str] = None, num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bootstrap (DCN). Single-process setups skip this."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def create_mesh(devices: Optional[Sequence[jax.Device]] = None, axis_names=(DATA_AXIS,)) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    shape = (len(devices),) if len(axis_names) == 1 else None
    if shape is None:
        raise NotImplementedError("only 1-D meshes are used; pass devices reshaped for N-D")
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: leading axis split across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (pytree of arrays with equal leading dim) onto the
    mesh, split along the data axis.

    Each process passes its *process-local* shard (sized by
    ``jax.local_device_count()``); the global array is assembled across
    hosts with ``jax.make_array_from_process_local_data`` — the JAX
    equivalent of the reference's per-rank DistributedSampler batches
    (training/data.py). Single-process, this is identical to a sharded
    ``device_put``."""
    sharding = data_sharding(mesh)

    def put(x):
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


@dataclasses.dataclass(frozen=True)
class DistInfo:
    """world/rank bookkeeping for logging parity with the reference meters."""

    world_size: int
    process_index: int

    @classmethod
    def current(cls) -> "DistInfo":
        return cls(world_size=jax.device_count(), process_index=jax.process_index())
