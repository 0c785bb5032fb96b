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


def world_info_from_env() -> tuple:
    """(local_rank, global_rank, world_size) from launcher env vars — the
    reference's discovery order exactly (training/distributed.py:43-60):
    torchrun-style RANK/WORLD_SIZE, then PMI (SLURM+mpi), SLURM, OMPI."""
    import os

    local_rank = 0
    for v in ("LOCAL_RANK", "MPI_LOCALRANKID", "SLURM_LOCALID",
              "OMPI_COMM_WORLD_LOCAL_RANK"):
        if v in os.environ:
            local_rank = int(os.environ[v])
            break
    global_rank = 0
    for v in ("RANK", "PMI_RANK", "SLURM_PROCID", "OMPI_COMM_WORLD_RANK"):
        if v in os.environ:
            global_rank = int(os.environ[v])
            break
    world_size = 1
    for v in ("WORLD_SIZE", "PMI_SIZE", "SLURM_NTASKS", "OMPI_COMM_WORLD_SIZE"):
        if v in os.environ:
            world_size = int(os.environ[v])
            break
    return local_rank, global_rank, world_size


def init_distributed_from_env(dist_url: Optional[str] = None) -> tuple:
    """Auto-bootstrap multi-host JAX from launcher env (the reference's
    init_distributed_device env path, training/distributed.py:63-99).

    ``dist_url`` is the reference's ``--dist-url`` (``env://`` or
    ``tcp://host:port``); the coordinator address falls back to
    MASTER_ADDR:MASTER_PORT, then SLURM's first nodelist entry. Returns the
    (local_rank, global_rank, world_size) triple; single-process setups
    return without touching jax.distributed.
    """
    import os

    local_rank, global_rank, world_size = world_info_from_env()
    if world_size <= 1:
        return local_rank, global_rank, world_size
    coordinator = None
    if dist_url and dist_url.startswith("tcp://"):
        coordinator = dist_url[len("tcp://"):]
    elif os.environ.get("MASTER_ADDR"):
        coordinator = (os.environ["MASTER_ADDR"] + ":"
                       + os.environ.get("MASTER_PORT", "29500"))
    elif os.environ.get("SLURM_STEP_NODELIST") or os.environ.get("SLURM_NODELIST"):
        nodelist = os.environ.get("SLURM_STEP_NODELIST") or os.environ["SLURM_NODELIST"]
        # first entry of "host[1-4],other" style lists
        head = nodelist.split(",")[0]
        if "[" in head:  # host[1-4] -> host1
            base, rng = head.split("[", 1)
            head = base + rng.split("-", 1)[0].split(",", 1)[0].rstrip("]")
        coordinator = head + ":" + os.environ.get("MASTER_PORT", "29500")
    jax.distributed.initialize(coordinator, world_size, global_rank)
    return local_rank, global_rank, world_size


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
