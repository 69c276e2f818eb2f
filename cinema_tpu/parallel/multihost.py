"""Multi-host (multi-process) SPMD support.

The reference's multi-device story is single-node `mp.spawn` + NCCL DDP with
a `DistributedSampler` (reference cinema/device.py:23-48,
cinema/mae/pretrain.py:327-330, 434-448). The TPU-native equivalent is one
process per host in a single SPMD program:

- `maybe_initialize_distributed` calls `jax.distributed.initialize()` when
  the config (or environment) says this is a multi-process run — after it,
  `jax.devices()` is global and every mesh spans all hosts;
- `shard_manifest` gives each process its slice of the study list —
  deterministic, equal-length (wrap-padded), seed-shuffled: the exact
  semantics of `DistributedSampler(shuffle=True)`;
- `make_global_batch` assembles the global batch array from each process's
  locally loaded shard via `jax.make_array_from_process_local_data`.

Single-process runs pass through unchanged (process_count() == 1), so the
same training code runs on a laptop CPU, one TPU chip, or a multi-host pod.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, TypeVar

import jax
import numpy as np

from cinema_tpu.log import get_logger

logger = get_logger(__name__)

T = TypeVar("T")

_initialized = False


def maybe_initialize_distributed(multiprocess: bool = False) -> None:
    """Initialize the JAX distributed runtime for multi-host meshes.

    Call once at entry-point start, BEFORE any other jax call touches the
    backend. On TPU pods the coordinator/process id/count are discovered
    from the environment (Slurm/MPI/k8s cluster detection); for manual
    launches set JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES and
    JAX_PROCESS_ID — jax itself only auto-reads the coordinator address,
    so the count/id are forwarded here explicitly.

    No-op unless ``multiprocess`` is set (reference analog: config.ddp
    gating mp.spawn, cinema/mae/pretrain.py:434-448).
    """
    global _initialized
    if not multiprocess or _initialized:
        return
    import os

    platforms = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    if platforms.strip() == "cpu":
        # multi-process CPU (tests, dry runs) needs a collectives backend;
        # harmless before backend init, never reached on TPU pods
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    num = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    jax.distributed.initialize(
        num_processes=int(num) if num else None,
        process_id=int(pid) if pid else None,
    )
    _initialized = True
    logger.info(
        f"distributed: process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()}/{jax.device_count()} local devices"
    )


def shard_manifest(
    items: Sequence[T],
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
    shuffle_seed: Optional[int] = None,
) -> List[T]:
    """This process's equal-length shard of a manifest.

    Mirrors torch DistributedSampler (the reference's data sharding,
    cinema/mae/pretrain.py:327-330): optional seeded shuffle of the full
    list, wrap-pad to a multiple of process_count, then strided assignment
    ``indices[rank::world]`` — every process gets exactly
    ceil(n / world) items and the union covers the dataset.
    """
    n = len(items)
    if n == 0:
        return []
    rank = jax.process_index() if process_index is None else process_index
    world = jax.process_count() if process_count is None else process_count
    if world == 1:
        return list(items)
    order = np.arange(n)
    if shuffle_seed is not None:
        order = np.random.default_rng(shuffle_seed).permutation(n)
    per_rank = -(-n // world)  # ceil
    total = per_rank * world
    padded = np.resize(order, total)  # wrap-pad like DistributedSampler
    return [items[i] for i in padded[rank::world]]


def make_global_batch(local_batch: Any, shardings: Any) -> Any:
    """Assemble global device arrays from process-local batch data.

    Single-process: a plain ``device_put`` with the shardings. Multi-process:
    ``jax.make_array_from_process_local_data`` — each process contributes the
    rows its mesh shard owns, and the result is one global array the jitted
    step consumes without any gather.
    """
    if jax.process_count() == 1:
        return jax.device_put(local_batch, shardings)
    return jax.tree_util.tree_map(
        lambda x, s: jax.make_array_from_process_local_data(s, np.asarray(x)),
        local_batch,
        shardings,
    )


def local_data_shard_count(mesh) -> int:
    """How many of the mesh's 'data' rows this process owns.

    The local loader batch must be ``batch_size_per_device *
    local_data_shard_count(mesh)`` so that local rows exactly fill the
    process's addressable shards of the global batch.
    """
    from cinema_tpu.parallel.mesh import DATA_AXIS

    if jax.process_count() == 1:
        return int(mesh.shape[DATA_AXIS])
    local = set(jax.local_devices())
    axes = list(mesh.axis_names)
    data_axis = axes.index(DATA_AXIS)
    count = 0
    for idx in range(mesh.devices.shape[data_axis]):
        row = np.take(mesh.devices, idx, axis=data_axis).ravel()
        # a row counts if ANY of its devices is local: when the 'model' axis
        # straddles hosts, each such host holds addressable shards of that
        # batch row and must contribute its data
        if any(d in local for d in row):
            count += 1
    return count
