"""Device mesh and sharding rules.

The reference's entire parallelism story is single-node DDP over NCCL
(reference cinema/device.py:35-48, mae/pretrain.py:434-448): data-parallel
gradient all-reduce only. The TPU-native equivalent is single-program SPMD:

- a 2-D logical mesh ``('data', 'model')``: batches shard over ``data``
  (replacing DistributedSampler + DDP all-reduce — XLA emits the gradient
  reduction over ICI automatically), and transformer weights optionally
  shard Megatron-style over ``model`` (tensor parallelism the reference
  does not have, kept open per SURVEY.md §2.8);
- no rendezvous/weight-sync code: same PRNG key => identical init, and
  ``jax.distributed.initialize()`` handles multi-host topology.

Sharding rules are path-based on the flax param tree: attention q/kv and
mlp fc1 shard their output dim, proj/fc2 shard their input dim, matching
biases shard with outputs; everything else (conv stems, norms, tokens,
heads) is replicated — those are <2% of FLOPs and small.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a ('data', 'model') mesh.

    Args:
        n_data: data-parallel size; defaults to n_devices // n_model.
        n_model: tensor-parallel size.
        devices: devices to use; defaults to all.

    Returns:
        2-D Mesh.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model > len(devices):
        raise ValueError(f"mesh {n_data}x{n_model} needs more than {len(devices)} devices.")
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def _path_parts(keypath) -> Tuple[str, ...]:
    parts = []
    for k in keypath:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        else:
            parts.append(str(k))
    return tuple(parts)


def _param_spec(parts: Tuple[str, ...], value: Any) -> P:
    """Megatron-style TP rules for transformer weights; replicate the rest.

    Works on any tree whose leaf paths end with the param path (params and
    Adam moments alike).
    """
    if not hasattr(value, "ndim") or not parts:
        return P()
    leaf = parts[-1]
    if "attn" in parts or "mlp" in parts:
        col = any(p in ("q", "kv", "fc1", "fc1_g", "fc1_x") for p in parts)
        row = any(p in ("proj", "fc2") for p in parts)
        if col and leaf == "kernel" and value.ndim == 2:
            return P(None, MODEL_AXIS)
        if col and leaf == "bias" and value.ndim == 1:
            return P(MODEL_AXIS)
        if row and leaf == "kernel" and value.ndim == 2:
            return P(MODEL_AXIS, None)
    return P()


# params smaller than this stay replicated under FSDP (the all-gather
# latency on tiny tensors outweighs the memory saved)
_FSDP_MIN_SIZE = 2**16


def param_shardings(params: Any, mesh: Mesh, fsdp: bool = False) -> Any:
    """NamedSharding tree for any state tree.

    TP over the 'model' axis (Megatron rules); with ``fsdp`` additionally
    shards every still-replicated large param over the 'data' axis on its
    largest divisible dim — ZeRO-3-style memory scaling: GSPMD all-gathers
    params before use and reduce-scatters gradients, so optimizer state and
    master weights live sharded (the reference's DDP replicates everything,
    cinema/device.py:86-104; this is strictly stronger).

    Dims not divisible by the axis size fall back to replication.
    """
    n_model = mesh.shape[MODEL_AXIS]
    n_data = mesh.shape[DATA_AXIS]

    def to_sharding(keypath, value):
        parts = _path_parts(keypath)
        spec = _param_spec(parts, value)
        for axis, name in enumerate(spec):
            if name == MODEL_AXIS and value.shape[axis] % n_model != 0:
                spec = P()
                break
        if (
            fsdp
            and hasattr(value, "ndim")
            and value.ndim >= 1
            and np.prod(value.shape) >= _FSDP_MIN_SIZE
        ):
            # shard the largest still-free dim over 'data' (composes with
            # TP: a (None, 'model') kernel becomes ('data', 'model'))
            entries = list(spec) + [None] * (value.ndim - len(spec))
            candidates = [
                (value.shape[axis], axis)
                for axis in range(value.ndim)
                if entries[axis] is None and value.shape[axis] % n_data == 0
            ]
            if candidates:
                _, axis = max(candidates)
                entries[axis] = DATA_AXIS
                spec = P(*entries)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def batch_shardings(batch: Any, mesh: Mesh) -> Any:
    """Shard the leading (batch) axis of every array over 'data'."""
    return jax.tree_util.tree_map(lambda _x: NamedSharding(mesh, P(DATA_AXIS)), batch)


def replicated(tree: Any, mesh: Mesh) -> Any:
    """Fully replicated shardings for a pytree."""
    return jax.tree_util.tree_map(lambda _x: NamedSharding(mesh, P()), tree)
