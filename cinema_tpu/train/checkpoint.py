"""Checkpointing with orbax + safetensors export (reference: cinema/optim.py:229-294).

Training state (params + optimizer + counters) goes through orbax; model
distribution artifacts are torch-layout safetensors via the bridge so they
remain loadable by the reference PyTorch stack and by our own
``factory.from_finetuned``.
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Any, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from cinema_tpu.log import get_logger

logger = get_logger(__name__)


def save_checkpoint(ckpt_dir: Union[str, Path], state: Any, epoch: int) -> Path:
    """Save a train state under ckpt_dir/ckpt_{epoch}.

    Multi-host: every process calls this with the same path; the state's
    (possibly non-fully-addressable) global arrays are saved directly —
    orbax coordinates the distributed write. Single-process keeps the
    host-gathered save (cheap, and robust over the remote-device tunnel).
    """
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = (ckpt_dir / f"ckpt_{epoch}").absolute()
    if path.exists() and jax.process_index() == 0:
        shutil.rmtree(path)
    if jax.process_count() > 1:
        # barrier: orbax's own destination-exists check runs on EVERY
        # process, so none may reach save() while process 0 still rmtree's
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"ckpt_rm_{epoch}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state) if jax.process_count() == 1 else state)
    return path


def load_checkpoint(
    path: Union[str, Path], state_template: Any, shardings: Any = None
) -> Any:
    """Restore a train state saved by :func:`save_checkpoint`.

    With ``shardings`` the restore is distribution-aware: orbax reads each
    array straight into the given placement (no host gather, works when the
    saved arrays are not fully addressable on this process) and re-shards
    as needed — a checkpoint written on one mesh restores onto any other
    (elastic resume; the reference's `.pt` resume is single-device only,
    cinema/optim.py:263-294). ``state_template`` only provides the tree
    structure and shapes/dtypes; it may be concrete or abstract.
    """
    if shardings is not None:
        state_template = jax.tree_util.tree_map(
            lambda x, s: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype, sharding=s),
            state_template,
            shardings,
        )
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(Path(path).absolute(), state_template)


class CheckpointRetention:
    """Rolling retention with optional pinning (reference mae/pretrain.py:412-428
    keeps max_n_ckpts, pinning every ``pin_every``-th epoch)."""

    def __init__(self, max_n_ckpts: int, pin_every: int = 0) -> None:
        self.max_n_ckpts = max_n_ckpts
        self.pin_every = pin_every
        self.saved: List[Path] = []

    def add(self, path: Path, epoch: int) -> None:
        if self.pin_every and (epoch + 1) % self.pin_every == 0:
            return  # pinned, not subject to deletion
        self.saved.append(Path(path))
        if 0 < self.max_n_ckpts < len(self.saved):
            to_delete = self.saved.pop(0)
            if to_delete.exists():
                shutil.rmtree(to_delete, ignore_errors=True)
            meta = to_delete.parent / f"{to_delete.name}.meta.json"
            if meta.exists():
                meta.unlink()
            logger.info(f"Deleted an outdated checkpoint {to_delete}.")

    @property
    def last(self) -> Optional[Path]:
        return self.saved[-1] if self.saved else None


def save_params_safetensors(params: Any, path: Union[str, Path]) -> None:
    """Export params as torch-layout safetensors (reference distribution format).

    Multi-host: params may be sharded across processes — all-gather the
    global values (every process participates in the collective), then only
    process 0 writes the file.
    """
    from safetensors.numpy import save_file

    from cinema_tpu.bridge.torch_loader import params_to_torch_state_dict

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        host_params = multihost_utils.process_allgather(params, tiled=True)
        if jax.process_index() != 0:
            return
    else:
        host_params = jax.device_get(params)
    state_dict = params_to_torch_state_dict(host_params)
    save_file({k: np.ascontiguousarray(v) for k, v in state_dict.items()}, str(path))


def latest_checkpoint(ckpt_dir: Union[str, Path]) -> Optional[Path]:
    """Find the highest-epoch ckpt_{n} directory."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    candidates = sorted(
        (p for p in ckpt_dir.glob("ckpt_*") if p.name.split("_")[-1].isdigit()),
        key=lambda p: int(p.name.split("_")[-1]),
    )
    return candidates[-1] if candidates else None
