"""Logging utilities (reference: cinema/log.py)."""

from __future__ import annotations

import json
import logging
import sys
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Union

_FORMAT = "%(asctime)s | %(levelname)s | %(process)d | %(name)s | %(message)s"


def get_logger(name: str) -> logging.Logger:
    """Return a configured logger.

    Args:
        name: logger name, usually ``__name__``.

    Returns:
        logger with a single stream handler.
    """
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger


def flatten_dict(d: Dict[str, Any], parent_key: str = "", sep: str = "_") -> Dict[str, Any]:
    """Flatten a nested dict (reference log.py:24-43), for run records."""
    items: Dict[str, Any] = {}
    for k, v in d.items():
        new_key = parent_key + sep + str(k) if parent_key else str(k)
        if isinstance(v, dict):
            items.update(flatten_dict(v, parent_key=new_key, sep=sep))
        else:
            items[new_key] = v
    return items


def get_run_tags(config) -> List[str]:
    """Run tags matching the reference's wandb tagging (train.py:243-257):
    dataset, model, views, task, seed, label proportion, plus 'finetuned'
    and the class/regression column when present."""
    views = config.model.views
    views = [views] if isinstance(views, str) else list(views)
    tags = [
        str(config.data.name),
        str(config.model.name),
        *views,
        str(config.task),
        f"seed{config.seed}",
        f"{int(config.data.proportion * 100)}%",
    ]
    if config.model.get("ckpt_path"):
        tags.append("finetuned")
    if config.data.get("class_column"):
        tags.append(str(config.data.class_column))
    if config.data.get("regression_column"):
        tags.append(str(config.data.regression_column))
    return sorted(set(tags))


def _synced_timestamp() -> str:
    """Run timestamp, broadcast from process 0 under multi-host SPMD so every
    process derives the SAME run directory name."""
    import time as _time

    t = int(_time.time())
    try:
        import jax
    except ImportError:  # log module usable without jax (preprocess CLIs)
        return _time.strftime("%Y%m%d_%H%M%S", _time.localtime(t))
    if jax.process_count() > 1:
        # a broadcast failure must propagate: silently falling back to local
        # time would split the run across per-host directories
        import numpy as _np
        from jax.experimental import multihost_utils

        t = int(multihost_utils.broadcast_one_to_all(_np.int64(t)))
    return _time.strftime("%Y%m%d_%H%M%S", _time.localtime(t))


def init_run_dir(
    config,
    tags: Optional[List[str]] = None,
    out_dir: Optional[Union[str, Path]] = None,
) -> Path:
    """Create the run directory and its run record (reference init_wandb,
    log.py:45-76; wandb is unavailable here, so the run record is a local
    run.json carrying what wandb.init would: tags + flattened config).

    Layout: ``<logging.dir>/<timestamp>-<run-name>/`` with ``run.json``
    inside; the config itself is round-tripped separately by the caller
    (config.yaml), mirroring ``OmegaConf.save`` into the wandb ckpt dir.
    """
    if tags is None:
        try:
            tags = get_run_tags(config)
        except (AttributeError, KeyError, TypeError):
            tags = []
    if out_dir is None:
        base = Path(config.logging.dir) if config.get("logging") and config.logging.get("dir") else Path("runs")
        name = "-".join([_synced_timestamp()] + tags[:3])
        out_dir = base / name
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    record = {
        "tags": tags,
        "created": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "config": flatten_dict(config.to_dict() if hasattr(config, "to_dict") else dict(config)),
    }
    with open(out_dir / "run.json", "w") as f:
        json.dump(record, f, indent=2, default=str)
    return out_dir
