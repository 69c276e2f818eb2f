"""Shared CLI plumbing for task entry points.

Replaces hydra: ``<entrypoint> [--config PATH] [key=value ...]`` with the
same dotted-override syntax.
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Callable, Optional

from cinema_tpu.config import Config, apply_overrides, load_config


def task_main(default_config: Path, run: Callable[[Config], None], argv: Optional[list] = None) -> None:
    """Parse --config + dotted overrides and invoke the task runner."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=Path, default=default_config)
    parser.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    args = parser.parse_args(argv)
    config = load_config(args.config)
    if args.overrides:
        config = apply_overrides(config, args.overrides)
    run(config)
