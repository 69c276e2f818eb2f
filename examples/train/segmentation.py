"""Self-contained SAX segmentation fine-tune tutorial (reference: cinema/examples/train/segmentation.py).

Minimal end-to-end loop without the run_train harness — the shortest path
to training a ConvUNetR on your own processed data.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))  # repo root, for non-installed use


import argparse
from pathlib import Path


from cinema_tpu.config import apply_overrides, load_config
from cinema_tpu.tasks.segmentation.acdc import run

CONFIG = Path(__file__).parents[2] / "cinema_tpu" / "configs" / "segmentation/acdc.yaml"


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", required=True, type=Path)
    parser.add_argument("--n_epochs", type=int, default=10)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()
    config = load_config(CONFIG)
    config = apply_overrides(
        config,
        [f"data.dir={args.data_dir}", f"train.n_epochs={args.n_epochs}"] + args.overrides,
    )
    run(config)


if __name__ == "__main__":
    main()
