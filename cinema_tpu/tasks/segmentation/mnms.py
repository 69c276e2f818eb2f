"""M&Ms segmentation fine-tune (reference: cinema/segmentation/mnms/train.py)."""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import pandas as pd

from cinema_tpu.config import Config
from cinema_tpu.data.datasets import EDESSegmentationDataset
from cinema_tpu.data.transforms import get_segmentation_transforms
from cinema_tpu.factory import get_segmentation_model
from cinema_tpu.tasks.cli import task_main
from cinema_tpu.tasks.segmentation import segmentation_eval_dataloader, segmentation_loss_fn
from cinema_tpu.tasks.segmentation.acdc import load_pretrained
from cinema_tpu.train.loop import maybe_subset_dataset, run_train

DEFAULT_CONFIG = Path(__file__).parents[2] / "configs" / "segmentation" / "mnms.yaml"


def load_dataset(config: Config) -> Tuple[EDESSegmentationDataset, EDESSegmentationDataset]:
    """Pre-split train/val CSVs (reference mnms/train.py load_dataset)."""
    data_dir = Path(config.data.dir).expanduser()
    train_meta_df = pd.read_csv(data_dir / "train_metadata.csv", dtype={"pid": str})
    val_meta_df = pd.read_csv(data_dir / "val_metadata.csv", dtype={"pid": str})
    train_meta_df, val_meta_df = maybe_subset_dataset(config, train_meta_df, val_meta_df)
    train_transform, val_transform = get_segmentation_transforms(config)
    views = config.model.views
    train_dataset = EDESSegmentationDataset(
        data_dir=data_dir / "train", meta_df=train_meta_df, views=views, transform=train_transform
    )
    val_dataset = EDESSegmentationDataset(
        data_dir=data_dir / "val", meta_df=val_meta_df, views=views, transform=val_transform
    )
    return train_dataset, val_dataset


def run(config: Config) -> None:
    run_train(
        config=config,
        load_dataset=load_dataset,
        get_model_fn=get_segmentation_model,
        loss_fn=segmentation_loss_fn,
        eval_dataloader_fn=segmentation_eval_dataloader,
        load_pretrained_fn=load_pretrained,
    )


def main() -> None:
    task_main(DEFAULT_CONFIG, run)


if __name__ == "__main__":
    main()
