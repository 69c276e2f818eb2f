"""M&Ms EF/age regression (reference: cinema/regression/mnms/train.py)."""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import pandas as pd

from cinema_tpu.config import Config
from cinema_tpu.data.datasets import EDESRegressionDataset
from cinema_tpu.data.transforms import get_segmentation_transforms
from cinema_tpu.tasks.cli import task_main
from cinema_tpu.tasks.regression import (
    get_regression_model,
    regression_eval_dataloader,
    regression_loss_fn,
)
from cinema_tpu.tasks.segmentation.acdc import load_pretrained
from cinema_tpu.train.loop import maybe_subset_dataset, run_train

DEFAULT_CONFIG = Path(__file__).parents[2] / "configs" / "regression" / "mnms.yaml"


def load_dataset(config: Config) -> Tuple[EDESRegressionDataset, EDESRegressionDataset]:
    data_dir = Path(config.data.dir).expanduser()
    reg_col = config.data.regression_column
    reg_mean = float(config.data[reg_col]["mean"])
    reg_std = float(config.data[reg_col]["std"])
    train_meta_df = pd.read_csv(data_dir / "train_metadata.csv", dtype={"pid": str})
    val_meta_df = pd.read_csv(data_dir / "val_metadata.csv", dtype={"pid": str})
    train_meta_df = train_meta_df.dropna(subset=[reg_col]).reset_index(drop=True)
    val_meta_df = val_meta_df.dropna(subset=[reg_col]).reset_index(drop=True)
    train_meta_df, val_meta_df = maybe_subset_dataset(config, train_meta_df, val_meta_df)
    train_transform, val_transform = get_segmentation_transforms(config)
    views = config.model.views
    train_dataset = EDESRegressionDataset(
        data_dir=data_dir / "train", meta_df=train_meta_df, reg_col=reg_col,
        reg_mean=reg_mean, reg_std=reg_std, views=views, transform=train_transform,
    )
    val_dataset = EDESRegressionDataset(
        data_dir=data_dir / "val", meta_df=val_meta_df, reg_col=reg_col,
        reg_mean=reg_mean, reg_std=reg_std, views=views, transform=val_transform,
    )
    return train_dataset, val_dataset


def run(config: Config) -> None:
    run_train(
        config=config,
        load_dataset=load_dataset,
        get_model_fn=get_regression_model,
        loss_fn=regression_loss_fn,
        eval_dataloader_fn=regression_eval_dataloader,
        load_pretrained_fn=load_pretrained,
    )


def main() -> None:
    task_main(DEFAULT_CONFIG, run)


if __name__ == "__main__":
    main()
