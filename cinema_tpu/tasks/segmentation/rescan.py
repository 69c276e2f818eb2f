"""Rescan (test-retest) cine segmentation + label-free EF reproducibility
(reference: cinema/segmentation/rescan/train.py, ef_eval.py)."""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Tuple

import numpy as np
import pandas as pd

from cinema_tpu.config import Config
from cinema_tpu.data.datasets import CineSegmentationDataset
from cinema_tpu.data.transforms import get_segmentation_transforms
from cinema_tpu.factory import get_segmentation_model
from cinema_tpu.metrics import coefficient_of_variance, ejection_fraction
from cinema_tpu.tasks.cli import task_main
from cinema_tpu.tasks.segmentation import segmentation_eval_dataloader, segmentation_loss_fn
from cinema_tpu.tasks.segmentation.acdc import load_pretrained
from cinema_tpu.train.loop import maybe_subset_dataset, run_train

DEFAULT_CONFIG = Path(__file__).parents[2] / "configs" / "segmentation" / "rescan.yaml"


def load_dataset(config: Config) -> Tuple[CineSegmentationDataset, CineSegmentationDataset]:
    """Val split: one study per group prefix (reference rescan/train.py)."""
    data_dir = Path(config.data.dir).expanduser()
    train_meta_df = pd.read_csv(data_dir / "train_metadata.csv")
    train_meta_df["group"] = train_meta_df["pid"].astype(str).apply(lambda x: x.split("/")[0])
    train_meta_df = train_meta_df.sort_values("pid").reset_index(drop=True)
    val_meta_df = train_meta_df.drop_duplicates("group").copy()
    train_meta_df = train_meta_df.loc[~train_meta_df.index.isin(val_meta_df.index)].reset_index(drop=True)
    val_meta_df = val_meta_df.reset_index(drop=True)
    train_meta_df, val_meta_df = maybe_subset_dataset(config, train_meta_df, val_meta_df)
    train_transform, val_transform = get_segmentation_transforms(config)
    train_dataset = CineSegmentationDataset(
        data_dir / "train", train_meta_df, views=config.model.views, transform=train_transform
    )
    val_dataset = CineSegmentationDataset(
        data_dir / "train", val_meta_df, views=config.model.views, transform=val_transform
    )
    return train_dataset, val_dataset


def ef_from_volumes(lv_volumes: np.ndarray) -> float:
    """Label-free EF: max frame volume = EDV, min = ESV
    (reference rescan/ef_eval.py:58-216)."""
    edv = float(np.max(lv_volumes))
    esv = float(np.min(lv_volumes))
    return float(ejection_fraction(edv, esv))


def test_retest_reproducibility(ef_scan: np.ndarray, ef_rescan: np.ndarray) -> Dict[str, float]:
    """Scan-rescan EF reproducibility metrics (reference rescan/ef_eval.py)."""
    return {
        "ef_mae": float(np.mean(np.abs(ef_scan - ef_rescan))),
        "ef_rmse": float(np.sqrt(np.mean((ef_scan - ef_rescan) ** 2))),
        "ef_cv": coefficient_of_variance(ef_scan, ef_rescan),
    }


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
