"""ACDC SAX segmentation fine-tune (reference: cinema/segmentation/acdc/train.py).

Entry point: ``python -m cinema_tpu.tasks.segmentation.acdc [--config PATH] [k=v ...]``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import pandas as pd

from cinema_tpu.config import Config
from cinema_tpu.data.datasets import EDESSegmentationDataset
from cinema_tpu.data.transforms import get_segmentation_transforms
from cinema_tpu.factory import get_segmentation_model
from cinema_tpu.log import get_logger
from cinema_tpu.tasks.cli import task_main
from cinema_tpu.tasks.segmentation import segmentation_eval_dataloader, segmentation_loss_fn
from cinema_tpu.train.loop import maybe_subset_dataset, run_train

logger = get_logger(__name__)

DEFAULT_CONFIG = Path(__file__).parents[2] / "configs" / "segmentation" / "acdc.yaml"


def load_dataset(config: Config) -> Tuple[EDESSegmentationDataset, EDESSegmentationDataset]:
    """Stratified val split: 2 patients per pathology (reference acdc/train.py:26-51)."""
    data_dir = Path(config.data.dir).expanduser()
    meta_df = pd.read_csv(data_dir / "train_metadata.csv")
    val_pids = meta_df.groupby("pathology").sample(n=2, random_state=0)["pid"].tolist()
    train_meta_df = meta_df[~meta_df["pid"].isin(val_pids)].reset_index(drop=True)
    val_meta_df = meta_df[meta_df["pid"].isin(val_pids)].reset_index(drop=True)
    train_meta_df, val_meta_df = maybe_subset_dataset(config, train_meta_df, val_meta_df)

    train_transform, val_transform = get_segmentation_transforms(config)
    train_dataset = EDESSegmentationDataset(
        data_dir=data_dir / "train", meta_df=train_meta_df, views="sax", transform=train_transform
    )
    val_dataset = EDESSegmentationDataset(
        data_dir=data_dir / "train", meta_df=val_meta_df, views="sax", transform=val_transform
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


def load_pretrained(params, config: Config):
    """MAE -> ConvUNetR transfer from a safetensors checkpoint."""
    from cinema_tpu.bridge.torch_loader import load_pretrain_weights, loaded_freeze_mask
    from cinema_tpu.factory import load_safetensors

    state_dict = load_safetensors(Path(config.model.ckpt_path).expanduser())
    views = [config.model.views] if isinstance(config.model.views, str) else list(config.model.views)
    new_params, loaded = load_pretrain_weights(params, views, state_dict, keep_fusion=False)
    return new_params, loaded_freeze_mask(params, loaded)


def main() -> None:
    task_main(DEFAULT_CONFIG, run)


if __name__ == "__main__":
    main()
