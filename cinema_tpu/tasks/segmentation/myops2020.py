"""MyoPS2020 multi-sequence scar segmentation
(reference: cinema/segmentation/myops2020/train.py, eval.py)."""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
import pandas as pd

from cinema_tpu.config import Config
from cinema_tpu.data.datasets import MYOPS2020Dataset
from cinema_tpu.data.transforms import get_segmentation_transforms
from cinema_tpu.factory import get_segmentation_model
from cinema_tpu.metrics import dice_score, hausdorff_distance_95, iou_score
from cinema_tpu.tasks.cli import task_main
from cinema_tpu.tasks.segmentation import segmentation_eval_dataloader, segmentation_loss_fn
from cinema_tpu.tasks.segmentation.acdc import load_pretrained
from cinema_tpu.train.loop import maybe_subset_dataset, run_train

DEFAULT_CONFIG = Path(__file__).parents[2] / "configs" / "segmentation" / "myops2020.yaml"


def _grouped_masks(labels: jnp.ndarray) -> jnp.ndarray:
    """MyoPS grouping: [bg, myocardium(>=1), edema+scar(>=2), scar(>=3)]
    (reference myops2020/eval.py label regrouping)."""
    return jnp.stack(
        [labels == 0, labels >= 1, labels >= 2, labels >= 3],
        axis=-1,
    ).astype(jnp.float32)


def myops2020_segmentation_metrics(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    spacing: Sequence[float],
) -> Dict[str, np.ndarray]:
    labels = labels.astype(jnp.int32)
    pred_labels = jnp.argmax(logits, axis=-1)
    true_mask = _grouped_masks(labels)
    pred_mask = _grouped_masks(pred_labels)
    dice = dice_score(pred_mask, true_mask)
    iou = iou_score(pred_mask, true_mask)
    hd95 = hausdorff_distance_95(np.asarray(pred_mask), np.asarray(true_mask), spacing)
    metrics: Dict[str, np.ndarray] = {}
    for cls in range(1, true_mask.shape[-1]):
        metrics[f"class_{cls}_dice_score"] = np.asarray(dice[:, cls])
        metrics[f"class_{cls}_iou_score"] = np.asarray(iou[:, cls])
        metrics[f"class_{cls}_hausdorff_distance_95"] = hd95[:, cls - 1]
    metrics["mean_dice_score"] = np.nanmean(np.asarray(dice[:, 1:]), axis=-1)
    metrics["mean_iou_score"] = np.nanmean(np.asarray(iou[:, 1:]), axis=-1)
    metrics["mean_hausdorff_distance_95"] = np.nanmean(hd95, axis=-1)
    return metrics


def load_dataset(config: Config) -> Tuple[MYOPS2020Dataset, MYOPS2020Dataset]:
    data_dir = Path(config.data.dir).expanduser()
    meta_df = pd.read_csv(data_dir / "train_metadata.csv")
    val_meta_df = meta_df.sample(n=max(2, len(meta_df) // 10), random_state=0)
    train_meta_df = meta_df.loc[~meta_df.index.isin(val_meta_df.index)].reset_index(drop=True)
    val_meta_df = val_meta_df.reset_index(drop=True)
    train_meta_df, val_meta_df = maybe_subset_dataset(config, train_meta_df, val_meta_df)
    train_transform, val_transform = get_segmentation_transforms(config)
    train_dataset = MYOPS2020Dataset(data_dir / "train", train_meta_df, transform=train_transform)
    val_dataset = MYOPS2020Dataset(data_dir / "train", val_meta_df, transform=val_transform)
    return train_dataset, val_dataset


myops2020_eval_dataloader = partial(
    segmentation_eval_dataloader, metrics_fn=myops2020_segmentation_metrics
)


def run(config: Config) -> None:
    run_train(
        config=config,
        load_dataset=load_dataset,
        get_model_fn=get_segmentation_model,
        loss_fn=segmentation_loss_fn,
        eval_dataloader_fn=lambda m, p, d, c: myops2020_eval_dataloader(m, p, d, c),
        load_pretrained_fn=load_pretrained,
    )


def main() -> None:
    task_main(DEFAULT_CONFIG, run)


if __name__ == "__main__":
    main()
