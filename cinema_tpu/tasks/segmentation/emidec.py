"""EMIDEC scar segmentation with grouped-class metrics
(reference: cinema/segmentation/emidec/train.py)."""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Dict, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
import pandas as pd

from cinema_tpu.config import Config
from cinema_tpu.data.datasets import EMIDECDataset
from cinema_tpu.data.transforms import get_segmentation_transforms
from cinema_tpu.factory import get_segmentation_model
from cinema_tpu.metrics import dice_score, get_volumes, hausdorff_distance_95, iou_score
from cinema_tpu.tasks.cli import task_main
from cinema_tpu.tasks.segmentation import segmentation_eval_dataloader, segmentation_loss_fn
from cinema_tpu.tasks.segmentation.acdc import load_pretrained
from cinema_tpu.train.loop import maybe_subset_dataset, run_train

DEFAULT_CONFIG = Path(__file__).parents[2] / "configs" / "segmentation" / "emidec.yaml"


def _grouped_masks(labels: jnp.ndarray) -> jnp.ndarray:
    """EMIDEC class grouping: [bg, cavity, myocardium(>=2), MI(>=3), no-reflow(==4)]
    (reference emidec/train.py:162-180)."""
    return jnp.stack(
        [labels == 0, labels == 1, labels >= 2, labels >= 3, labels == 4],
        axis=-1,
    ).astype(jnp.float32)


def emidec_segmentation_metrics(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    spacing: Sequence[float],
) -> Dict[str, np.ndarray]:
    """Grouped-class dice/iou/HD95/volumes; dice=1 on both-empty
    (reference emidec/train.py:139-220)."""
    labels = labels.astype(jnp.int32)
    pred_labels = jnp.argmax(logits, axis=-1)
    true_mask = _grouped_masks(labels)
    pred_mask = _grouped_masks(pred_labels)

    dice = dice_score(pred_mask, true_mask)
    # EMIDEC convention: both empty -> dice 1 (ignore_empty=False)
    axes = tuple(range(1, true_mask.ndim - 1))
    both_empty = (jnp.sum(true_mask, axes) + jnp.sum(pred_mask, axes)) == 0
    dice = jnp.where(both_empty, 1.0, dice)
    iou = iou_score(pred_mask, true_mask)
    hd95 = hausdorff_distance_95(np.asarray(pred_mask), np.asarray(true_mask), spacing)
    true_volumes = get_volumes(true_mask, spacing)
    pred_volumes = get_volumes(pred_mask, spacing)

    metrics: Dict[str, np.ndarray] = {}
    for cls in range(1, 5):
        metrics[f"class_{cls}_dice_score"] = np.asarray(dice[:, cls])
        metrics[f"class_{cls}_iou_score"] = np.asarray(iou[:, cls])
        metrics[f"class_{cls}_hausdorff_distance_95"] = hd95[:, cls - 1]
        metrics[f"class_{cls}_true_volume"] = np.asarray(true_volumes[:, cls])
        metrics[f"class_{cls}_pred_volume"] = np.asarray(pred_volumes[:, cls])
    metrics["mean_dice_score"] = np.nanmean(np.asarray(dice[:, 1:]), axis=-1)
    metrics["mean_iou_score"] = np.nanmean(np.asarray(iou[:, 1:]), axis=-1)
    metrics["mean_hausdorff_distance_95"] = np.nanmean(hd95, axis=-1)
    return metrics


def load_dataset(config: Config) -> Tuple[EMIDECDataset, EMIDECDataset]:
    """Val split: first case per pathology group prefix (reference emidec/train.py)."""
    data_dir = Path(config.data.dir).expanduser()
    meta_df = pd.read_csv(data_dir / "train_metadata.csv")
    # Case P = pathological, N = normal: stratify a small val split
    meta_df["group"] = meta_df["pid"].astype(str).str[:6]
    val_meta_df = meta_df.groupby("group").sample(n=2, random_state=0)
    train_meta_df = meta_df.loc[~meta_df.index.isin(val_meta_df.index)].reset_index(drop=True)
    val_meta_df = val_meta_df.reset_index(drop=True)
    train_meta_df, val_meta_df = maybe_subset_dataset(config, train_meta_df, val_meta_df)
    train_transform, val_transform = get_segmentation_transforms(config)
    train_dataset = EMIDECDataset(data_dir / "train", train_meta_df, transform=train_transform)
    val_dataset = EMIDECDataset(data_dir / "train", val_meta_df, transform=val_transform)
    return train_dataset, val_dataset


emidec_eval_dataloader = partial(segmentation_eval_dataloader, metrics_fn=emidec_segmentation_metrics)


def run(config: Config) -> None:
    run_train(
        config=config,
        load_dataset=load_dataset,
        get_model_fn=get_segmentation_model,
        loss_fn=segmentation_loss_fn,
        eval_dataloader_fn=lambda m, p, d, c: emidec_eval_dataloader(m, p, d, c),
        load_pretrained_fn=load_pretrained,
    )


def main() -> None:
    task_main(DEFAULT_CONFIG, run)


if __name__ == "__main__":
    main()
