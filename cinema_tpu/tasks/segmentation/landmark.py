"""Landmark heatmap detection (reference: cinema/segmentation/landmark/train.py)."""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from cinema_tpu.config import Config
from cinema_tpu.data.datasets import LandmarkDetectionDataset
from cinema_tpu.factory import get_segmentation_model
from cinema_tpu.inference import sliding_window_forward
from cinema_tpu.losses import landmark_heatmap_loss
from cinema_tpu.metrics import heatmap_argmax
from cinema_tpu.ops.window import crop_start
from cinema_tpu.tasks.cli import task_main
from cinema_tpu.tasks.segmentation.acdc import load_pretrained
from cinema_tpu.train.loop import maybe_subset_dataset, run_train
from cinema_tpu.train.state import train_apply

DEFAULT_CONFIG = Path(__file__).parents[2] / "configs" / "segmentation" / "landmark.yaml"


def landmark_loss_fn(model, params, batch, rng):
    """Independent-channel Dice+BCE on heatmaps
    (reference segmentation/landmark/train.py:109-132)."""
    views = sorted({k[: -len("_image")] for k in batch if k.endswith("_image")})
    image_dict = {v: batch[f"{v}_image"] for v in views}
    logits_dict, model_state = train_apply(model, params, image_dict, rng)
    losses, metrics = [], {}
    for view, logits in logits_dict.items():
        loss_view, m = landmark_heatmap_loss(logits, batch[f"{view}_label"])
        losses.append(loss_view)
        metrics.update({f"{view}_{k}": v for k, v in m.items()})
    loss = sum(losses) / len(losses)
    metrics["loss"] = loss
    return loss, (metrics, model_state)


def landmark_eval_dataloader(
    model: Any,
    params: Any,
    dataloader: Any,
    config: Config,
) -> Dict[str, float]:
    """Sigmoid-space sliding window -> argmax coords -> pixel error
    (reference segmentation/landmark/train.py:135-260)."""
    views = [config.model.views] if isinstance(config.model.views, str) else list(config.model.views)
    view = views[0]
    patch_size = tuple(
        (config.data.sax if view == "sax" else config.data.lax).patch_size
    )
    forward = jax.jit(lambda p, imgs: model.apply(p, imgs))
    errors, dists = [], []
    for batch in dataloader:
        image = jnp.asarray(batch[f"{view}_image"])
        logits = sliding_window_forward(
            lambda imgs: forward(params, imgs), {view: image}, {view: patch_size}, "sigmoid"
        )[view]
        width = int(np.asarray(batch[f"{view}_width"]).reshape(-1)[0])
        height = int(np.asarray(batch[f"{view}_height"]).reshape(-1)[0])
        logits = crop_start(logits, (1, width, height, logits.shape[-1]))
        label = crop_start(jnp.asarray(batch[f"{view}_label"]), (1, width, height, 3))
        pred_coords = np.asarray(heatmap_argmax(logits))
        true_coords = np.asarray(heatmap_argmax(label))
        err = np.abs(pred_coords - true_coords).astype(np.float64)
        errors.append(err.mean())
        # euclidean distance per landmark
        diff = (pred_coords - true_coords).reshape(-1, 3, 2)
        dists.append(np.sqrt((diff**2).sum(-1)).mean())
    return {
        "mean_coordinate_error": float(np.mean(errors)),
        "mean_landmark_distance": float(np.mean(dists)),
    }


def load_dataset(config: Config) -> Tuple[LandmarkDetectionDataset, LandmarkDetectionDataset]:
    data_dir = Path(config.data.dir).expanduser()
    view = config.model.views if isinstance(config.model.views, str) else config.model.views[0]
    train_meta_df = pd.read_csv(data_dir / "train_metadata.csv")
    val_meta_df = pd.read_csv(data_dir / "val_metadata.csv")
    train_meta_df, val_meta_df = maybe_subset_dataset(config, train_meta_df, val_meta_df)
    train_dataset = LandmarkDetectionDataset(data_dir, train_meta_df, view)
    val_dataset = LandmarkDetectionDataset(data_dir, val_meta_df, view)
    return train_dataset, val_dataset


def run(config: Config) -> None:
    run_train(
        config=config,
        load_dataset=load_dataset,
        get_model_fn=get_segmentation_model,
        loss_fn=landmark_loss_fn,
        eval_dataloader_fn=landmark_eval_dataloader,
        load_pretrained_fn=load_pretrained,
    )


def main() -> None:
    task_main(DEFAULT_CONFIG, run)


if __name__ == "__main__":
    main()
