"""Landmark coordinate regression (reference: cinema/regression/landmark/train.py)."""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from cinema_tpu.config import Config
from cinema_tpu.data.datasets import LandmarkRegressionDataset
from cinema_tpu.losses import landmark_coordinate_loss
from cinema_tpu.tasks.classification import get_classification_model
from cinema_tpu.tasks.cli import task_main
from cinema_tpu.tasks.segmentation.acdc import load_pretrained
from cinema_tpu.train.loop import maybe_subset_dataset, run_train
from cinema_tpu.train.state import train_apply

DEFAULT_CONFIG = Path(__file__).parents[2] / "configs" / "regression" / "landmark.yaml"


def _scales(batch: Dict[str, jnp.ndarray], view: str) -> jnp.ndarray:
    w = batch[f"{view}_width"].astype(jnp.float32)
    h = batch[f"{view}_height"].astype(jnp.float32)
    return jnp.stack([w, h, w, h, w, h], axis=-1)


def landmark_regression_loss_fn(model, params, batch, rng):
    """Wing(coords)+Wing(relative distances) in image units
    (reference regression/landmark/train.py:108-152)."""
    views = sorted({k[: -len("_image")] for k in batch if k.endswith("_image")})
    view = views[0]
    preds, model_state = train_apply(model, params, {view: batch[f"{view}_image"]}, rng)
    scales = _scales(batch, view)
    loss, metrics = landmark_coordinate_loss(preds * scales, batch["label"] * scales)
    return loss, (metrics, model_state)


def landmark_regression_eval_dataloader(
    model: Any,
    params: Any,
    dataloader: Any,
    config: Config,
) -> Dict[str, float]:
    views = [config.model.views] if isinstance(config.model.views, str) else list(config.model.views)
    view = views[0]
    forward = jax.jit(lambda p, imgs: model.apply(p, imgs))
    errors, dists = [], []
    for batch in dataloader:
        preds = np.asarray(forward(params, {view: jnp.asarray(batch[f"{view}_image"])}))
        scales = np.asarray(_scales({k: jnp.asarray(v) for k, v in batch.items() if not isinstance(v, list)}, view))
        pred_coords = preds * scales
        true_coords = np.asarray(batch["label"]) * scales
        errors.append(np.abs(pred_coords - true_coords).mean())
        diff = (pred_coords - true_coords).reshape(-1, 3, 2)
        dists.append(np.sqrt((diff**2).sum(-1)).mean())
    return {
        "mean_coordinate_error": float(np.mean(errors)),
        "mean_landmark_distance": float(np.mean(dists)),
    }


def load_dataset(config: Config) -> Tuple[LandmarkRegressionDataset, LandmarkRegressionDataset]:
    data_dir = Path(config.data.dir).expanduser()
    view = config.model.views if isinstance(config.model.views, str) else config.model.views[0]
    train_meta_df = pd.read_csv(data_dir / "train_metadata.csv")
    val_meta_df = pd.read_csv(data_dir / "val_metadata.csv")
    train_meta_df, val_meta_df = maybe_subset_dataset(config, train_meta_df, val_meta_df)
    train_dataset = LandmarkRegressionDataset(data_dir, train_meta_df, view)
    val_dataset = LandmarkRegressionDataset(data_dir, val_meta_df, view)
    return train_dataset, val_dataset


def run(config: Config) -> None:
    run_train(
        config=config,
        load_dataset=load_dataset,
        get_model_fn=get_classification_model,
        loss_fn=landmark_regression_loss_fn,
        eval_dataloader_fn=landmark_regression_eval_dataloader,
        load_pretrained_fn=load_pretrained,
    )


def main() -> None:
    task_main(DEFAULT_CONFIG, run)


if __name__ == "__main__":
    main()
