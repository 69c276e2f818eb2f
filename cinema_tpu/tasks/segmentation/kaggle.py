"""Kaggle second-annual-DSB video EF evaluation from per-frame segmentation
(reference: cinema/segmentation/kaggle/eval.py).

Label-free: segment every cine frame, take LV volume max/min as EDV/ESV,
derive EF, compare with the dataset's ground-truth volumes. All frames of a
video run as ONE batched forward (the reference loops frames serially).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from cinema_tpu.config import Config
from cinema_tpu.constants import LV_LABEL
from cinema_tpu.data.datasets import BatchLoader, KaggleVideoDataset
from cinema_tpu.data.transforms import Compose, ScaleIntensityd, SpatialPadd
from cinema_tpu.metrics import ejection_fraction, get_ef_region
from cinema_tpu.log import get_logger

logger = get_logger(__name__)

MAX_N_FRAMES = 30  # reference kaggle/eval.py MAX_N_FRAMES


VIDEO_CHUNK = 8  # fills the bf16 sublane tile; bounds decoder activations


def video_lv_volumes(
    forward,
    params: Any,
    video: jnp.ndarray,
    spacing,
    n_frames: int,
) -> np.ndarray:
    """Per-frame LV volume (ml) from batched segmentation.

    Frames run in chunks of 8: the decoder's finest tensors keep batch in
    sublanes (chunk 10 pads to 16 — measured 24 vs 31 frames/s on v5e) and
    one 50-frame forward exceeds device memory at base scale.

    Args:
        video: (t, *spatial, 1) padded frames.
        n_frames: number of valid frames.
    """
    video = np.asarray(video)
    n_pad = (-len(video)) % VIDEO_CHUNK
    if n_pad:
        video = np.concatenate([video, video[:n_pad]], axis=0)
    preds = []
    for i in range(0, len(video), VIDEO_CHUNK):
        logits = forward(params, {"sax": jnp.asarray(video[i : i + VIDEO_CHUNK])})["sax"]
        preds.append(np.asarray(jnp.argmax(logits, axis=-1)))
    pred = np.concatenate(preds, axis=0)  # (t, *spatial)
    voxel_ml = float(np.prod(np.asarray(spacing))) / 1000.0
    volumes = (pred == LV_LABEL).reshape(pred.shape[0], -1).sum(axis=1) * voxel_ml
    return volumes[:n_frames]


def evaluate_kaggle(
    model: Any,
    params: Any,
    config: Config,
    split: str = "validate",
    max_n_samples: int = -1,
) -> Dict[str, float]:
    """EF MAE/RMSE + region accuracy over the Kaggle split."""
    data_dir = Path(config.data.dir).expanduser()
    view = config.model.views
    if not isinstance(view, str):
        raise TypeError("Only support one view for evaluation.")
    meta_df = pd.read_csv(data_dir / f"{split}_metadata.csv")
    if max_n_samples > 0:
        meta_df = meta_df.sample(n=min(max_n_samples, len(meta_df)), random_state=0)
    patch_size = tuple(config.data.sax.patch_size)
    spacing = tuple(config.data.sax.spacing)
    transform = Compose(
        [ScaleIntensityd(f"{view}_image"), SpatialPadd(f"{view}_image", patch_size)]
    )
    dataset = KaggleVideoDataset(
        data_dir / split, meta_df, view=view, max_n_frames=MAX_N_FRAMES, transform=transform
    )
    loader = BatchLoader(dataset, batch_size=1, n_workers=config.train.get("n_workers", 4))
    forward = jax.jit(lambda p, imgs: model.apply(p, imgs))

    rows = []
    for batch in loader:
        video = jnp.asarray(batch[f"{view}_image"][0])  # (t, *spatial, 1)
        n_frames = min(int(batch["n_frames"][0]), MAX_N_FRAMES)
        volumes = video_lv_volumes(forward, params, video, spacing, n_frames)
        pred_ef = float(ejection_fraction(volumes.max(), max(volumes.min(), 1e-6)))
        true_ef = float(batch["ef"][0])
        rows.append(
            {
                "pid": batch["pid"][0],
                "pred_ef": pred_ef,
                "true_ef": true_ef,
                "pred_edv": float(volumes.max()),
                "pred_esv": float(volumes.min()),
                "true_edv": float(batch["edv"][0]),
                "true_esv": float(batch["esv"][0]),
            }
        )
    df = pd.DataFrame(rows)
    err = df["pred_ef"] - df["true_ef"]
    region_acc = float(
        np.mean(df["pred_ef"].map(get_ef_region) == df["true_ef"].map(get_ef_region))
    )
    return {
        "ef_mae": float(err.abs().mean()),
        "ef_rmse": float(np.sqrt((err**2).mean())),
        "ef_region_accuracy": region_acc,
        "n_samples": float(len(df)),
    }
