"""Shared segmentation training/eval utilities (reference: cinema/segmentation/train.py)."""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cinema_tpu.config import Config
from cinema_tpu.factory import get_segmentation_model  # noqa: F401  (re-export)
from cinema_tpu.inference import sliding_window_forward
from cinema_tpu.log import get_logger
from cinema_tpu.losses import segmentation_loss as _view_seg_loss
from cinema_tpu.metrics import segmentation_metrics
from cinema_tpu.ops.window import crop_start
from cinema_tpu.train.state import train_apply

logger = get_logger(__name__)


def _views_from_config(config: Config) -> List[str]:
    views = config.model.views
    return [views] if isinstance(views, str) else list(views)


def segmentation_loss_fn(
    model: Any,
    params: Any,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    view_loss_fn: Callable = _view_seg_loss,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Multi-view segmentation loss (reference segmentation/train.py:106-145).

    Batch carries ``{view}_image`` (b, *s, ch) and ``{view}_label`` (b, *s).
    """
    views = sorted({k[: -len("_image")] for k in batch if k.endswith("_image")})
    image_dict = {v: batch[f"{v}_image"] for v in views}
    label_dict = {v: batch[f"{v}_label"] for v in views}
    logits_dict, model_state = train_apply(model, params, image_dict, rng)

    metrics: Dict[str, jnp.ndarray] = {}
    losses = []
    for view, logits in logits_dict.items():
        loss_view, metrics_view = view_loss_fn(logits, label_dict[view])
        losses.append(loss_view)
        metrics.update({f"{view}_{k}": v for k, v in metrics_view.items()})
        metrics[f"{view}_loss"] = loss_view
    loss = sum(losses) / len(logits_dict)
    metrics["loss"] = loss
    return loss, (metrics, model_state)


def make_seg_forward(model: Any) -> Callable:
    """Jitted batched forward with params as an explicit argument."""
    return jax.jit(lambda p, imgs: model.apply(p, imgs))


def segmentation_eval_batch(
    forward: Callable,
    params: Any,
    batch: Dict[str, np.ndarray],
    patch_size_dict: Dict[str, tuple],
    spacing_dict: Dict[str, tuple],
    metrics_fn: Optional[Callable] = segmentation_metrics,
    aggregation: str = "softmax",
    z_bucket: Optional[int] = None,
    per_sample: bool = False,
) -> Tuple[Dict[str, jnp.ndarray], Any]:
    """Evaluate one study batch: sliding window -> crop padding -> metrics
    (reference segmentation/train.py:289-358).

    z_bucket: when set, 3D views are zero-padded so the slice count is a
    multiple of the bucket — studies in the same bucket share ONE compiled
    sliding-window program instead of recompiling per distinct slice count
    (minutes each on TPU). Predictions are cropped back before metrics;
    window positions near the z end shift slightly vs the unbucketed grid
    (sub-0.1%-Dice-level boundary-averaging drift). Pass None for the
    reference's exact per-shape grids.

    per_sample: the batch dim may carry several frames of ONE study (same
    width/height/n_slices — cine eval batches frames into one forward where
    the reference loops batch=1, segmentation/train.py:204-210); returns a
    LIST of per-frame metric dicts instead of scalars for frame 0.
    """
    views = list(patch_size_dict.keys())
    image_dict = {v: jnp.asarray(batch[f"{v}_image"]) for v in views}
    if z_bucket:
        for v in views:
            if len(patch_size_dict[v]) != 3:
                continue
            z = image_dict[v].shape[3]
            z_pad = max(patch_size_dict[v][2], -(-z // z_bucket) * z_bucket)
            if z_pad != z:
                image_dict[v] = jnp.pad(
                    image_dict[v], ((0, 0), (0, 0), (0, 0), (0, z_pad - z), (0, 0))
                )
    logits_dict = sliding_window_forward(
        lambda imgs: forward(params, imgs), image_dict, patch_size_dict, aggregation
    )

    def crop_to_original(x: jnp.ndarray, view: str) -> jnp.ndarray:
        width = int(np.asarray(batch[f"{view}_width"]).reshape(-1)[0])
        height = int(np.asarray(batch[f"{view}_height"]).reshape(-1)[0])
        if len(patch_size_dict[view]) == 3:
            n_slices = int(np.asarray(batch["n_slices"]).reshape(-1)[0])
            return crop_start(x, (x.shape[0], width, height, n_slices, x.shape[-1]))
        return crop_start(x, (x.shape[0], width, height, x.shape[-1]))

    logits_dict = {v: crop_to_original(logits_dict[v], v) for v in views}
    if metrics_fn is None or f"{views[0]}_label" not in batch:
        return logits_dict, ([] if per_sample else {})

    per_view: Dict[str, Dict[str, np.ndarray]] = {}
    metric_keys: List[str] = []
    for view in views:
        label = jnp.asarray(batch[f"{view}_label"])
        label = crop_start(label, logits_dict[view].shape[:-1])
        metrics_view = metrics_fn(logits_dict[view], label, spacing_dict[view])
        metric_keys = list(metrics_view.keys())
        per_view[view] = {
            k: np.asarray(v, dtype=np.float64).reshape(-1) for k, v in metrics_view.items()
        }

    def row(i: int) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for view in views:
            for k, v in per_view[view].items():
                out[f"{view}_{k}"] = float(v[i])
        for k in metric_keys:
            out[k] = float(np.mean([out[f"{view}_{k}"] for view in views]))
        return out

    if per_sample:
        n = next(iter(logits_dict.values())).shape[0]
        return logits_dict, [row(i) for i in range(n)]
    return logits_dict, row(0)


def patch_and_spacing_dicts(config: Config) -> Tuple[Dict[str, tuple], Dict[str, tuple]]:
    views = _views_from_config(config)

    def view_cfg(v):
        if v == "sax":
            return config.data.sax
        if "lax" in config.data:
            return config.data.lax
        return config.data[v]

    patch = {v: tuple(view_cfg(v).patch_size) for v in views}
    spacing = {v: tuple(view_cfg(v).spacing) for v in views}
    return patch, spacing


def segmentation_eval_dataloader(
    model: Any,
    params: Any,
    dataloader: Any,
    config: Config,
    metrics_fn: Callable = segmentation_metrics,
    aggregation: str = "softmax",
) -> Dict[str, float]:
    """Mean metrics over a batch-1 loader (reference segmentation/train.py:361-400)."""
    patch_size_dict, spacing_dict = patch_and_spacing_dicts(config)
    z_bucket = config.get("eval", {}).get("z_bucket", 4)
    forward = make_seg_forward(model)
    all_metrics: Dict[str, List[float]] = {}
    for batch in dataloader:
        _, metrics = segmentation_eval_batch(
            forward, params, batch, patch_size_dict, spacing_dict, metrics_fn, aggregation,
            z_bucket=z_bucket,
        )
        for k, v in metrics.items():
            all_metrics.setdefault(k, []).append(v)
    return {k: float(np.nanmean(v)) for k, v in all_metrics.items()}
