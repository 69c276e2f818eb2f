"""Evaluation metrics (reference: cinema/metric.py + the MONAI/sklearn calls
in cinema/segmentation/train.py:224-286 and cinema/classification/train.py:183-295).

Device-friendly metrics (dice/iou/stability/volumes/soft-argmax) are pure
jnp and jit-able; combinatorial/host metrics (HD95, AUC/MCC/F1) run on host
(scipy/sklearn) exactly like the reference delegates to MONAI/sklearn.
"""

from __future__ import annotations

from typing import Dict, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from cinema_tpu.constants import NORMAL_EF, REDUCED_EF

ArrayLike = Union[jnp.ndarray, np.ndarray, float]


def one_hot(labels: jnp.ndarray, n_classes: int) -> jnp.ndarray:
    """One-hot along a new LAST axis: (batch, ...) -> (batch, ..., n_classes)."""
    return jax.nn.one_hot(labels, n_classes, dtype=jnp.float32)


def dice_score(pred_mask: jnp.ndarray, true_mask: jnp.ndarray) -> jnp.ndarray:
    """Per-class Dice on one-hot masks, channels-last.

    Args:
        pred_mask/true_mask: (batch, *spatial, n_classes) in {0,1}.

    Returns:
        (batch, n_classes); NaN where the class is absent in both.
    """
    axes = tuple(range(1, pred_mask.ndim - 1))
    inter = jnp.sum(pred_mask * true_mask, axis=axes)
    denom = jnp.sum(pred_mask, axis=axes) + jnp.sum(true_mask, axis=axes)
    return jnp.where(denom > 0, 2.0 * inter / denom, jnp.nan)


def iou_score(pred_mask: jnp.ndarray, true_mask: jnp.ndarray) -> jnp.ndarray:
    """Per-class IoU on one-hot masks (batch, *spatial, n_classes)."""
    axes = tuple(range(1, pred_mask.ndim - 1))
    inter = jnp.sum(pred_mask * true_mask, axis=axes)
    union = jnp.sum(jnp.maximum(pred_mask, true_mask), axis=axes)
    return jnp.where(union > 0, inter / union, jnp.nan)


def stability_score(
    logits: jnp.ndarray,
    threshold: float = 0.0,
    threshold_offset: float = 1.0,
) -> jnp.ndarray:
    """SAM-style prediction stability (reference metric.py:19-42).

    Args:
        logits: (batch, *spatial, n_classes) channels-last.

    Returns:
        (batch, n_classes) IoU between high/low-threshold masks.
    """
    normalized = logits - jnp.mean(logits, axis=-1, keepdims=True)
    high = (normalized >= (threshold + threshold_offset)).astype(jnp.float32)
    low = (normalized >= (threshold - threshold_offset)).astype(jnp.float32)
    return iou_score(high, low)


def get_volumes(mask: jnp.ndarray, spacing: Sequence[float]) -> jnp.ndarray:
    """Per-class volumes in ml from one-hot masks (reference metric.py:84-96).

    Args:
        mask: (batch, *spatial, n_classes).
        spacing: voxel spacing in mm.
    """
    axes = tuple(range(1, mask.ndim - 1))
    voxels = jnp.sum(mask, axis=axes)
    return voxels * float(np.prod(np.asarray(spacing))) / 1000.0


def ejection_fraction(edv: ArrayLike, esv: ArrayLike) -> ArrayLike:
    """EF in percent (reference metric.py:99-112)."""
    return (edv - esv) / edv * 100.0


def get_ef_region(x: float) -> int:
    """EF region: 0 reduced (<=40), 1 borderline (<=55), 2 normal
    (reference metric.py:133-146)."""
    if x <= REDUCED_EF:
        return 0
    if x <= NORMAL_EF:
        return 1
    return 2


def coefficient_of_variance(x: np.ndarray, y: np.ndarray) -> float:
    """Scan-rescan reproducibility CV (reference metric.py:115-130)."""
    s2 = (x - y) ** 2 / 2
    m = (x + y) / 2
    return float(np.sqrt(np.mean(s2 / m**2)))


def heatmap_argmax(heatmap: jnp.ndarray) -> jnp.ndarray:
    """Hard argmax coordinates from channels-last heatmaps.

    Args:
        heatmap: (batch, x, y, 3).

    Returns:
        (batch, 6) int coords [x0, y0, x1, y1, x2, y2] (reference metric.py:45-59).
    """
    batch, w, h, c = heatmap.shape
    flat = heatmap.reshape(batch, w * h, c)
    idx = jnp.argmax(flat, axis=1)  # (batch, c)
    xs = idx // h
    ys = idx % h
    return jnp.stack([xs, ys], axis=-1).reshape(batch, 2 * c)


def heatmap_soft_argmax(heatmap: jnp.ndarray, beta: float = 1000.0) -> jnp.ndarray:
    """Differentiable soft-argmax (reference metric.py:62-81).

    Args:
        heatmap: (batch, w, h, 3) channels-last.

    Returns:
        (batch, 6) int coords.
    """
    batch, w, h, c = heatmap.shape
    probs = jax.nn.softmax(heatmap.reshape(batch, w * h, c) * beta, axis=1)
    xs = jnp.arange(w)
    ys = jnp.arange(h)
    coords = jnp.stack(
        [jnp.repeat(xs, h), jnp.tile(ys, w)], axis=-1
    ).astype(probs.dtype)  # (w*h, 2) cartesian order
    pred = jnp.einsum("bnc,nd->bcd", probs, coords)  # (batch, c, 2)
    return pred.reshape(batch, 2 * c).astype(jnp.int32)


def _surface(mask: np.ndarray) -> np.ndarray:
    """Edge voxels of a binary mask."""
    eroded = ndimage.binary_erosion(mask)
    return mask & ~eroded


def hausdorff_distance_95(
    pred_mask: np.ndarray,
    true_mask: np.ndarray,
    spacing: Sequence[float],
    percentile: float = 95.0,
) -> np.ndarray:
    """Symmetric 95th-percentile Hausdorff distance per class (host-side).

    Matches MONAI's compute_hausdorff_distance semantics used by the
    reference (segmentation/train.py:262-267): surface-to-surface distances
    with spacing, max of the two directed percentiles; NaN for empty masks.

    Args:
        pred_mask/true_mask: (batch, *spatial, n_classes) one-hot, numpy.
        spacing: voxel spacing in mm.

    Returns:
        (batch, n_classes - 1) for foreground classes 1..n-1.
    """
    pred_mask = np.asarray(pred_mask).astype(bool)
    true_mask = np.asarray(true_mask).astype(bool)
    batch, *_, n_classes = pred_mask.shape
    out = np.full((batch, n_classes - 1), np.nan, dtype=np.float64)
    spacing = tuple(float(s) for s in spacing)
    for b in range(batch):
        for c in range(1, n_classes):
            p = pred_mask[b, ..., c]
            t = true_mask[b, ..., c]
            if not p.any() or not t.any():
                continue
            ps = _surface(p)
            ts = _surface(t)
            if not ps.any() or not ts.any():
                out[b, c - 1] = 0.0
                continue
            dt_t = ndimage.distance_transform_edt(~ts, sampling=spacing)
            dt_p = ndimage.distance_transform_edt(~ps, sampling=spacing)
            d_pt = dt_t[ps]
            d_tp = dt_p[ts]
            out[b, c - 1] = max(
                np.percentile(d_pt, percentile), np.percentile(d_tp, percentile)
            )
    return out


def segmentation_metrics(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    spacing: Sequence[float],
) -> Dict[str, np.ndarray]:
    """Full segmentation metric suite (reference segmentation/train.py:224-286).

    Args:
        logits: (batch, *spatial, 1 + n_fg_classes) channels-last.
        labels: (batch, *spatial) integer labels.
        spacing: voxel spacing.

    Returns:
        dict of (batch,) arrays per metric name.
    """
    n_classes = logits.shape[-1] - 1
    pred_labels = jnp.argmax(logits, axis=-1)
    pred_mask = one_hot(pred_labels, n_classes + 1)
    true_mask = one_hot(labels.astype(jnp.int32), n_classes + 1)

    dice = dice_score(pred_mask, true_mask)
    iou = iou_score(pred_mask, true_mask)
    stability = stability_score(logits)
    true_volumes = get_volumes(true_mask, spacing)
    pred_volumes = get_volumes(pred_mask, spacing)
    hd95 = hausdorff_distance_95(np.asarray(pred_mask), np.asarray(true_mask), spacing)

    metrics: Dict[str, np.ndarray] = {}
    for i in range(n_classes):
        cls = i + 1
        metrics[f"class_{cls}_dice_score"] = np.asarray(dice[:, cls])
        metrics[f"class_{cls}_iou_score"] = np.asarray(iou[:, cls])
        metrics[f"class_{cls}_stability_score"] = np.asarray(stability[:, cls])
        metrics[f"class_{cls}_hausdorff_distance_95"] = hd95[:, i]
        metrics[f"class_{cls}_true_volume"] = np.asarray(true_volumes[:, cls])
        metrics[f"class_{cls}_pred_volume"] = np.asarray(pred_volumes[:, cls])
    metrics["mean_dice_score"] = np.asarray(jnp.mean(dice[:, 1:], axis=-1))
    metrics["mean_iou_score"] = np.asarray(jnp.mean(iou[:, 1:], axis=-1))
    metrics["mean_stability_score"] = np.asarray(jnp.mean(stability[:, 1:], axis=-1))
    metrics["mean_hausdorff_distance_95"] = np.nanmean(hd95, axis=-1) if hd95.size else hd95
    return metrics


def classification_metrics(
    true_labels: np.ndarray,
    pred_labels: np.ndarray,
    pred_probs: np.ndarray,
) -> Dict[str, float]:
    """Classification metrics (reference classification/train.py:183-295).

    Binary: accuracy/entropy/specificity/sensitivity/f1/mcc/roc_auc.
    Multiclass: accuracy/entropy/f1(micro)/mcc/roc_auc(macro-ovo).
    """
    from sklearn.metrics import (
        accuracy_score,
        confusion_matrix,
        f1_score,
        matthews_corrcoef,
        roc_auc_score,
    )

    n_classes = pred_probs.shape[1]
    labels = list(range(n_classes))
    metrics: Dict[str, float] = {}
    metrics["accuracy"] = float(accuracy_score(true_labels, pred_labels))
    metrics["entropy"] = float(-np.mean(np.sum(pred_probs * np.log(pred_probs + 1e-6), axis=1)))
    if n_classes == 2:
        cm = confusion_matrix(true_labels, pred_labels, labels=labels)
        tn, fp, fn, tp = cm.ravel()
        metrics["specificity"] = float(tn / (tn + fp)) if (tn + fp) else 0.0
        metrics["sensitivity"] = float(tp / (tp + fn)) if (tp + fn) else 0.0
        metrics["f1"] = float(f1_score(true_labels, pred_labels, labels=labels))
        if len(np.unique(true_labels)) > 1:
            metrics["mcc"] = float(matthews_corrcoef(true_labels, pred_labels))
            metrics["roc_auc"] = float(roc_auc_score(true_labels, pred_probs[:, 1], labels=labels))
        else:
            metrics["mcc"] = 0.0
            metrics["roc_auc"] = 0.0
        return metrics
    metrics["f1"] = float(f1_score(true_labels, pred_labels, average="micro", labels=labels))
    if len(np.unique(true_labels)) > 1:
        metrics["mcc"] = float(matthews_corrcoef(true_labels, pred_labels))
        metrics["roc_auc"] = float(
            roc_auc_score(true_labels, pred_probs, average="macro", multi_class="ovo", labels=labels)
        )
    else:
        metrics["mcc"] = 0.0
        metrics["roc_auc"] = 0.0
    return metrics


def regression_metrics(
    true_values: np.ndarray,
    pred_values: np.ndarray,
    mean: float = 0.0,
    std: float = 1.0,
    prefix: str = "",
) -> Dict[str, float]:
    """RMSE/MAE on normalised and denormalised values
    (reference regression/train.py:183-222)."""
    err = pred_values - true_values
    denorm_err = err * std
    return {
        f"{prefix}rmse": float(np.sqrt(np.mean(err**2))),
        f"{prefix}mae": float(np.mean(np.abs(err))),
        f"{prefix}denormalised_rmse": float(np.sqrt(np.mean(denorm_err**2))),
        f"{prefix}denormalised_mae": float(np.mean(np.abs(denorm_err))),
    }
