"""Task losses, all pure-jnp and jit-able.

Mirrors the reference's loss stack: segmentation CE+soft-Dice
(segmentation/train.py:77-103), classification CE with label smoothing 0.1
(classification/train.py:82-110), regression MSE on z-normalised labels,
landmark heatmap soft-Dice+BCE (segmentation/landmark/train.py:109-132) and
Wing losses on coordinates (regression/landmark/train.py:46-152).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int = -1,
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """Mean CE over non-ignored positions (torch F.cross_entropy semantics).

    Args:
        logits: (batch, *spatial, n_classes) channels-last (or (batch, n_classes)).
        labels: (batch, *spatial) ints; ignore_index positions excluded.
    """
    n_classes = logits.shape[-1]
    labels = labels.astype(jnp.int32)
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    target = jax.nn.one_hot(safe_labels, n_classes, dtype=jnp.float32)
    if label_smoothing > 0:
        target = target * (1.0 - label_smoothing) + label_smoothing / n_classes
    ce = -jnp.sum(target * log_probs, axis=-1)
    ce = jnp.where(valid, ce, 0.0)
    return jnp.sum(ce) / jnp.maximum(jnp.sum(valid), 1)


def soft_dice_loss(
    probs: jnp.ndarray,
    target: jnp.ndarray,
    include_background: bool = False,
    smooth_nr: float = 1e-5,
    smooth_dr: float = 1e-5,
) -> jnp.ndarray:
    """MONAI-style soft Dice loss, channels-last.

    Args:
        probs: (batch, *spatial, n_classes) probabilities.
        target: (batch, *spatial, n_classes) one-hot (or soft) targets.
        include_background: keep class 0 in the mean.

    Returns:
        scalar loss = mean over batch x classes of 1 - dice.
    """
    if not include_background:
        probs = probs[..., 1:]
        target = target[..., 1:]
    axes = tuple(range(1, probs.ndim - 1))
    inter = jnp.sum(probs * target, axis=axes)
    denom = jnp.sum(probs, axis=axes) + jnp.sum(target, axis=axes)
    dice = (2.0 * inter + smooth_nr) / (denom + smooth_dr)
    return jnp.mean(1.0 - dice)


def segmentation_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """CE(ignore -1) + soft Dice on softmax probs (reference segmentation/train.py:77-103).

    Args:
        logits: (batch, *spatial, n_classes) channels-last.
        labels: (batch, *spatial) ints, -1 = ignore.
    """
    n_classes = logits.shape[-1]
    mask = jax.nn.one_hot(jnp.maximum(labels, 0).astype(jnp.int32), n_classes, dtype=logits.dtype)
    ce = cross_entropy(logits, labels, ignore_index=-1)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    dice = soft_dice_loss(probs, mask.astype(jnp.float32), include_background=False)
    loss = dice + ce
    return loss, {"cross_entropy": ce, "mean_dice_loss": dice, "loss": loss}


def classification_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    label_smoothing: float = 0.1,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """CE with label smoothing (reference classification/train.py:82-110)."""
    ce = cross_entropy(logits, labels, ignore_index=-1, label_smoothing=label_smoothing)
    return ce, {"cross_entropy": ce, "loss": ce}


def regression_loss(
    preds: jnp.ndarray,
    targets: jnp.ndarray,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """MSE on (z-normalised) targets (reference regression/train.py:21-55)."""
    loss = jnp.mean(jnp.square(preds.astype(jnp.float32) - targets.astype(jnp.float32)))
    return loss, {"mse_loss": loss, "loss": loss}


def landmark_heatmap_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Independent-channel sigmoid Dice + BCE (reference segmentation/landmark/train.py:109-132).

    Args:
        logits: (batch, *spatial, 3) channels-last heatmap logits.
        labels: same shape, in [0, 1].
    """
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    probs = jax.nn.sigmoid(logits)
    dice = soft_dice_loss(probs, labels, include_background=True)
    bce = jnp.mean(
        jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    loss = dice + bce
    return loss, {"bce_loss": bce, "dice_loss": dice, "loss": loss}


def wing_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    w: float = 10.0,
    epsilon: float = 2.0,
) -> jnp.ndarray:
    """Wing loss (reference regression/landmark/train.py:46-75)."""
    c = w - w * np.log(1 + w / epsilon)
    err = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    loss = jnp.where(err < w, w * jnp.log1p(err / epsilon), err - c)
    return jnp.mean(loss)


_REL_DIST_MATRIX = np.array(
    [
        [1, 0, -0.5, 0, -0.5, 0],
        [0, 1, 0, -0.5, 0, -0.5],
        [-0.5, 0, 1, 0, -0.5, 0],
        [0, -0.5, 0, 1, 0, -0.5],
        [-0.5, 0, -0.5, 0, 1, 0],
        [0, -0.5, 0, -0.5, 0, 1],
    ],
    dtype=np.float32,
)


def get_relative_distances(coords: jnp.ndarray) -> jnp.ndarray:
    """Point-to-midpoint-of-others distances (reference regression/landmark/train.py:77-105)."""
    return coords @ jnp.asarray(_REL_DIST_MATRIX, dtype=coords.dtype)


def landmark_coordinate_loss(
    pred_coords: jnp.ndarray,
    true_coords: jnp.ndarray,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Wing(coords) + Wing(relative distances) (reference regression/landmark/train.py:108-152).

    Args:
        pred_coords/true_coords: (batch, 6) in image units.
    """
    lm = wing_loss(pred_coords, true_coords)
    rel = wing_loss(get_relative_distances(pred_coords), get_relative_distances(true_coords))
    loss = lm + rel
    metrics = {
        "landmark_wing_loss": lm,
        "relative_distance_wing_loss": rel,
        "landmark_mae": jnp.mean(jnp.abs(pred_coords - true_coords)),
        "relative_distance_mae": jnp.mean(
            jnp.abs(get_relative_distances(pred_coords) - get_relative_distances(true_coords))
        ),
        "loss": loss,
    }
    return loss, metrics
