"""Shared classification training/eval utilities (reference: cinema/classification/train.py)."""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cinema_tpu.config import Config
from cinema_tpu.losses import classification_loss as _clf_loss
from cinema_tpu.metrics import classification_metrics
from cinema_tpu.ops.window import get_patch_grid, patch_grid_sample
from cinema_tpu.train.state import train_apply


def get_classification_model(config: Config, dtype=jnp.float32):
    """convvit/resnet dispatch (reference classification/train.py:25-81)."""
    from cinema_tpu.factory import get_convvit_model
    from cinema_tpu.models.resnet import ResNet

    if config.model.name == "convvit":
        return get_convvit_model(config, dtype=dtype)
    if config.model.name == "resnet":
        views = [config.model.views] if isinstance(config.model.views, str) else config.model.views
        if len(views) > 1:
            raise ValueError("ResNet only supports single view.")
        if "class_column" in config.data:
            out_chans = len(config.data[config.data.class_column])
        elif "regression_column" in config.data:
            out_chans = 1
        else:
            out_chans = config.model.out_chans
        return ResNet(
            out_chans=out_chans,
            layers=tuple(config.model.resnet.get("layers", (2, 2, 2, 2))),
            layer_inplanes=tuple(config.model.resnet.layer_inplanes),
            dtype=dtype,
        )
    raise ValueError(f"Invalid model name {config.model.name}.")


def classification_loss_fn(
    model: Any,
    params: Any,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Smoothed CE on model logits (reference classification/train.py:84-113)."""
    views = sorted({k[: -len("_image")] for k in batch if k.endswith("_image")})
    image_dict = {v: batch[f"{v}_image"] for v in views}
    logits, model_state = train_apply(model, params, image_dict, rng)
    loss, metrics = _clf_loss(logits, batch["label"])
    return loss, (metrics, model_state)


def classification_forward(
    forward: Callable,
    params: Any,
    image_dict: Dict[str, jnp.ndarray],
    patch_size_dict: Dict[str, tuple],
) -> jnp.ndarray:
    """Patched classification forward: mean softmax over patches -> log
    (reference classification/train.py:116-180)."""
    views = list(image_dict.keys())
    need_patch = {
        v: tuple(image_dict[v].shape[1:-1]) != tuple(patch_size_dict[v]) for v in views
    }
    if not any(need_patch.values()):
        return forward(params, image_dict)
    if sum(need_patch.values()) > 1:
        raise ValueError(f"Only support patching on one view for now, but got {need_patch}.")
    if image_dict[views[0]].shape[0] != 1:
        raise ValueError("Expected batch size 1 for patching.")
    view_to_patch = next(v for v, n in need_patch.items() if n)
    image = image_dict[view_to_patch][0]
    patch_size = tuple(patch_size_dict[view_to_patch])
    grid = get_patch_grid(image.shape[:-1], patch_size, tuple(s // 2 for s in patch_size))
    patches = patch_grid_sample(image, grid, patch_size)
    n_patches = patches.shape[0]
    patch_image_dict = {
        v: patches
        if v == view_to_patch
        else jnp.broadcast_to(image_dict[v], (n_patches, *image_dict[v].shape[1:]))
        for v in views
    }
    logits = forward(params, patch_image_dict)  # (n_patches, n_classes)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.log(jnp.mean(probs, axis=0, keepdims=True))


def classification_eval_dataloader(
    model: Any,
    params: Any,
    dataloader: Any,
    config: Config,
) -> Dict[str, float]:
    """Collect per-sample probabilities, compute the full metric suite
    (reference classification/train.py:298-360)."""
    views = [config.model.views] if isinstance(config.model.views, str) else list(config.model.views)

    def view_cfg(v):
        return config.data.sax if v == "sax" else config.data.lax

    patch_size_dict = {v: tuple(view_cfg(v).patch_size) for v in views}
    forward = jax.jit(lambda p, imgs: model.apply(p, imgs))

    true_labels: List[int] = []
    probs_list: List[np.ndarray] = []
    for batch in dataloader:
        image_dict = {v: jnp.asarray(batch[f"{v}_image"]) for v in views}
        logits = classification_forward(forward, params, image_dict, patch_size_dict)
        probs_list.append(np.asarray(jax.nn.softmax(logits.astype(jnp.float32), axis=-1))[0])
        true_labels.append(int(np.asarray(batch["label"]).reshape(-1)[0]))
    pred_probs = np.stack(probs_list)
    pred_labels = np.argmax(pred_probs, axis=-1)
    return classification_metrics(np.asarray(true_labels), pred_labels, pred_probs)
