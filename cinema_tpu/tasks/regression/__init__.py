"""Shared regression training/eval utilities (reference: cinema/regression/train.py)."""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cinema_tpu.config import Config
from cinema_tpu.losses import regression_loss as _reg_loss
from cinema_tpu.metrics import regression_metrics
from cinema_tpu.ops.window import get_patch_grid, patch_grid_sample
from cinema_tpu.tasks.classification import get_classification_model
from cinema_tpu.train.state import train_apply

get_regression_model = get_classification_model  # same convvit/resnet dispatch


def regression_loss_fn(
    model: Any,
    params: Any,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """MSE on z-normalised targets (reference regression/train.py:21-55)."""
    views = sorted({k[: -len("_image")] for k in batch if k.endswith("_image")})
    image_dict = {v: batch[f"{v}_image"] for v in views}
    preds, model_state = train_apply(model, params, image_dict, rng)
    loss, metrics = _reg_loss(preds[:, 0], batch["label"])
    return loss, (metrics, model_state)


def regression_forward(
    forward: Callable,
    params: Any,
    image_dict: Dict[str, jnp.ndarray],
    patch_size_dict: Dict[str, tuple],
) -> jnp.ndarray:
    """Patched regression forward: mean prediction over patches
    (reference regression/train.py:58-120)."""
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
    preds = forward(params, patch_image_dict)
    return jnp.mean(preds.astype(jnp.float32), axis=0, keepdims=True)


def regression_eval_dataloader(
    model: Any,
    params: Any,
    dataloader: Any,
    config: Config,
) -> Dict[str, float]:
    """RMSE/MAE raw + denormalised (reference regression/train.py:123-222)."""
    views = [config.model.views] if isinstance(config.model.views, str) else list(config.model.views)

    def view_cfg(v):
        return config.data.sax if v == "sax" else config.data.lax

    patch_size_dict = {v: tuple(view_cfg(v).patch_size) for v in views}
    forward = jax.jit(lambda p, imgs: model.apply(p, imgs))

    true_vals: List[float] = []
    pred_vals: List[float] = []
    for batch in dataloader:
        image_dict = {v: jnp.asarray(batch[f"{v}_image"]) for v in views}
        preds = regression_forward(forward, params, image_dict, patch_size_dict)
        pred_vals.append(float(np.asarray(preds).reshape(-1)[0]))
        true_vals.append(float(np.asarray(batch["label"]).reshape(-1)[0]))
    # reg mean/std live at config.data.<regression_column>.{mean,std}
    # (reference regression/acdc/config.yaml:22-26)
    reg_std = 1.0
    col = config.data.get("regression_column")
    if col and col in config.data:
        reg_std = float(config.data[col]["std"])
    return regression_metrics(np.asarray(true_vals), np.asarray(pred_vals), std=reg_std)
