"""Sliding-window inference (reference: cinema/segmentation/train.py:148-221,
cinema/segmentation/landmark/train.py:135-208, classification/regression
forwards).

The reference loops patches serially at batch 1 through the model (its hot
inference loop). Here all patches form ONE batch — non-patched views are
tiled across the patch batch — so a whole study is a single jitted forward,
followed by fused scatter-average aggregation.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cinema_tpu.ops.window import aggregate_patches, get_patch_grid, patch_grid_sample

ForwardFn = Callable[[Dict[str, jnp.ndarray]], Dict[str, jnp.ndarray]]


def _logit(p: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    p = jnp.clip(p, eps, 1.0 - eps)
    return jnp.log(p) - jnp.log1p(-p)


def sliding_window_forward(
    forward_fn: ForwardFn,
    image_dict: Dict[str, jnp.ndarray],
    patch_size_dict: Dict[str, Tuple[int, ...]],
    aggregation: str = "softmax",
) -> Dict[str, jnp.ndarray]:
    """Patch one oversized view on a grid, batch-forward, scatter-average.

    Args:
        forward_fn: batched model forward, image_dict -> logits_dict
            (channels-last).
        image_dict: per-view (batch, *spatial, ch); at most one view larger
            than its patch size (reference restriction,
            segmentation/train.py:184-188). The batch dim may carry several
            frames of one study — frames and patches fold into ONE forward
            (the reference loops both serially at batch 1).
        patch_size_dict: per-view inference patch size.
        aggregation: 'softmax' (mutually exclusive classes: softmax-average
            then log) or 'sigmoid' (independent channels: sigmoid-average
            then logit restore, reference landmark/train.py:176-200).

    Returns:
        logits_dict: per-view (batch, *image_size, out_chans) — the input
        batch (frame) dimension is preserved.
    """
    views = list(image_dict.keys())
    for view, image in image_dict.items():
        if any(s < p for s, p in zip(image.shape[1:-1], patch_size_dict[view])):
            raise ValueError(
                f"For view {view}, image size {image.shape[1:-1]} is smaller than "
                f"patch size {patch_size_dict[view]}."
            )
    need_patch = {
        view: tuple(image_dict[view].shape[1:-1]) != tuple(patch_size_dict[view]) for view in views
    }
    if not any(need_patch.values()):
        return forward_fn(image_dict)
    if sum(need_patch.values()) > 1:
        raise ValueError(f"Only support patching on one view for now, but got {need_patch}.")
    batch = image_dict[views[0]].shape[0]

    view_to_patch = next(v for v, n in need_patch.items() if n)
    images = image_dict[view_to_patch]  # (batch, *spatial, ch)
    patch_size = tuple(patch_size_dict[view_to_patch])
    image_size = images.shape[1:-1]
    overlap = tuple(s // 2 for s in patch_size)
    grid = get_patch_grid(image_size, patch_size, overlap)
    # (batch, n_patches, *patch, ch) -> fold frames x patches into ONE batch
    patches = jax.vmap(lambda img: patch_grid_sample(img, grid, patch_size))(images)
    n_patches = patches.shape[1]
    flat_patches = patches.reshape(batch * n_patches, *patches.shape[2:])

    # frame-major ordering: other views repeat per patch of their frame
    patch_image_dict = {
        view: flat_patches
        if view == view_to_patch
        else jnp.repeat(image_dict[view], n_patches, axis=0)
        for view in views
    }
    logits_dict = forward_fn(patch_image_dict)

    to_probs = jax.nn.softmax if aggregation == "softmax" else jax.nn.sigmoid
    from_probs = jnp.log if aggregation == "softmax" else _logit
    out: Dict[str, jnp.ndarray] = {}
    for view in views:
        logits = logits_dict[view].astype(jnp.float32)
        probs = to_probs(logits, axis=-1) if aggregation == "softmax" else to_probs(logits)
        probs = probs.reshape(batch, n_patches, *probs.shape[1:])
        if view == view_to_patch:
            out[view] = from_probs(
                jax.vmap(lambda p: aggregate_patches(p, grid, image_size))(probs)
            )
        else:
            out[view] = from_probs(jnp.mean(probs, axis=1))
    return out


def video_forward(
    forward_fn: Callable[[jnp.ndarray], jnp.ndarray],
    video: jnp.ndarray,
    chunk: int,
) -> jnp.ndarray:
    """Run a per-frame forward over a video in fixed-size chunks, all inside
    ONE computation (``lax.scan`` over chunks).

    The reference serves cine studies with a serial batch-1 python loop
    (examples/inference/segmentation_sax.py:110-164); chunking frames into
    batched forwards amortizes the work, and scanning the chunks inside a
    single jit removes the per-chunk host dispatch gap (~35 ms/chunk over a
    remote device link, measured round 3).

    Args:
        forward_fn: (chunk, *spatial, ch) -> (chunk, *out) per-chunk forward.
        video: (n_frames, *spatial, ch); n_frames is end-padded to a multiple
            of ``chunk`` by repeating leading frames (trimmed from the output).
        chunk: frames per forward (static).

    Returns:
        (n_frames, *out) stacked outputs.
    """
    n = video.shape[0]
    n_pad = (-n) % chunk
    if n_pad:
        # wrap-indexing handles n < n_pad (videos shorter than the chunk)
        video = jnp.concatenate([video, video[jnp.arange(n_pad) % n]], axis=0)
    stacked = video.reshape(-1, chunk, *video.shape[1:])

    def body(carry, frames):
        return carry, forward_fn(frames)

    _, outs = jax.lax.scan(body, None, stacked)
    return outs.reshape(-1, *outs.shape[2:])[:n]


def pad_to_multiple(
    image: np.ndarray,
    multiples: Sequence[int],
    mode: str = "constant",
) -> Tuple[np.ndarray, Tuple[int, ...]]:
    """End-pad spatial dims to multiples (bucketing to avoid recompiles).

    Args:
        image: (*spatial, ch) numpy array.
        multiples: per-axis size multiple.

    Returns:
        (padded image, original spatial shape).
    """
    spatial = image.shape[:-1]
    pads = []
    for s, m in zip(spatial, multiples):
        target = int(np.ceil(s / m) * m) if m > 1 else s
        pads.append((0, target - s))
    pads.append((0, 0))
    return np.pad(image, pads, mode=mode), tuple(spatial)
