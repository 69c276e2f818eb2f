"""Sliding-window patch extraction and aggregation (reference: cinema/transform.py).

TPU-native re-design: the reference runs a serial batch-1 python loop over
patches (segmentation/train.py:204-210 — its hot inference loop) and a
python scatter loop for aggregation (transform.py:117-122). Here:

- the grid is static (computed host-side from shapes), so extraction is a
  stack of static slices, fused by XLA into one gather;
- the model runs over ALL patches as one batch (or fixed-size chunks),
  saturating the MXU instead of batch-1 dispatches;
- aggregation is a chain of static-slice scatter-adds, fused by XLA.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def get_patch_grid(
    image_size: Sequence[int],
    patch_size: Sequence[int],
    patch_overlap: Sequence[int],
) -> np.ndarray:
    """Start indices covering the image with a tail-aligned grid
    (reference transform.py:13-50).

    Returns:
        (n_patches, n_dims) int array.
    """
    indices = []
    for img_dim, patch_dim, ovlp_dim in zip(image_size, patch_size, patch_overlap):
        if patch_dim > img_dim:
            raise ValueError(f"Patch size {patch_dim} should be <= image size {img_dim}.")
        if ovlp_dim >= patch_dim:
            raise ValueError(
                f"Patch overlap {ovlp_dim} must be < patch size {patch_dim}."
            )
        end = img_dim - patch_dim + 1
        step = patch_dim - ovlp_dim
        idx = np.arange(0, end, step)
        if idx[-1] != end - 1:
            idx = np.append(idx, img_dim - patch_dim)
        indices.append(idx)
    return np.stack(np.meshgrid(*indices, indexing="ij"), axis=-1).reshape(-1, len(image_size))


def patch_grid_sample(
    x: jnp.ndarray,
    start_indices: np.ndarray,
    patch_size: Sequence[int],
) -> jnp.ndarray:
    """Extract all patches as one batch.

    Args:
        x: (*spatial, ch) or (d1..dn) array (channels last if present).
        start_indices: (n_patches, n) static numpy ints.
        patch_size: per-axis patch size.

    Returns:
        (n_patches, *patch_size[, ch]).
    """
    nd = len(patch_size)
    patches = []
    for start in np.asarray(start_indices):
        slices = tuple(slice(int(s), int(s) + p) for s, p in zip(start, patch_size))
        if x.ndim == nd + 1:
            slices = slices + (slice(None),)
        patches.append(x[slices])
    return jnp.stack(patches)


def aggregate_patches(
    patches: jnp.ndarray,
    start_indices: np.ndarray,
    image_size: Sequence[int],
) -> jnp.ndarray:
    """Average overlapping patches back into the full image
    (reference transform.py:86-124), channels-last.

    Args:
        patches: (n_patches, *patch_size, ch).
        start_indices: (n_patches, n) static numpy ints.
        image_size: full spatial size.

    Returns:
        (*image_size, ch).
    """
    n_patches, *patch_size, ch = patches.shape
    image_size = tuple(image_size)
    if n_patches != len(start_indices):
        raise ValueError(
            f"n_patches should be the same as start_indices, got {n_patches} and {len(start_indices)}."
        )
    if len(image_size) != len(patch_size):
        raise ValueError(
            f"image_size and patch_size should have the same length, "
            f"got image_size={image_size} and patches.shape={patches.shape}."
        )
    out = jnp.zeros((*image_size, ch), dtype=patches.dtype)
    count = jnp.zeros(image_size, dtype=jnp.float32)
    ones = jnp.ones(tuple(patch_size), dtype=jnp.float32)
    for i, start in enumerate(np.asarray(start_indices)):
        idx = tuple(int(s) for s in start)
        out = jax_dynamic_add(out, patches[i], idx)
        count = jax_dynamic_add(count, ones, idx)
    return out / count[..., None]


def jax_dynamic_add(target: jnp.ndarray, patch: jnp.ndarray, start: Tuple[int, ...]) -> jnp.ndarray:
    """Static-start scatter-add of a patch into a larger array."""
    slices = tuple(slice(s, s + p) for s, p in zip(start, patch.shape))
    if target.ndim == patch.ndim + 0:
        return target.at[slices].add(patch)
    raise ValueError(f"Rank mismatch: {target.ndim} vs {patch.ndim}.")


def crop_start(image: jnp.ndarray, target_shape: Sequence[int]) -> jnp.ndarray:
    """Crop to target shape from the start (undo end-padding,
    reference transform.py:127-143)."""
    if len(image.shape) != len(target_shape):
        raise ValueError(
            f"image.shape and target_shape should have the same length, "
            f"got {image.shape} and {tuple(target_shape)}."
        )
    return image[tuple(slice(0, s) for s in target_shape)]
