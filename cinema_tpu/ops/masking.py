"""Static-shape MAE masking utilities.

The reference masks tokens with dynamic boolean indexing
(``x[~mask]``, /root/reference/cinema/mae/mae.py:550) which XLA cannot
compile (dynamic output shape). Because the keep count is deterministic per
mask ratio (mae.py:59), the TPU-native formulation precomputes sorted
keep/mask index tensors once per batch and uses ``take_along_axis`` gathers —
fully static shapes, one fused gather kernel on TPU.

Index order parity: torch boolean indexing returns elements in original
order; we sort the argsort prefix/suffix so gathers are order-identical.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


class PatchMask(NamedTuple):
    """Per-sample random patch mask with static-shape gather indices.

    Attributes:
        bool_mask: (batch, n_patches) bool, True = masked/removed.
        keep_ids: (batch, n_keep) int32, ascending, visible patch indices.
        mask_ids: (batch, n_masked) int32, ascending, masked patch indices.
    """

    bool_mask: jnp.ndarray
    keep_ids: jnp.ndarray
    mask_ids: jnp.ndarray

    @property
    def n_patches(self) -> int:
        return self.bool_mask.shape[-1]

    @property
    def n_keep(self) -> int:
        return self.keep_ids.shape[-1]

    @property
    def n_masked(self) -> int:
        return self.mask_ids.shape[-1]


def n_keep_for_ratio(n_patches: int, mask_ratio: float) -> int:
    """Deterministic keep count (reference mae.py:59)."""
    return int(n_patches * (1 - mask_ratio))


def random_patch_mask(
    rng: jax.Array,
    batch_size: int,
    n_patches: int,
    mask_ratio: float,
) -> PatchMask:
    """Sample a per-sample random patch mask by argsort of uniform noise.

    Matches get_batch_random_patch_mask (reference mae.py:30-65): ascending
    argsort of U[0,1) noise, first ``n_keep`` kept.

    Args:
        rng: PRNG key.
        batch_size: batch size.
        n_patches: number of patches.
        mask_ratio: fraction to remove, in [0, 1].

    Returns:
        PatchMask with static shapes.
    """
    if not 0 <= mask_ratio <= 1:
        raise ValueError(f"mask_ratio must be in [0, 1], got {mask_ratio}.")
    n_keep = n_keep_for_ratio(n_patches, mask_ratio)
    if mask_ratio == 0:
        return full_patch_mask(batch_size, n_patches)
    noise = jax.random.uniform(rng, (batch_size, n_patches))
    ids_shuffle = jnp.argsort(noise, axis=1)
    keep_ids = jnp.sort(ids_shuffle[:, :n_keep], axis=1).astype(jnp.int32)
    mask_ids = jnp.sort(ids_shuffle[:, n_keep:], axis=1).astype(jnp.int32)
    bool_mask = jnp.ones((batch_size, n_patches), dtype=bool)
    bool_mask = jax.vmap(lambda m, ids: m.at[ids].set(False))(bool_mask, keep_ids)
    return PatchMask(bool_mask=bool_mask, keep_ids=keep_ids, mask_ids=mask_ids)


def full_patch_mask(batch_size: int, n_patches: int) -> PatchMask:
    """Mask with ratio 0: everything visible, nothing masked."""
    keep_ids = jnp.broadcast_to(jnp.arange(n_patches, dtype=jnp.int32), (batch_size, n_patches))
    return PatchMask(
        bool_mask=jnp.zeros((batch_size, n_patches), dtype=bool),
        keep_ids=keep_ids,
        mask_ids=jnp.zeros((batch_size, 0), dtype=jnp.int32),
    )


def gather_tokens(x: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Gather tokens by per-sample indices.

    Equivalent to the reference's ``x[~mask].reshape(batch, -1, dim)``
    (mae.py:550) but with a static output shape.

    Args:
        x: (batch, n_patches, dim) or (n_patches, dim) broadcast over batch.
        ids: (batch, k) indices.

    Returns:
        (batch, k, dim).
    """
    if x.ndim == 2:
        x = jnp.broadcast_to(x[None], (ids.shape[0], *x.shape))
    return jnp.take_along_axis(x, ids[..., None], axis=1)


def upsample_mask(mask: jnp.ndarray, scale_factor: Sequence[int]) -> jnp.ndarray:
    """Nearest-upsample a grid mask (reference convvit.py:24-51).

    Args:
        mask: (batch, *grid) array (bool or numeric).
        scale_factor: per-axis upsampling factor.

    Returns:
        (batch, *(grid * scale)) array.
    """
    if mask.ndim != len(scale_factor) + 1:
        raise ValueError(
            f"mask must have the same number of dimensions as scale_factor except batch, "
            f"got {mask.ndim} and {len(scale_factor)}."
        )
    for axis, f in enumerate(scale_factor):
        if f != 1:
            mask = jnp.repeat(mask, f, axis=axis + 1)
    return mask


def visible_grid_mask(mask: PatchMask, grid_size: Sequence[int], scale_factor: Sequence[int]) -> jnp.ndarray:
    """Visible (1=keep) mask upsampled from the ViT grid to a conv resolution.

    Args:
        mask: ViT-grid PatchMask.
        grid_size: ViT grid size (prod == n_patches).
        scale_factor: upsampling per axis from ViT grid to conv resolution.

    Returns:
        (batch, *(grid * scale)) float-friendly bool mask, True = visible.
    """
    vis = ~mask.bool_mask
    vis = vis.reshape(vis.shape[0], *grid_size)
    return upsample_mask(vis, scale_factor)
