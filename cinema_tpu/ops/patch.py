"""Image <-> token patch conversion, channels-last.

Behavioral parity with the reference patchify/unpatchify family
(/root/reference/cinema/vit.py:67-256), re-designed for TPU:

- images are channels-LAST ``(batch, *spatial, chans)`` — the native layout
  for XLA TPU convolutions — instead of the reference's NCHW(D);
- a single rank-generic reshape/transpose implementation covers 2D/3D/4D,
  so the whole op compiles to a free layout change fused into the adjacent
  matmul (the reference materialises a `.contiguous()` copy per call);
- per-token channel layout is ``(p0, ..., pn, c)`` with channels fastest and
  token order is row-major over the grid, bit-identical to the reference's
  einsum orderings (``nchpwq->nhwpqc`` etc.), so PyTorch checkpoints load
  without any permutation beyond the Linear-weight transpose.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp


def _check_divisible(spatial: Sequence[int], patch_size: Sequence[int]) -> None:
    if len(spatial) != len(patch_size):
        raise ValueError(f"Image rank {len(spatial)} does not match patch size rank {len(patch_size)}.")
    for s, p in zip(spatial, patch_size):
        if s % p != 0:
            raise ValueError(f"Input size {tuple(spatial)} cannot be divided by patch size {tuple(patch_size)}.")


def patchify(image: jnp.ndarray, patch_size: Sequence[int]) -> jnp.ndarray:
    """Convert an image into patch tokens.

    Args:
        image: (batch, *spatial, in_chans), spatial rank in {2, 3, 4}.
        patch_size: per-axis patch size, same rank as spatial.

    Returns:
        tokens: (batch, n_patches, prod(patch_size) * in_chans); channel layout
            per token is (p0, ..., pn, c) with c fastest, token order is
            row-major over the grid.
    """
    patch_size = tuple(patch_size)
    if len(patch_size) not in (2, 3, 4):
        raise ValueError(f"Patchify only supports 2D, 3D, and 4D images, got {len(patch_size)}D.")
    batch, *spatial, chans = image.shape
    _check_divisible(spatial, patch_size)
    cells = split_into_cells(image, patch_size)
    return cells.reshape(batch, cells.shape[1], math.prod(patch_size) * chans)


def split_into_cells(image: jnp.ndarray, cell_size: Sequence[int]) -> jnp.ndarray:
    """(batch, *spatial, C) -> (batch, n_cells, *cell_size, C), row-major over
    the cell grid.

    The single source of the grid-split permutation — its cell/token order is
    load-bearing for checkpoint compatibility (patchify tokens and the sparse
    stem's visible cells must agree). Divisibility is the caller's contract.
    """
    batch, *spatial, chans = image.shape
    nd = len(cell_size)
    grid = tuple(s // c for s, c in zip(spatial, cell_size))
    shape: list[int] = [batch]
    for g, c in zip(grid, cell_size):
        shape += [g, c]
    shape.append(chans)
    x = image.reshape(shape)
    # (b, g0, p0, ..., gn, pn, c) -> (b, g0..gn, p0..pn, c)
    perm = [0] + [1 + 2 * i for i in range(nd)] + [2 + 2 * i for i in range(nd)] + [1 + 2 * nd]
    x = x.transpose(perm)
    return x.reshape(batch, math.prod(grid), *cell_size, chans)


def merge_cells(cells: jnp.ndarray, grid_size: Sequence[int]) -> jnp.ndarray:
    """Inverse of :func:`split_into_cells`: (batch, n_cells, *cell, C) -> image."""
    batch, chans = cells.shape[0], cells.shape[-1]
    grid_size = tuple(grid_size)
    nd = len(grid_size)
    cell = cells.shape[2:-1]
    x = cells.reshape(batch, *grid_size, *cell, chans)
    # (b, g0..gn, p0..pn, c) -> (b, g0, p0, ..., gn, pn, c)
    perm = [0]
    for i in range(nd):
        perm += [1 + i, 1 + nd + i]
    perm.append(1 + 2 * nd)
    x = x.transpose(perm)
    spatial = tuple(g * c for g, c in zip(grid_size, cell))
    return x.reshape(batch, *spatial, chans)


def unpatchify(x: jnp.ndarray, patch_size: Sequence[int], grid_size: Sequence[int]) -> jnp.ndarray:
    """Convert patch tokens back into an image (inverse of :func:`patchify`).

    Args:
        x: (batch, n_patches, prod(patch_size) * chans).
        patch_size: per-axis patch size.
        grid_size: per-axis grid size.

    Returns:
        image: (batch, *spatial, chans) with spatial[i] = grid[i] * patch[i].
    """
    patch_size = tuple(patch_size)
    grid_size = tuple(grid_size)
    if len(patch_size) != len(grid_size):
        raise ValueError(f"Patch size {patch_size} and grid size {grid_size} do not match.")
    if len(patch_size) not in (2, 3, 4):
        raise ValueError(f"Unpatchify only supports 2D, 3D, and 4D images, got {len(patch_size)}D.")
    batch, n_patches, tok_chans = x.shape
    if n_patches != math.prod(grid_size):
        raise ValueError(f"Number of patches {n_patches} != product of grid size {math.prod(grid_size)}.")
    if tok_chans % math.prod(patch_size) != 0:
        raise ValueError(
            f"Token channels {tok_chans} not divisible by patch volume {math.prod(patch_size)}."
        )
    chans = tok_chans // math.prod(patch_size)
    return merge_cells(x.reshape(batch, n_patches, *patch_size, chans), grid_size)
