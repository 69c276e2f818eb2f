"""Visible-cell sparse compute for the ConvMAE stems.

During MAE pretraining 75% of ViT-grid patches are masked, yet the reference
runs the full conv stem densely and relies on mask multiplies to stop
leakage (reference conv.py:349-415, mae.py:504-612). Observation: with
per-position norms (LayerNorm), the ONLY cross-position op in the whole stem
is the 5^nd depthwise conv, and its input is zeroed at masked positions by
the mask multiply — so values at masked positions never influence visible
outputs, and computing them is pure waste.

This module provides the cell bookkeeping to run the stem on gathered
visible cells only ((batch * n_keep, *cell, C) tensors — a 4x FLOP/HBM
saving at mask ratio 0.75), densifying into the true spatial layout only
around each depthwise conv:

- a "cell" is the image region one ViT-grid patch covers at the current
  stem level (kernel==stride convs never cross cell boundaries);
- ``image_to_cells``/``cells_to_image`` reshape between spatial and
  cell-major layouts;
- ``gather_cells``/``scatter_cells`` move between dense cell-major and
  visible-only forms with static shapes (PatchMask.keep_ids);
- ``CellDenseCtx`` packages the densify/sparsify pair MaskedConvBlock wraps
  around its depthwise conv.

Outputs at visible positions are exactly equal to the dense computation
(same ops on the same values; only the batching differs), pinned by
tests/test_sparse_stem.py.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from cinema_tpu.ops.patch import merge_cells, split_into_cells


def image_to_cells(x: jnp.ndarray, grid_size: Tuple[int, ...]) -> jnp.ndarray:
    """(batch, *spatial, C) -> (batch, n_cells, *cell, C), cell-major order
    matching patchify's token order (row-major over the grid) — both
    delegate to the same :func:`cinema_tpu.ops.patch.split_into_cells`."""
    spatial = x.shape[1:-1]
    if len(spatial) != len(grid_size):
        raise ValueError(f"grid rank {len(grid_size)} != spatial rank {len(spatial)}.")
    for s, g in zip(spatial, grid_size):
        if s % g != 0:
            raise ValueError(f"spatial {spatial} not divisible by grid {grid_size}.")
    cell = tuple(s // g for s, g in zip(spatial, grid_size))
    return split_into_cells(x, cell)


def cells_to_image(cells: jnp.ndarray, grid_size: Tuple[int, ...]) -> jnp.ndarray:
    """Inverse of :func:`image_to_cells`."""
    return merge_cells(cells, grid_size)


def gather_cells(cells: jnp.ndarray, keep_ids: jnp.ndarray) -> jnp.ndarray:
    """(batch, n_cells, *cell, C), (batch, k) -> (batch, k, *cell, C)."""
    batch, n_cells = cells.shape[:2]
    flat = cells.reshape(batch, n_cells, -1)
    out = jnp.take_along_axis(flat, keep_ids[..., None], axis=1)
    return out.reshape(batch, keep_ids.shape[1], *cells.shape[2:])


def scatter_cells(vis: jnp.ndarray, keep_ids: jnp.ndarray, n_cells: int) -> jnp.ndarray:
    """(batch, k, *cell, C) -> (batch, n_cells, *cell, C), zeros at masked cells."""
    batch, k = vis.shape[:2]
    flat = vis.reshape(batch, k, -1)
    dense = jnp.zeros((batch, n_cells, flat.shape[-1]), flat.dtype)
    dense = jax.vmap(lambda d, ids, v: d.at[ids].set(v))(dense, keep_ids, flat)
    return dense.reshape(batch, n_cells, *vis.shape[2:])


class CellDenseCtx(NamedTuple):
    """Densify/sparsify pair wrapped around cross-cell ops (the dw conv).

    Attributes:
        grid_size: ViT grid (static).
        keep_ids: (batch, k) visible cell ids.
    """

    grid_size: Tuple[int, ...]
    keep_ids: jnp.ndarray

    @property
    def n_cells(self) -> int:
        return math.prod(self.grid_size)

    def densify(self, h: jnp.ndarray) -> jnp.ndarray:
        """(batch*k, *cell, C) -> (batch, *spatial, C) with zeros at masked cells."""
        batch, k = self.keep_ids.shape
        cells = h.reshape(batch, k, *h.shape[1:])
        dense = scatter_cells(cells, self.keep_ids, self.n_cells)
        return cells_to_image(dense, self.grid_size)

    def sparsify(self, dense: jnp.ndarray) -> jnp.ndarray:
        """(batch, *spatial, C) -> (batch*k, *cell, C)."""
        cells = image_to_cells(dense, self.grid_size)
        vis = gather_cells(cells, self.keep_ids)
        return vis.reshape(-1, *vis.shape[2:])
