"""Sin/cos positional embeddings and resolution interpolation.

Numerically matches the reference (/root/reference/cinema/vit.py:347-443),
including its quirks that determine checkpoint compatibility:

- the position grid is built with ``np.meshgrid`` default ``indexing='xy'``
  (first two axes swapped) before flattening;
- the embedding dim is split evenly over axes with an even per-axis dim and
  the remainder zero-padded.

Embeddings are host-side numpy constants baked into the compiled program —
they are never trained, so there is no parameter traffic for them.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def get_1d_sincos_pos_embed_from_grid(
    embed_dim: int,
    grid: np.ndarray,
    max_period: int = 10000,
    dtype: np.dtype = np.float32,
) -> np.ndarray:
    """1-d sin/cos embedding for arbitrary positions.

    Args:
        embed_dim: output dim E (must be even).
        grid: positions, any shape with M elements.
        max_period: maximum frequency period.
        dtype: dtype of the frequency table.

    Returns:
        (M, E) array: first half sin, second half cos.
    """
    if embed_dim % 2 != 0:
        raise ValueError(f"Embedding dimension must be divisible by 2, got {embed_dim}.")
    half_dim = embed_dim // 2
    omega = np.arange(half_dim, dtype=dtype)
    omega = np.exp(-np.log(max_period) * omega / half_dim)
    pos = grid.reshape(-1)
    out = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_nd_sincos_pos_embed_from_grid(embed_dim: int, grid: np.ndarray) -> np.ndarray:
    """N-d sin/cos embedding from an (n, ...) grid of positions.

    The embed dim is divided by the number of axes, floored to an even number,
    and any remainder is zero padded (reference vit.py:386-405).
    """
    n = grid.shape[0]
    d = embed_dim // n
    d = d - d % 2
    pad = embed_dim - d * n
    emb = np.concatenate([get_1d_sincos_pos_embed_from_grid(d, grid[i]) for i in range(n)], axis=1)
    if pad > 0:
        emb = np.concatenate([emb, np.zeros((emb.shape[0], pad))], axis=1)
    return emb


def get_nd_sincos_pos_embed(embed_dim: int, grid_size: Sequence[int]) -> np.ndarray:
    """Sin/cos positional embedding for a regular grid.

    Args:
        embed_dim: output dim E.
        grid_size: per-axis grid size.

    Returns:
        (prod(grid_size), E) float32 array. NOTE: uses np.meshgrid 'xy'
        indexing to match the reference exactly (vit.py:421).
    """
    grid = np.stack(np.meshgrid(*[np.arange(size, dtype=np.float32) for size in grid_size]), axis=0)
    return get_nd_sincos_pos_embed_from_grid(embed_dim, grid).astype(np.float32)


def interpolate_pos_embed(
    pos_embed: jnp.ndarray,
    src_grid_size: Sequence[int],
    dst_grid_size: Sequence[int],
) -> jnp.ndarray:
    """Resample a flattened positional embedding to a new grid size.

    Mirrors DownsampleEncoder.interpolate_pos_encoding
    (/root/reference/cinema/convvit.py:140-163): bicubic for 2D, trilinear
    for 3D, antialias off. Uses jax.image.resize; for 2D the cubic kernel is
    Keys a=-0.5 vs torch bicubic a=-0.75, a sub-1e-2 relative difference that
    only matters for off-size inputs (published checkpoints use exact sizes).

    Args:
        pos_embed: (1, prod(src_grid), E) or (prod(src_grid), E).
        src_grid_size: grid the embedding was built for.
        dst_grid_size: grid to resample to.

    Returns:
        (1, prod(dst_grid), E) embedding.
    """
    src_grid_size = tuple(src_grid_size)
    dst_grid_size = tuple(dst_grid_size)
    squeeze = pos_embed.ndim == 2
    if squeeze:
        pos_embed = pos_embed[None]
    if src_grid_size == dst_grid_size:
        return pos_embed
    emb_dim = pos_embed.shape[-1]
    method = {2: "cubic", 3: "linear"}[len(src_grid_size)]
    x = pos_embed.reshape(1, *src_grid_size, emb_dim).astype(jnp.float32)
    x = jax.image.resize(x, (1, *dst_grid_size, emb_dim), method=method, antialias=False)
    return x.reshape(1, math.prod(dst_grid_size), emb_dim).astype(pos_embed.dtype)
