"""Rotary position embeddings (reference: cinema/rotary.py, ESM3-derived).

Functional formulation: cos/sin tables are pure functions of the static
token count so they constant-fold under jit — no cache invalidation logic
(the reference rebuilds cached tables on device/dtype/mode changes,
rotary.py:84-106; under XLA the table is baked into the executable).

DELIBERATE DIVERGENCE from the reference: its Attention permutes q/k to
(batch, n_heads, n_tokens, head_dim) BEFORE calling RotaryEmbedding
(reference vit.py:498-503), whose apply_rotary_emb treats axis 1 as the
position axis (rotary.py:39) — so the reference rotates by HEAD index,
broadcasting one angle across all tokens, which defeats the point of RoPE.
This implementation applies true per-token rotation (position = token
index). The flag defaults off on both sides and no published checkpoint
uses it, so there is no checkpoint-compat concern; a reference-trained
rotary=True checkpoint would NOT be behaviour-compatible here.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rotary_cos_sin(
    n_tokens: int,
    dim: int,
    base: float = 10000.0,
    scaling_factor: float = 1.0,
    dtype: jnp.dtype = jnp.float32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Build cos/sin tables.

    Args:
        n_tokens: sequence length.
        dim: rotary dimension (head dim).
        base: theta base.
        scaling_factor: linear position scaling.
        dtype: table dtype.

    Returns:
        cos, sin: each (n_tokens, dim // 2).
    """
    inv_freq = 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    t = np.arange(n_tokens, dtype=np.float32) / scaling_factor
    freqs = np.outer(t, inv_freq)
    return jnp.asarray(np.cos(freqs), dtype=dtype), jnp.asarray(np.sin(freqs), dtype=dtype)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    """Rotate the vector counter-clockwise by 90 degrees (reference rotary.py:12-22)."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary_emb(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Apply rotary embeddings.

    Args:
        x: (batch, n_tokens, n_heads, head_dim).
        cos/sin: (>=n_tokens, rotary_dim / 2).

    Returns:
        rotated x, same shape.
    """
    ro_dim = cos.shape[-1] * 2
    if ro_dim > x.shape[-1]:
        raise ValueError(f"Rotary dim {ro_dim} is larger than the last dimension of x {x.shape[-1]}")
    n_tokens = x.shape[1]
    # (n_tokens, d/2) -> (n_tokens, 1, d) by tiling [c, c] along the last axis
    cos = jnp.tile(cos[:n_tokens], (1, 2))[:, None, :].astype(x.dtype)
    sin = jnp.tile(sin[:n_tokens], (1, 2))[:, None, :].astype(x.dtype)
    x_ro = x[..., :ro_dim] * cos + rotate_half(x[..., :ro_dim]) * sin
    if ro_dim == x.shape[-1]:
        return x_ro
    return jnp.concatenate([x_ro, x[..., ro_dim:]], axis=-1)


def apply_rotary(q: jnp.ndarray, k: jnp.ndarray, offset: int = 0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply rotary embeddings to q and k (reference rotary.py:108-128).

    Args:
        q, k: (batch, n_tokens, n_heads, head_dim), equal sequence lengths.
        offset: starting position offset.

    Returns:
        rotated (q, k).
    """
    if q.shape[1] != k.shape[1]:
        raise ValueError("q and k must have the same sequence length")
    cos, sin = rotary_cos_sin(q.shape[1] + offset, q.shape[-1], dtype=jnp.float32)
    cos, sin = cos[offset:], sin[offset:]
    return apply_rotary_emb(q, cos, sin), apply_rotary_emb(k, cos, sin)
