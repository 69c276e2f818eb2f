"""Scaled-dot-product attention dispatch.

The reference relies on torch ``F.scaled_dot_product_attention``
(/root/reference/cinema/vit.py:505-511). Here the equivalent is a thin
dispatcher: the XLA path (``jax.nn.dot_product_attention``) fuses well for
this model's short sequences (<= ~5.4k tokens), and a Pallas flash-attention
kernel (``cinema_tpu.ops.pallas.flash_attention``) is available for the hot
encoder path on real TPUs.

Layout is (batch, n_tokens, n_heads, head_dim) throughout (BTNH) — the
native layout for both jax.nn attention and TPU flash kernels, avoiding the
two transposes the reference performs per attention call.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: Optional[jax.Array] = None,
    implementation: str = "auto",
) -> jnp.ndarray:
    """Compute softmax(q k^T / sqrt(d)) v.

    Args:
        q: (batch, n_q, n_heads, head_dim).
        k: (batch, n_k, n_heads, head_dim).
        v: (batch, n_k, n_heads, head_dim).
        dropout_rate: attention-prob dropout rate.
        deterministic: disable dropout when True.
        dropout_rng: PRNG key for dropout.
        implementation: 'auto' | 'xla' | 'pallas'.

    Returns:
        (batch, n_q, n_heads, head_dim).
    """
    use_dropout = (not deterministic) and dropout_rate > 0.0
    if implementation == "auto" and not use_dropout and jax.default_backend() == "tpu":
        # the Pallas flash kernel beats XLA SDPA 1.4-2.1x at this model's
        # sequence lengths (measured on v5e; see ops/pallas/flash_attention.py)
        implementation = "pallas"
    if implementation == "pallas" and not use_dropout:
        from cinema_tpu.ops.pallas.flash_attention import flash_attention

        return flash_attention(q, k, v)
    if use_dropout:
        # manual path: materialise probs so dropout can be applied (matches
        # the reference's fallback, vit.py:513-517)
        scale = q.shape[-1] ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        if dropout_rng is None:
            raise ValueError("dropout_rng required when dropout is active.")
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep.astype(probs.dtype) / (1.0 - dropout_rate)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    return jax.nn.dot_product_attention(q, k, v, implementation=None)
