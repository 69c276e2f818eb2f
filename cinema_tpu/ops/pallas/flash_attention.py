"""Pallas TPU flash attention for the CineMA token regime.

The reference gets fused SDPA from torch/cuDNN (reference vit.py:505-511);
this is the TPU-native equivalent. Design choices for this model family
(<= ~5.4k tokens, head_dim 64, no causal mask):

- block-q / full-k kernel: per (batch, head, q-block) program the full K/V
  panel for that head lives in VMEM (5.4k x 64 x f32 ~= 1.4MB), so the
  softmax is computed in ONE pass over a (block_q, Tk) score tile — no
  online-softmax running state, fewer VPU ops than a streaming kernel at
  these lengths;
- f32 score/probability accumulation regardless of input dtype (bf16-safe);
- key-side padding masked with -inf via broadcasted iota;
- backward pass via jax.custom_vjp recomputing with XLA einsums — exact
  gradients, and XLA already fuses the backward well at these sizes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_k: int):
    """One (batch, head, q-block) program: softmax(q K^T) V in one pass.

    Refs are blocked on a (B, H, T, D) layout — TPU Pallas requires the
    blocked axes to be the trailing two dims.
    """
    q = q_ref[0, 0, :, :].astype(jnp.float32)  # (bq, d)
    k = k_ref[0, 0, :, :].astype(jnp.float32)  # (tk, d)
    v = v_ref[0, 0, :, :].astype(jnp.float32)  # (tk, d)

    scores = jax.lax.dot_general(
        q * scale,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, tk)

    tk_pad = scores.shape[-1]
    if tk_pad != n_k:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
        scores = jnp.where(col < n_k, scores, -jnp.inf)

    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    denom = jnp.sum(probs, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        probs,
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / denom
    o_ref[0, 0, :, :] = out.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _flash_forward(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int,
) -> jnp.ndarray:
    batch, n_q, n_heads, head_dim = q.shape
    n_k = k.shape[1]
    scale = head_dim**-0.5

    block_q = min(block_q, _round_up(n_q, 128))
    n_q_pad = _round_up(n_q, block_q)
    n_k_pad = _round_up(n_k, 128)
    # TPU Pallas blocks the trailing two dims: work in (B, H, T, D)
    q = jnp.transpose(q, (0, 2, 1, 3))
    k = jnp.transpose(k, (0, 2, 1, 3))
    v = jnp.transpose(v, (0, 2, 1, 3))
    if n_q_pad != n_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, n_q_pad - n_q), (0, 0)))
    if n_k_pad != n_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, n_k_pad - n_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, n_k_pad - n_k), (0, 0)))

    grid = (batch, n_heads, n_q_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((batch, n_heads, n_q_pad, head_dim), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, head_dim),
                lambda b, h, i: (b, h, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, n_k_pad, head_dim),
                lambda b, h, i: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, n_k_pad, head_dim),
                lambda b, h, i: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, head_dim),
            lambda b, h, i: (b, h, i, 0),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * n_heads * n_q_pad * n_k_pad * head_dim,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=batch * n_heads * n_q_pad * n_k_pad,
        ),
    )(q, k, v)
    return jnp.transpose(out[:, :, :n_q], (0, 2, 1, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = DEFAULT_BLOCK_Q,
) -> jnp.ndarray:
    """softmax(q k^T / sqrt(d)) v with a Pallas forward kernel.

    Args:
        q: (batch, n_q, n_heads, head_dim).
        k/v: (batch, n_k, n_heads, head_dim).
        block_q: q-block size (static).

    Returns:
        (batch, n_q, n_heads, head_dim), dtype of q.
    """
    return _flash_forward(q, k, v, block_q)


def _fwd(q, k, v, block_q):
    return _flash_forward(q, k, v, block_q), (q, k, v)


def _bwd(block_q, residuals, g):
    """Exact backward via XLA einsums (recompute probabilities)."""
    del block_q
    q, k, v = residuals
    scale = q.shape[-1] ** -0.5
    q32, k32, v32, g32 = (x.astype(jnp.float32) for x in (q, k, v, g))
    scores = jnp.einsum("bqhd,bkhd->bhqk", q32 * scale, k32)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    exp = jnp.exp(scores)
    probs = exp / jnp.sum(exp, axis=-1, keepdims=True)
    dv = jnp.einsum("bhqk,bqhd->bkhd", probs, g32)
    dprobs = jnp.einsum("bqhd,bkhd->bhqk", g32, v32)
    # softmax jacobian: dscores = probs * (dprobs - sum(dprobs * probs))
    dscores = probs * (dprobs - jnp.sum(dprobs * probs, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", dscores, k32) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", dscores, q32) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention.defvjp(_fwd, _bwd)
