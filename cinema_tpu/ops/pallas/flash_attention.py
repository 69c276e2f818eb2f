"""Pallas TPU flash attention for the CineMA token regime.

The reference gets fused SDPA from torch/cuDNN (reference vit.py:505-511);
this is the TPU-native equivalent. Design choices for this model family
(<= ~5.4k tokens, head_dim 64, no causal mask):

- block-q / full-k kernel: per (batch, head, q-block) program the full K/V
  panel for that head lives in VMEM (5.4k x 64 x f32 ~= 1.4MB), so the
  softmax is computed in ONE pass over a (block_q, Tk) score tile — no
  online-softmax running state, fewer VPU ops than a streaming kernel at
  these lengths. A streaming (k-blocked online-softmax) variant for long
  keys was built and measured SLOWER on v5e even at T=2305 (serving
  40.1 vs 44.3 frames/s end-to-end) — the kernels are VPU-softmax bound,
  and k-blocking adds accumulator-rescale VPU passes without reducing
  softmax element count; pruned 2026-08-19, see docs/KERNEL_NOTES.md;
- f32 score/probability accumulation regardless of input dtype (bf16-safe);
- key-side padding needs NO mask pass in the packed kernels: padded K rows
  are exactly zero, so pad scores are exactly 0 and their softmax mass is
  a closed-form (bq, 1) denominator correction (see _packed_fwd_kernel);
- backward pass via jax.custom_vjp recomputing with XLA einsums — exact
  gradients, and XLA already fuses the backward well at these sizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 512
# Softmax in the log2 domain: exp(x) lowers to exp2(x * log2e) on the VPU,
# so folding log2e into the attention scale (applied to the small (bq, d)
# q tile, not the (bq, tk) score tile) saves one full-width multiply pass.
_LOG2E = 1.4426950408889634
# VMEM budget for the (block_q, n_k) f32 score/probability buffers; the
# compiler materializes ~5 of them live (scores/exp/probs/dprobs/dscores)
_SCORE_VMEM_BUDGET = 10 * 2**20


def _auto_block_q(
    n_q_pad: int, n_k_pad: int, requested: int, budget: int = _SCORE_VMEM_BUDGET
) -> int:
    """Largest 128-multiple block that keeps score buffers inside VMEM.

    Measured on v5e (decoder cross-attn B16 H16 Tq2305 Tk768 D32): bwd
    block 512 beats 128 by 1.28x (fewer programs, fewer dk/dv accumulation
    revisits); block 1024 regresses (spills).
    """
    cap = max(budget // (n_k_pad * 4 * 5), 128)
    block = min(requested, cap, n_q_pad)
    return max(block // 128 * 128, 128)


def _auto_block_q_fwd(n_q: int, n_k_pad: int, requested: int, budget: int) -> int:
    """Forward q-block: take a finer 128-multiple than the VMEM cap only
    when it cuts padded q rows by >= 20% — each extra program re-reads the
    K/V panels, so chasing small padding savings loses (measured on v5e:
    encoder Tq=769 block 384->128 saves 22% rows and 3%, but decoder
    Tq=2305 block 384->128 saves 9.5% rows and runs 2.3x SLOWER). The
    backward always keeps the coarse choice — more q-blocks also mean more
    dk/dv revisits (1.26x slower at fine blocks)."""
    cap = _auto_block_q(_round_up(n_q, 128), n_k_pad, requested, budget)
    cap_rows = _round_up(n_q, cap)
    best, best_rows = cap, cap_rows
    for block in range(128, cap + 1, 128):
        rows = _round_up(n_q, block)
        if rows < best_rows or (rows == best_rows and block > best):
            best, best_rows = block, rows
    if cap_rows - best_rows < 0.2 * cap_rows:
        return cap
    return best


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_k: int):
    """One (batch, head, q-block) program: softmax(q K^T) V in one pass.

    Refs are blocked on a (B, H, T, D) layout — TPU Pallas requires the
    blocked axes to be the trailing two dims.
    """
    q = q_ref[0, 0, :, :].astype(jnp.float32)  # (bq, d)
    k = k_ref[0, 0, :, :].astype(jnp.float32)  # (tk, d)
    v = v_ref[0, 0, :, :].astype(jnp.float32)  # (tk, d)

    scores = jax.lax.dot_general(
        q * (scale * _LOG2E),
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, tk), log2 domain

    tk_pad = scores.shape[-1]
    if tk_pad != n_k:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
        scores = jnp.where(col < n_k, scores, -jnp.inf)

    probs = jnp.exp2(scores - jnp.max(scores, axis=-1, keepdims=True))
    # The softmax denominator rides the PV matmul: a ones column appended to
    # v lands in MXU lane padding (d < 128), so rowsum(probs) costs no extra
    # MXU time and skips a full (bq, tk) VPU reduction pass.
    v_aug = jnp.concatenate([v, jnp.ones((v.shape[0], 1), jnp.float32)], axis=1)
    out_aug = jax.lax.dot_general(
        probs,
        v_aug,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d = v.shape[1]
    out = out_aug[:, :d] / out_aug[:, d : d + 1]
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

    n_k_pad = _round_up(n_k, 128)
    block_q = _auto_block_q_fwd(n_q, n_k_pad, block_q, _SCORE_VMEM_BUDGET)
    n_q_pad = _round_up(n_q, block_q)
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
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
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
    out = _flash_forward(q, k, v, block_q)
    return out, (q, k, v, out)


DEFAULT_BLOCK_Q_BWD = 512


def _flash_bwd_kernel(
    q_ref, k_ref, v_ref, g_ref, o_ref, dq_ref, dk_ref, dv_ref, *, scale: float, n_k: int
):
    """One (b, h, q-block) program of the flash backward.

    Recomputes the q-block's probabilities (full K in VMEM), applies the
    softmax Jacobian with the delta trick (delta = rowsum(g * out)), writes
    dq for the block and accumulates dk/dv across q-blocks — the (b, h)
    dk/dv output block is revisited over the innermost grid dim.
    """
    i = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    g = g_ref[0, 0].astype(jnp.float32)
    o = o_ref[0, 0].astype(jnp.float32)

    scores = jax.lax.dot_general(
        q * (scale * _LOG2E), k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    tk_pad = scores.shape[-1]
    if tk_pad != n_k:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
        scores = jnp.where(col < n_k, scores, -jnp.inf)
    exp = jnp.exp2(scores - jnp.max(scores, axis=-1, keepdims=True))
    probs = exp / jnp.sum(exp, axis=-1, keepdims=True)

    # dprobs deliberately does NOT depend on the softmax recompute above, so
    # Mosaic overlaps this matmul (MXU) with the exp/reduction chain (VPU).
    delta = jnp.sum(g * o, axis=-1, keepdims=True)  # (bq, 1)
    dprobs = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, tk)
    dscores = probs * (dprobs - delta)

    dq_ref[0, 0] = (
        jax.lax.dot_general(dscores, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        * scale
    ).astype(dq_ref.dtype)

    @pl.when(i == 0)
    def _init():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    dk_ref[0, 0] += (
        jax.lax.dot_general(dscores, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        * scale
    ).astype(dk_ref.dtype)
    dv_ref[0, 0] += jax.lax.dot_general(
        probs, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)


def _bwd(block_q, residuals, g):
    """Pallas flash backward: no (Tq, Tk) probability tensors ever touch HBM."""
    del block_q
    q, k, v, out = residuals
    batch, n_q, n_heads, head_dim = q.shape
    n_k = k.shape[1]
    scale = head_dim**-0.5

    n_k_pad = _round_up(n_k, 128)
    block_q = _auto_block_q(_round_up(n_q, 128), n_k_pad, DEFAULT_BLOCK_Q_BWD)
    n_q_pad = _round_up(n_q, block_q)

    def to_bhtd(x, pad_to):
        x = jnp.transpose(x, (0, 2, 1, 3))
        if pad_to != x.shape[2]:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_to - x.shape[2]), (0, 0)))
        return x

    qt, gt, ot = (to_bhtd(x, n_q_pad) for x in (q, g, out))
    kt, vt = (to_bhtd(x, n_k_pad) for x in (k, v))

    grid = (batch, n_heads, n_q_pad // block_q)
    q_spec = pl.BlockSpec((1, 1, block_q, head_dim), lambda b, h, i: (b, h, i, 0), memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, 1, n_k_pad, head_dim), lambda b, h, i: (b, h, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_kernel, scale=scale, n_k=n_k),
        out_shape=(
            jax.ShapeDtypeStruct((batch, n_heads, n_q_pad, head_dim), q.dtype),
            jax.ShapeDtypeStruct((batch, n_heads, n_k_pad, head_dim), jnp.float32),
            jax.ShapeDtypeStruct((batch, n_heads, n_k_pad, head_dim), jnp.float32),
        ),
        grid=grid,
        in_specs=[q_spec, k_spec, k_spec, q_spec, q_spec],
        out_specs=(q_spec, k_spec, k_spec),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=10 * batch * n_heads * n_q_pad * n_k_pad * head_dim,
            bytes_accessed=2 * (q.size + k.size + v.size) * 4,
            transcendentals=batch * n_heads * n_q_pad * n_k_pad,
        ),
    )(qt, kt, vt, gt, ot)

    def from_bhtd(x, n, dtype):
        return jnp.transpose(x[:, :, :n], (0, 2, 1, 3)).astype(dtype)

    return from_bhtd(dq, n_q, q.dtype), from_bhtd(dk, n_k, k.dtype), from_bhtd(dv, n_k, v.dtype)


flash_attention.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Packed-layout flash attention: (batch, tokens, embed) in HBM, heads split
# in VMEM.
#
# Why: (B, T, H, D) arrays with D=32 (the CineMA decoder) are lane-padded
# 4x in HBM on TPU — every transpose/pad around the per-head kernel repacks
# 4x-inflated buffers, and the kernel itself reads 4x the bytes. Keeping
# q/k/v packed as (B, T, E) (E = n_heads * head_dim, a lane multiple) makes
# all HBM traffic dense and moves the head split into VMEM where it is a
# cheap relayout. Measured on v5e at the decoder shape (B16 Tq2305 Tk768
# H16 D32): fwd+bwd 10.1ms (blocked per-head kernel) -> see bench notes.
# ---------------------------------------------------------------------------


def _pick_head_groups(n_heads: int, head_dim: int, embed: int, n_k_pad: int) -> int:
    """Split heads over a grid axis so per-program k/v/dk/dv buffers fit VMEM."""
    candidates = [g for g in (1, 2, 3, 4, 6, 8) if n_heads % g == 0 and (embed // g) % 128 == 0]
    if not candidates:  # sub-lane embed dims (tiny/test models): no split
        return 1
    for groups in candidates:
        # k, v (bf16-ish) + dk, dv (f32) panels per program
        panel_bytes = n_k_pad * (embed // groups) * (2 + 2 + 4 + 4)
        if panel_bytes <= 6 * 2**20:
            return groups
    return candidates[-1]


def _packed_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_k: int, heads: int):
    """One (batch, head-group, q-block) program over packed (T, E_g) panels.

    Key-side padding needs NO (bq, tk) mask pass: padded K rows are exactly
    zero, so every padding column's score is exactly 0 and its softmax mass
    is exp2(-m) — subtracted from the denominator in closed form (a (bq, 1)
    op instead of a full-width select; the padded V rows are zero so the
    numerator is untouched). m = max(scores, 0) >= the true row max keeps
    exp2 overflow-free; the only divergence from the masked softmax is the
    pathological all-scores-below-2^-126 row, impossible for layernormed
    activations.
    """
    eg = q_ref.shape[-1]
    d = eg // heads
    k_all = k_ref[0]
    v_all = v_ref[0]
    q_all = q_ref[0]
    n_pad = k_all.shape[0] - n_k
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh = q_all[:, sl].astype(jnp.float32) * (scale * _LOG2E)
        kh = k_all[:, sl].astype(jnp.float32)
        vh = v_all[:, sl].astype(jnp.float32)
        scores = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m = jnp.max(scores, axis=-1, keepdims=True)  # >= true max (pads are 0)
        probs = jnp.exp2(scores - m)
        # denominator rides the PV matmul (ones column in MXU lane padding)
        v_aug = jnp.concatenate(
            [vh, jnp.ones((vh.shape[0], 1), jnp.float32)], axis=1
        )
        out_aug = jax.lax.dot_general(
            probs, v_aug, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        denom = out_aug[:, d : d + 1]
        if n_pad:
            # floor keeps the pathological all-scores-far-below-0 row finite
            # (pad mass then dominates the MXU-summed denominator and the
            # subtraction cancels catastrophically); impossible for
            # layernormed activations, free on the (bq, 1) column
            denom = jnp.maximum(denom - n_pad * jnp.exp2(-m), 1e-30)
        out = out_aug[:, :d] / denom
        o_ref[0, :, sl] = out.astype(o_ref.dtype)


def _packed_bwd_kernel(
    q_ref, k_ref, v_ref, g_ref, o_ref, dq_ref, dk_ref, dv_ref, *, scale: float, n_k: int, heads: int
):
    """dq for the q-block; dk/dv accumulated across q-blocks (innermost grid)."""
    i = pl.program_id(2)
    eg = q_ref.shape[-1]
    d = eg // heads

    @pl.when(i == 0)
    def _init():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    # padding handled like the fwd kernel: pad scores are exactly 0, their
    # mass is subtracted from the denominator in closed form. The resulting
    # nonzero pad-column probs cannot leak into gradients: dq sums them
    # against zero K rows, and the dk/dv pad rows are sliced off outside.
    n_pad = k_ref.shape[1] - n_k
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh = q_ref[0, :, sl].astype(jnp.float32)
        kh = k_ref[0, :, sl].astype(jnp.float32)
        vh = v_ref[0, :, sl].astype(jnp.float32)
        gh = g_ref[0, :, sl].astype(jnp.float32)
        oh = o_ref[0, :, sl].astype(jnp.float32)

        scores = jax.lax.dot_general(
            qh * (scale * _LOG2E),
            kh,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(scores, axis=-1, keepdims=True)
        exp = jnp.exp2(scores - m)
        denom = jnp.sum(exp, axis=-1, keepdims=True)
        if n_pad:
            # same closed-form pad-mass subtraction + floor as the fwd kernel
            denom = jnp.maximum(denom - n_pad * jnp.exp2(-m), 1e-30)
        probs = exp / denom

        # dprobs does not depend on the softmax recompute: MXU/VPU overlap
        # (the g_s = g/denom variant serialized them and lost 10-14%).
        delta = jnp.sum(gh * oh, axis=-1, keepdims=True)
        dprobs = jax.lax.dot_general(
            gh, vh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dscores = probs * (dprobs - delta)

        dq_ref[0, :, sl] = (
            jax.lax.dot_general(
                dscores, kh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
        ).astype(dq_ref.dtype)
        dk_ref[0, :, sl] += (
            jax.lax.dot_general(
                dscores, qh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            * scale
        ).astype(dk_ref.dtype)
        dv_ref[0, :, sl] += jax.lax.dot_general(
            probs, gh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)


def _packed_specs(block_q: int, n_k_pad: int, eg: int):
    q_spec = pl.BlockSpec((1, block_q, eg), lambda b, j, i: (b, i, j), memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, n_k_pad, eg), lambda b, j, i: (b, 0, j), memory_space=pltpu.VMEM)
    return q_spec, k_spec


def _packed_forward(q, k, v, n_heads: int, block_q: int):
    batch, n_q, embed = q.shape
    n_k = k.shape[1]
    head_dim = embed // n_heads
    scale = head_dim**-0.5
    n_k_pad = _round_up(n_k, 128)
    groups = _pick_head_groups(n_heads, head_dim, embed, n_k_pad)
    eg = embed // groups
    # 15MB score budget (v5e-swept 2026-08-19: 15MB beats 7/22/30MB at all
    # three model shapes — serving enc block 128->256 cuts K/V panel
    # re-reads 2x for -4%, pretrain enc 384->512). The old 7MB cap dated
    # from the masked kernel whose live where/select buffers overflowed
    # scoped VMEM at block 512; the maskless kernel keeps 2 live
    # (block_q, n_k) buffers, not 3.
    import os

    budget = int(os.environ.get("CINEMA_TPU_PACKED_FWD_BUDGET", 15 * 2**20))
    block_q = _auto_block_q_fwd(n_q, n_k_pad, block_q, budget)
    n_q_pad = _round_up(n_q, block_q)

    if n_q_pad != n_q:
        q = jnp.pad(q, ((0, 0), (0, n_q_pad - n_q), (0, 0)))
    if n_k_pad != n_k:
        k = jnp.pad(k, ((0, 0), (0, n_k_pad - n_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, n_k_pad - n_k), (0, 0)))

    q_spec, k_spec = _packed_specs(block_q, n_k_pad, eg)
    out = pl.pallas_call(
        functools.partial(
            _packed_fwd_kernel, scale=scale, n_k=n_k, heads=n_heads // groups
        ),
        out_shape=jax.ShapeDtypeStruct((batch, n_q_pad, embed), q.dtype),
        grid=(batch, groups, n_q_pad // block_q),
        in_specs=[q_spec, k_spec, k_spec],
        out_specs=q_spec,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * n_q_pad * n_k_pad * embed,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=batch * n_heads * n_q_pad * n_k_pad,
        ),
    )(q, k, v)
    return out[:, :n_q]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_packed(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    n_heads: int,
    block_q: int = DEFAULT_BLOCK_Q,
) -> jnp.ndarray:
    """Multi-head attention on packed (batch, tokens, embed) arrays.

    Heads are split inside the kernel; no (B, T, H, D) array ever exists in
    HBM (those are lane-padded up to 4x for head_dim 32).

    Args:
        q: (batch, n_q, embed).
        k/v: (batch, n_k, embed).
        n_heads: number of heads; embed % n_heads == 0.

    Returns:
        (batch, n_q, embed), dtype of q.
    """
    return _packed_forward(q, k, v, n_heads, block_q)


def _packed_fwd_rule(q, k, v, n_heads, block_q):
    out = _packed_forward(q, k, v, n_heads, block_q)
    return out, (q, k, v, out)


def _packed_bwd_rule(n_heads, block_q, residuals, g):
    del block_q
    q, k, v, out = residuals
    batch, n_q, embed = q.shape
    n_k = k.shape[1]
    head_dim = embed // n_heads
    scale = head_dim**-0.5
    n_k_pad = _round_up(n_k, 128)
    groups = _pick_head_groups(n_heads, head_dim, embed, n_k_pad)
    eg = embed // groups
    # the packed bwd keeps k/v/dk/dv panels + per-head score buffers live;
    # halve the score budget vs the per-head kernel (28.9M scoped-vmem OOM
    # at block 512, dec shape)
    import os

    # v5e-swept 2026-08-19 (fwd+bwd p50 ms at 5/10/15/20 MB): self-attn
    # wants the bigger q-blocks — serving enc Tq=Tk=2305: 11.15/11.04/
    # 10.23/10.23; pretrain enc Tq=Tk=769: 5.12/4.98/4.92/5.16 — while
    # cross-attn (decoder Tq2305 Tk769: 9.89/10.58/10.61/10.89) prefers
    # the original 5 MB (its dk/dv panels already occupy the VMEM that
    # bigger score blocks would need)
    default_budget = 15 * 2**20 if n_q == n_k else _SCORE_VMEM_BUDGET // 2
    bwd_budget = int(os.environ.get("CINEMA_TPU_PACKED_BWD_BUDGET", default_budget))
    block_q = _auto_block_q(
        _round_up(n_q, 128), n_k_pad, DEFAULT_BLOCK_Q_BWD, budget=bwd_budget
    )
    n_q_pad = _round_up(n_q, block_q)

    def pad_t(x, t):
        return jnp.pad(x, ((0, 0), (0, t - x.shape[1]), (0, 0))) if x.shape[1] != t else x

    qt, gt, ot = (pad_t(x, n_q_pad) for x in (q, g, out))
    kt, vt = (pad_t(x, n_k_pad) for x in (k, v))

    q_spec, k_spec = _packed_specs(block_q, n_k_pad, eg)
    dq, dk, dv = pl.pallas_call(
        functools.partial(
            _packed_bwd_kernel, scale=scale, n_k=n_k, heads=n_heads // groups
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, n_q_pad, embed), q.dtype),
            jax.ShapeDtypeStruct((batch, n_k_pad, embed), jnp.float32),
            jax.ShapeDtypeStruct((batch, n_k_pad, embed), jnp.float32),
        ),
        grid=(batch, groups, n_q_pad // block_q),
        in_specs=[q_spec, k_spec, k_spec, q_spec, q_spec],
        out_specs=(q_spec, k_spec, k_spec),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=10 * batch * n_q_pad * n_k_pad * embed,
            bytes_accessed=2 * (q.size + k.size + v.size) * 4,
            transcendentals=batch * n_heads * n_q_pad * n_k_pad,
        ),
    )(qt, kt, vt, gt, ot)
    return (
        dq[:, :n_q],
        dk[:, :n_k].astype(k.dtype),
        dv[:, :n_k].astype(v.dtype),
    )


flash_attention_packed.defvjp(_packed_fwd_rule, _packed_bwd_rule)
