"""Fused Pallas kernel for the ConvMAE stem's MaskedConvBlock.

The block (reference conv.py:349-415)

    x += conv2(dw5(mask * conv1(norm1(x))));  x += mlp(norm2(x))

is HBM-bound in XLA: ~12 tensor round trips over big 5D activations whose
channels-last layout (C=64 lanes) is 2x lane-padded, measured at <10% of
HBM peak per op (v5e). This kernel computes the whole block in one pass:

- layout: channels in SUBLANES, flattened padded spatial in LANES —
  ``(B, X+4, C, (Y+4)*(Z+4))`` — so every buffer is lane-dense, LayerNorm
  is a sublane reduction, the 1x1 convs / MLP are (C, L) MXU matmuls, and
  the 5^3 depthwise conv is 125 lane-shifted multiply-accumulates (VPU);
- the X halo comes from five size-1-block views of the padded input with
  shifted index maps (Pallas only partial-blocks the trailing two dims);
  the Y/Z halo is pre-padded into the lane dim;
- the visibility mask (MAE) is pre-padded with zeros, so one multiply
  implements both the reference's mask semantics and zero 'SAME' padding
  for the depthwise conv;
- halo lanes of the output carry garbage and are sliced away on exit —
  every op after the depthwise conv is positionwise.

Backward runs the same math via jax.vjp over a pure-jnp reference
composition (exact gradients).

STATUS — experimental, NOT dispatched from MaskedConvBlock. Measured on
v5e (batch 16): level-1 SAX (48,48,16,64) fused fwd 28.1ms vs XLA 12.4ms;
level-2 16.7 vs 5.2; LAX 6.7 vs 3.1. The depthwise conv is VPU-bound at
these shapes (~8.3M FMAs/row-program) and XLA's conv implementation is
already near that bound, while this kernel's 125 unaligned lane-shifted
slices each cost a VMEM relayout that swamps the fusion win from the
surrounding pointwise ops (~7ms/block at level 1). Kept with full parity
tests (tests/test_fused_stem.py) as the layout groundwork
(channels-in-sublanes, spatial-in-lanes, shifted-row halo views) for a
follow-up that keeps XLA's conv and fuses only the pointwise segments.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 2  # depthwise kernel 5 => 2-wide halo on every spatial axis


def _erf(x):
    """Abramowitz-Stegun 7.1.26 erf (max abs err 1.5e-7) — Pallas TPU has no
    erf/erfc lowering; the error is far below bf16 activation resolution."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _ln_sublane(x, scale, bias, eps):
    """LayerNorm over the channel (sublane) axis of a (C, L) panel."""
    mean = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=0, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _matmul_cl(w, x):
    """(Cin, Cout) weights applied to a (Cin, L) panel -> (Cout, L)."""
    return jax.lax.dot_general(
        w.astype(jnp.float32),
        x,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel(
    x0, x1, x2, x3, x4,
    m0, m1, m2, m3, m4,
    w1, b1c, dww, bdw, w2, b2c,
    s1, b1n, s2, b2n,
    wf1, bf1, wf2, bf2,
    out_ref,
    hp_ref,
    *,
    eps: float,
    zp: int,
    nd: int,
):
    """One (batch, x-row) program: full MaskedConvBlock for one output row."""
    x_rows = [x0, x1, x2, x3, x4]
    m_rows = [m0, m1, m2, m3, m4]
    chans, length = out_ref.shape[-2], out_ref.shape[-1]
    n_taps_row = 25 if nd == 3 else 5
    pad = 2 * zp + 2 if nd == 3 else 2

    s1v = s1[:].astype(jnp.float32)
    b1v = b1n[:].astype(jnp.float32)

    # One x-row of the 5-row window at a time to bound VMEM liveness:
    # norm1 -> conv1 -> mask multiply (the mask is zero on every padded
    # position, which zeroes the halo so the depthwise conv sees 'SAME'
    # zero padding), then that row's depthwise taps in a fori_loop so the
    # Mosaic stack holds one slice buffer instead of 25 unrolled ones.
    acc = jnp.zeros((chans, length), jnp.float32)
    hp_ref[:, :pad] = jnp.zeros((chans, pad), jnp.float32)
    hp_ref[:, pad + length :] = jnp.zeros((chans, pad), jnp.float32)
    for dx in range(5):
        xv = x_rows[dx][0, 0].astype(jnp.float32)  # (C, L)
        ln = _ln_sublane(xv, s1v, b1v, eps)
        h = _matmul_cl(w1[:], ln.astype(w1.dtype)) + b1c[:].astype(jnp.float32)
        h = h * m_rows[dx][0, 0].astype(jnp.float32)
        hp_ref[:, pad : pad + length] = h

        # static unaligned ref slices: reads come straight out of the
        # scratch, so the unrolled taps do not pile up stack buffers
        for j in range(n_taps_row):
            if nd == 3:
                start = pad + (j // 5 - 2) * zp + (j % 5 - 2)
            else:
                start = pad + (j - 2)
            w_col = dww[dx * n_taps_row + j, :].astype(jnp.float32).reshape(chans, 1)
            acc = acc + hp_ref[:, start : start + length] * w_col
    acc = acc + bdw[:].astype(jnp.float32)

    f = _matmul_cl(w2[:], acc.astype(w2.dtype)) + b2c[:].astype(jnp.float32)
    y = x_rows[2][0, 0].astype(jnp.float32) + f

    ln2 = _ln_sublane(y, s2[:].astype(jnp.float32), b2n[:].astype(jnp.float32), eps)
    # MLP in hidden-dim chunks: full (4C, L) f32 erf temporaries would
    # dominate the VMEM stack
    hidden = wf1.shape[-1]
    n_chunks = max(hidden // max(chans, 64), 1)
    chunk = hidden // n_chunks

    v = jnp.zeros((chans, length), jnp.float32)
    for k in range(n_chunks):
        wf1_k = wf1[:, k * chunk : (k + 1) * chunk].astype(jnp.float32)
        bf1_k = bf1[k * chunk : (k + 1) * chunk, :].astype(jnp.float32)
        u = _matmul_cl(wf1_k, ln2) + bf1_k
        g = 0.5 * u * (1.0 + _erf(u * 0.7071067811865476))
        wf2_k = wf2[k * chunk : (k + 1) * chunk, :].astype(jnp.float32)
        v = v + _matmul_cl(wf2_k, g)
    v = v + bf2[:].astype(jnp.float32)
    out_ref[0, 0] = (y + v).astype(out_ref.dtype)


def _extract_params(p: Dict[str, Any]) -> Tuple[jnp.ndarray, ...]:
    """Pull MaskedConvBlock weights out of its flax param subtree."""

    def col(v):  # (C,) vectors as (C, 1) sublane columns
        return jnp.asarray(v).reshape(-1, 1)

    w1 = jnp.asarray(p["conv1"]["conv"]["kernel"])
    w1 = w1.reshape(w1.shape[-2], w1.shape[-1])
    dww = jnp.asarray(p["dw_conv"]["conv"]["kernel"])
    dww = dww.reshape(-1, dww.shape[-1])  # (taps, C), (dx, dy[, dz]) row-major
    w2 = jnp.asarray(p["conv2"]["conv"]["kernel"])
    w2 = w2.reshape(w2.shape[-2], w2.shape[-1])
    wf1 = jnp.asarray(p["mlp"]["fc1"]["conv"]["kernel"])
    wf1 = wf1.reshape(wf1.shape[-2], wf1.shape[-1])
    wf2 = jnp.asarray(p["mlp"]["fc2"]["conv"]["kernel"])
    wf2 = wf2.reshape(wf2.shape[-2], wf2.shape[-1])
    return (
        w1, col(p["conv1"]["conv"]["bias"]),
        dww, col(p["dw_conv"]["conv"]["bias"]),
        w2, col(p["conv2"]["conv"]["bias"]),
        col(p["norm1"]["scale"]), col(p["norm1"]["bias"]),
        col(p["norm2"]["scale"]), col(p["norm2"]["bias"]),
        wf1, col(p["mlp"]["fc1"]["conv"]["bias"]),
        wf2, col(p["mlp"]["fc2"]["conv"]["bias"]),
    )


def _fused_forward(
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    params: Dict[str, Any],
    eps: float,
) -> jnp.ndarray:
    nd = x.ndim - 2
    batch, *spatial, chans = x.shape
    pads = ((0, 0),) + ((HALO, HALO),) * nd + ((0, 0),)
    xp = jnp.pad(x, pads)
    if mask is None:
        m = jnp.ones((batch, *spatial), x.dtype)
    else:
        m = mask.astype(x.dtype)
    mp = jnp.pad(m, ((0, 0),) + ((HALO, HALO),) * nd)

    if nd == 3:
        x_sub, y_sub, z_sub = spatial
        zp = z_sub + 2 * HALO
        length = (y_sub + 2 * HALO) * zp
        xt = jnp.transpose(xp, (0, 1, 4, 2, 3)).reshape(batch, x_sub + 4, chans, length)
        mt = mp.reshape(batch, x_sub + 4, 1, length)
    elif nd == 2:
        x_sub, y_sub = spatial
        zp = 0
        length = y_sub + 2 * HALO
        xt = jnp.transpose(xp, (0, 1, 3, 2))
        mt = mp.reshape(batch, x_sub + 4, 1, length)
    else:
        raise ValueError(f"MaskedConvBlock supports 2D/3D, got {nd}D.")

    weights = _extract_params(params)
    hidden = weights[10].shape[-1]

    def x_spec(d):
        return pl.BlockSpec(
            (1, 1, chans, length), lambda b, i, d=d: (b, i + d, 0, 0), memory_space=pltpu.VMEM
        )

    def m_spec(d):
        # the dummy sublane dim keeps the trailing-two block shape legal
        return pl.BlockSpec(
            (1, 1, 1, length), lambda b, i, d=d: (b, i + d, 0, 0), memory_space=pltpu.VMEM
        )

    w_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_t = pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps, zp=zp, nd=nd),
        out_shape=jax.ShapeDtypeStruct((batch, x_sub, chans, length), x.dtype),
        grid=(batch, x_sub),
        in_specs=[x_spec(d) for d in range(5)]
        + [m_spec(d) for d in range(5)]
        + [w_spec] * len(weights),
        out_specs=pl.BlockSpec(
            (1, 1, chans, length), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((chans, length + 2 * (2 * zp + 2 if nd == 3 else 2)), jnp.float32)
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=batch * x_sub * length * chans * (2 * chans * 2 + 2 * hidden * 2 + 125 * 2),
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=batch * x_sub * length * hidden,
        ),
    )(*([xt] * 5 + [mt] * 5), *weights)

    if nd == 3:
        out = out_t.reshape(batch, x_sub, chans, y_sub + 2 * HALO, zp)
        out = out[:, :, :, HALO : HALO + y_sub, HALO : HALO + z_sub]
        return jnp.transpose(out, (0, 1, 3, 4, 2))
    out = out_t[:, :, :, HALO : HALO + y_sub]
    return jnp.transpose(out, (0, 1, 3, 2))


def reference_masked_conv_block(
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    params: Dict[str, Any],
    eps: float,
) -> jnp.ndarray:
    """Pure-jnp composition of the block (used for the backward pass and as
    the parity oracle; mirrors models/layers.py MaskedConvBlock with
    dropout/drop-path off)."""
    nd = x.ndim - 2
    chans = x.shape[-1]

    def ln(v, p):
        v32 = v.astype(jnp.float32)
        mean = v32.mean(-1, keepdims=True)
        var = jnp.square(v32 - mean).mean(-1, keepdims=True)
        return (v32 - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]

    def conv1x1(v, p):
        k = jnp.asarray(p["conv"]["kernel"])
        k = k.reshape(k.shape[-2], k.shape[-1]).astype(jnp.float32)
        return v @ k + jnp.asarray(p["conv"]["bias"]).astype(jnp.float32)

    h = conv1x1(ln(x, params["norm1"]), params["conv1"])
    if mask is not None:
        h = h * mask.astype(h.dtype)[..., None]
    dww = jnp.asarray(params["dw_conv"]["conv"]["kernel"]).astype(jnp.float32)
    dn = ("NHWC", "HWIO", "NHWC") if nd == 2 else ("NHWDC", "HWDIO", "NHWDC")
    h = jax.lax.conv_general_dilated(
        h, dww, (1,) * nd, "SAME", dimension_numbers=dn, feature_group_count=chans
    ) + jnp.asarray(params["dw_conv"]["conv"]["bias"]).astype(jnp.float32)
    y = x.astype(jnp.float32) + conv1x1(h, params["conv2"])
    u = conv1x1(ln(y, params["norm2"]), params["mlp"]["fc1"])
    v = conv1x1(jax.nn.gelu(u, approximate=False), params["mlp"]["fc2"])
    return (y + v).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_masked_conv_block(
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    params: Dict[str, Any],
    eps: float = 1e-6,
) -> jnp.ndarray:
    """MaskedConvBlock forward as ONE Pallas kernel.

    Args:
        x: (batch, *spatial, chans), 2D or 3D spatial, channels-last.
        mask: optional (batch, *spatial) visibility mask (1 = keep).
        params: the block's flax param subtree (norm1/conv1/dw_conv/conv2/
            norm2/mlp with the Conv wrapper's inner 'conv' level).
        eps: LayerNorm epsilon (get_conv_norm default, reference conv.py:190).
    """
    return _fused_forward(x, mask, params, eps)


def _fwd_rule(x, mask, params, eps):
    return _fused_forward(x, mask, params, eps), (x, mask, params)


def _bwd_rule(eps, residuals, g):
    x, mask, params = residuals
    _, vjp = jax.vjp(lambda xx, pp: reference_masked_conv_block(xx, mask, pp, eps), x, params)
    dx, dparams = vjp(g.astype(jnp.float32))
    return dx.astype(x.dtype), None, dparams


fused_masked_conv_block.defvjp(_fwd_rule, _bwd_rule)
