"""Pallas K-folded 3x3(x3) convolution for small channel counts.

The ConvUNetR decoder's hot convs are 3^nd kernels at 32-128 channels on
full-resolution grids (reference convunetr.py:25-106 UpsampleDecoder +
image-level ConvResBlock). XLA lowers these as per-tap matmuls whose
contraction depth is only C_in, so a C=32 conv runs at a (32/128)x(32/128)
= ~6% MXU ceiling (~12 TFLOP/s on v5e, measured). This kernel folds all
27 (or 9) taps into one K = taps*C_in contraction via an in-VMEM im2col:

- layout: x reshaped to (B, X, P, C) with P = prod(trailing spatial); one
  program per (batch, x-row) with a 3-row halo read from a pre-padded copy
  via three shifted block views;
- each tap's slab is a statically-shifted row slice (sublane shifts; the
  z-boundary zeroing is folded into 3 pre-shift masked variants);
- slabs concatenate along lanes into the (P, taps*C) patch matrix and one
  dense dot_general hits the MXU at full contraction depth.

STATUS — experimental, NOT dispatched (mirrors ops/pallas/fused_stem.py's
history). Measured on v5e, bf16, (8,192,192,16,32)->32:

- conv in ISOLATION: 25.0 ms vs 77.2 ms XLA — 3.1x, bit-exact;
- conv inside the real ConvResBlock graph: XLA fuses the norm/GELU chain
  into its conv and lands at ~21 ms/conv (45.4 ms/block), while the
  pallas_call boundary breaks that fusion: the dispatched block measures
  65.8 ms and end-to-end serving regresses 28.1 -> 23.7 frames/s.

So XLA's in-context conv already beats this kernel's ceiling; kept (with
full parity tests incl. the fused LayerNorm+GELU pre-activation variant)
as the layout groundwork — native-5D halo blocks via clamped index maps,
free (tail,C)->(P,C) VMEM merges, pre-shift z-boundary masks — for a
future version that also folds the second conv + residual into one pass.

Backward runs through XLA's conv VJP (inference is the hot path; the
custom_vjp keeps fine-tuning correct at XLA speed).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-program VMEM budget for the patch matrix (bf16/f32 bytes)
_PATCH_VMEM_BUDGET = 6 * 2**20


def _conv_dimension_numbers(nd: int) -> Tuple[str, str, str]:
    spatial = "HWD"[:nd]
    return (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C")


def _xla_conv(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    nd = w.ndim - 2
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,) * nd,
        padding="SAME",
        dimension_numbers=_conv_dimension_numbers(nd),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def supported(
    x_shape: Sequence[int],
    kernel_size: Sequence[int],
    strides: Optional[Sequence[int]],
    padding: str,
    feature_group_count: int,
    dtype=jnp.bfloat16,
) -> bool:
    """True when ``conv3_same`` can replace this conv exactly and profitably."""
    nd = len(kernel_size)
    if nd not in (2, 3) or tuple(kernel_size) != (3,) * nd:
        return False
    if strides is not None and tuple(strides) != (1,) * nd:
        return False
    if padding != "SAME" or feature_group_count != 1:
        return False
    if len(x_shape) != nd + 2:
        return False
    chans = x_shape[-1]
    spatial = x_shape[1:-1]
    if chans % 8 != 0 or chans < 16 or chans > 128:
        return False
    p = math.prod(spatial[1:])
    if p % 8 != 0 or p < 128:
        return False
    n_taps = 3**nd
    itemsize = jnp.dtype(dtype).itemsize
    if p * n_taps * chans * itemsize > _PATCH_VMEM_BUDGET:
        return False
    return True


def _make_kernel(nd: int, p: int, chans: int, z: int, n_rows: int, preact: bool):
    if nd == 3:
        taps = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]
    else:
        taps = [(dx, dy, 0) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]

    def kernel(x0_ref, x1_ref, x2_ref, w_ref, *rest):
        if preact:
            ln_scale_ref, ln_bias_ref, o_ref = rest
        else:
            (o_ref,) = rest
        i = pl.program_id(1)

        def load(ref):
            m = ref[0, 0].reshape(p, chans)  # (Y,Z,C)->(P,C): layout-free merge
            if not preact:
                return m
            # fused pre-activation: LayerNorm (f32 stats) + exact GELU
            xf = m.astype(jnp.float32)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
            y = (xf - mean) * lax.rsqrt(var + 1e-5)
            y = y * ln_scale_ref[...] + ln_bias_ref[...]
            y = jax.nn.gelu(y, approximate=False)
            return y.astype(m.dtype)

        # halo rows come from clamped index maps; zero them at the borders
        rows = [
            jnp.where(i > 0, load(x0_ref), 0),
            load(x1_ref),
            jnp.where(i < n_rows - 1, load(x2_ref), 0),
        ]
        variants = {}
        if nd == 3:
            # z-boundary zeroing folded into pre-shift source masks: a +1
            # z-shift reads source z == 0 exactly at output z == Z-1 (the
            # SAME-padding zero), so zero those source rows once per dz
            zi = lax.broadcasted_iota(jnp.int32, (p, chans), 0) % z
            for dxi, m in enumerate(rows):
                variants[(dxi, 0)] = m
                variants[(dxi, 1)] = jnp.where(zi > 0, m, 0)
                variants[(dxi, -1)] = jnp.where(zi < z - 1, m, 0)
        else:
            for dxi, m in enumerate(rows):
                variants[(dxi, 0)] = m
        slabs = []
        for dx, dy, dz in taps:
            m = variants[(dx + 1, dz)]
            s = dy * z + dz if nd == 3 else dy
            if s > 0:
                shifted = jnp.concatenate([m[s:], jnp.zeros((s, chans), m.dtype)], axis=0)
            elif s < 0:
                shifted = jnp.concatenate([jnp.zeros((-s, chans), m.dtype), m[:s]], axis=0)
            else:
                shifted = m
            slabs.append(shifted)
        pmat = jnp.concatenate(slabs, axis=1)  # (P, taps*C)
        out = jax.lax.dot_general(
            pmat, w_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[0, 0] = out.reshape(o_ref.shape[2:]).astype(o_ref.dtype)

    return kernel


def _pallas_forward(
    x: jnp.ndarray,
    w: jnp.ndarray,
    ln_scale: Optional[jnp.ndarray] = None,
    ln_bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Blocks stay in the model's native (B, X, *tail, C) layout: the
    (tail, C)->(P, C) merge happens on VMEM tiles where it is free (tail
    dims are all sublane-major), avoiding HBM relayout copies; the x-row
    halo uses clamped index maps + in-kernel zeroing instead of a padded
    HBM copy. Optional fused pre-activation (LayerNorm+GELU) recovers the
    producer fusion XLA loses at the pallas_call boundary."""
    nd = w.ndim - 2
    batch = x.shape[0]
    n_rows = x.shape[1]
    spatial_tail = x.shape[2:-1]
    chans = x.shape[-1]
    cout = w.shape[-1]
    p = math.prod(spatial_tail)
    z = spatial_tail[-1] if nd == 3 else 1
    n_taps = 3**nd
    preact = ln_scale is not None

    # fold taps into the contraction: rows of wf are (tap-major, cin) —
    # exactly the (3,..,3,Cin) C-order flatten, matching slab order
    wf = w.reshape(n_taps * chans, cout)

    block_tail = (*spatial_tail, chans)

    def row_spec(dx):
        return pl.BlockSpec(
            (1, 1, *block_tail),
            lambda b, i, dx=dx: (b, jnp.clip(i + dx, 0, n_rows - 1), *(0,) * (nd)),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        row_spec(-1),
        row_spec(0),
        row_spec(1),
        pl.BlockSpec((n_taps * chans, cout), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [x, x, x, wf]
    if preact:
        in_specs += [
            pl.BlockSpec((1, chans), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chans), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ]
        operands += [
            ln_scale.astype(jnp.float32).reshape(1, chans),
            ln_bias.astype(jnp.float32).reshape(1, chans),
        ]

    out = pl.pallas_call(
        _make_kernel(nd, p, chans, z, n_rows, preact),
        out_shape=jax.ShapeDtypeStruct((batch, n_rows, *spatial_tail, cout), x.dtype),
        grid=(batch, n_rows),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, *spatial_tail, cout), lambda b, i: (b, i, *(0,) * nd), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * n_rows * p * n_taps * chans * cout,
            bytes_accessed=(x.size + wf.size + batch * n_rows * p * cout) * x.dtype.itemsize,
            transcendentals=batch * n_rows * p * chans if preact else 0,
        ),
    )(*operands)
    return out


@jax.custom_vjp
def conv3_same(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """3^nd 'SAME' stride-1 convolution, channels-last.

    Args:
        x: (batch, *spatial, C_in), nd = 2 or 3 spatial dims.
        w: (3, ..., 3, C_in, C_out) (flax HWDIO layout).

    Returns:
        (batch, *spatial, C_out), dtype of x.
    """
    return _pallas_forward(x, w)


def _fwd_rule(x, w):
    return _pallas_forward(x, w), (x, w)


def _bwd_rule(residuals, g):
    x, w = residuals
    _, vjp = jax.vjp(_xla_conv, x, w)
    return vjp(g.astype(x.dtype))


conv3_same.defvjp(_fwd_rule, _bwd_rule)


def _ref_preact_conv(x, w, ln_scale, ln_bias):
    """Reference composition for the fused kernel's backward/parity."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + 1e-5)
    y = y * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    y = jax.nn.gelu(y, approximate=False).astype(x.dtype)
    return _xla_conv(y, w)


@jax.custom_vjp
def preact_conv3_same(
    x: jnp.ndarray, w: jnp.ndarray, ln_scale: jnp.ndarray, ln_bias: jnp.ndarray
) -> jnp.ndarray:
    """Fused LayerNorm(eps 1e-5) -> exact GELU -> 3^nd SAME conv.

    The pre-activation runs inside the conv kernel's VMEM pass, restoring
    the producer fusion XLA loses at the pallas_call boundary (the
    ConvResBlock pattern, reference conv.py:276-346).
    """
    return _pallas_forward(x, w, ln_scale, ln_bias)


def _preact_fwd_rule(x, w, ln_scale, ln_bias):
    return _pallas_forward(x, w, ln_scale, ln_bias), (x, w, ln_scale, ln_bias)


def _preact_bwd_rule(residuals, g):
    x, w, ln_scale, ln_bias = residuals
    _, vjp = jax.vjp(_ref_preact_conv, x, w, ln_scale, ln_bias)
    return vjp(g.astype(x.dtype))


preact_conv3_same.defvjp(_preact_fwd_rule, _preact_bwd_rule)
