"""Primitive NN layers (reference: cinema/conv.py), TPU-native.

Design differences from the reference:

- channels-LAST tensors ``(batch, *spatial, chans)`` everywhere — XLA's
  preferred TPU conv layout; 'layer' norm becomes a plain last-axis
  LayerNorm with no permutes (the reference permutes NCHW<->NHWC per call,
  conv.py:169-187);
- no per-layer ``set_grad_ckpt`` plumbing: rematerialisation is applied
  functionally with ``nn.remat`` / ``jax.checkpoint`` at the block level by
  the owning model (see vit.py / mae.py);
- norm statistics are computed in float32 regardless of the compute dtype
  (bf16-safe), then cast back.

Initialisation parity: Linear layers use xavier-uniform + zero bias
(reference vit.py:32-48); conv layers keep the torch default
kaiming-uniform(a=sqrt(5)) == variance_scaling(1/3, fan_in, uniform) with
matching uniform bias so training-from-scratch statistics line up.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any
KernelSize = Union[int, Sequence[int]]

# torch nn.Linear/Conv default weight init: kaiming_uniform(a=sqrt(5))
# == U(-1/sqrt(fan_in), 1/sqrt(fan_in)) == variance_scaling(1/3, fan_in, uniform)
torch_default_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
xavier_uniform = nn.initializers.xavier_uniform()
token_init = nn.initializers.normal(stddev=0.02)


def torch_default_bias_init(fan_in: int) -> Callable[..., jnp.ndarray]:
    """torch default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key: jax.Array, shape: Sequence[int], dtype: Dtype = jnp.float32) -> jnp.ndarray:
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


_INV_SQRT2 = 0.7071067811865476
_INV_SQRT2PI = 0.3989422804014327


def _erf_approx(x: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz-Stegun 7.1.26 erf (f32 in/out, max abs err 1.5e-7).

    XLA's erf expansion is branch-heavy and VPU-expensive on TPU (measured
    ~0.4ms per (12304, 3072) GELU on v5e); this form is one exp + 5 FMAs,
    with error two orders below the parity-test tolerances (2e-4).
    """
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


@jax.custom_vjp
def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-grade (erf) GELU — torch nn.GELU default semantics.

    Forward uses the A-S erf above; backward is the analytic derivative
    Φ(x) + x·φ(x) via custom_vjp — jax.grad through sign/abs/select chains
    costs more than the whole forward (measured on v5e).
    """
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + _erf_approx(xf * _INV_SQRT2))).astype(x.dtype)


def _gelu_fwd(x):
    return gelu(x), x


def _gelu_bwd(x, g):
    xf = x.astype(jnp.float32)
    cdf = 0.5 * (1.0 + _erf_approx(xf * _INV_SQRT2))
    pdf = _INV_SQRT2PI * jnp.exp(-0.5 * xf * xf)
    return ((g.astype(jnp.float32) * (cdf + xf * pdf)).astype(x.dtype),)


gelu.defvjp(_gelu_fwd, _gelu_bwd)


def _as_tuple(v: KernelSize, n: int) -> Tuple[int, ...]:
    return (v,) * n if isinstance(v, int) else tuple(v)


class LayerNorm(nn.Module):
    """LayerNorm over the channel (last) axis, float32 statistics.

    Equivalent to torch nn.LayerNorm / the reference's ConvLayerNorm
    (conv.py:169-187) since tensors here are channels-last.
    """

    epsilon: float = 1e-5
    use_scale: bool = True
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, segments: int = 1) -> jnp.ndarray:
        """segments > 1: x's last dim is ``segments`` folded channel groups
        (the z-folded decoder layout, see _ZFoldConv3); normalization is per
        C-group with matmul-computed stats so the whole op stays in the
        dense-lane folded layout — params are (C,) exactly as unfolded."""
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        features = x.shape[-1] // segments
        if segments == 1:
            mean = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
            y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        else:
            # segment-mean via matmul (MXU) + broadcast-back via the 0/1
            # transpose; centered-square form keeps the stats stable
            sel = (
                jnp.arange(segments * features)[:, None] // features
                == jnp.arange(segments)[None, :]
            ).astype(jnp.float32)
            m = x @ (sel / features)
            mean_full = m @ sel.T
            cen = x - mean_full
            var = (cen * cen) @ (sel / features)
            y = cen * (jax.lax.rsqrt(var + self.epsilon) @ sel.T)
        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
            y = y * (jnp.tile(scale, segments) if segments > 1 else scale)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
            y = y + (jnp.tile(bias, segments) if segments > 1 else bias)
        return y.astype(self.dtype if self.dtype is not None else orig_dtype)


class InstanceNorm(nn.Module):
    """InstanceNorm over spatial axes, no affine (torch default affine=False)."""

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        axes = tuple(range(1, x.ndim - 1))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=axes, keepdims=True)
        return ((x - mean) * jax.lax.rsqrt(var + self.epsilon)).astype(orig_dtype)


class GroupNorm(nn.Module):
    """GroupNorm with affine params, float32 statistics (torch semantics)."""

    num_groups: int
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        c = x.shape[-1]
        g = self.num_groups
        if c % g != 0:
            raise ValueError(f"Channels {c} not divisible by groups {g}.")
        x32 = x.astype(jnp.float32)
        shape = x.shape[:-1] + (g, c // g)
        xg = x32.reshape(shape)
        axes = tuple(range(1, x.ndim - 1)) + (x.ndim,)
        mean = jnp.mean(xg, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(xg - mean), axis=axes, keepdims=True)
        y = ((xg - mean) * jax.lax.rsqrt(var + self.epsilon)).reshape(x.shape)
        y = y * self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        y = y + self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return y.astype(orig_dtype)


def get_conv_norm(
    norm: str,
    eps: float = 1e-6,
    n_groups: int = 32,
    n_chans: int = 0,
    name: Optional[str] = None,
) -> nn.Module:
    """Normalisation factory for conv blocks (reference conv.py:190-209).

    Args:
        norm: 'instance' | 'layer' | 'group'.
        eps: epsilon.
        n_groups: groups for group norm (clamped to channel count).
        n_chans: channel count, needed for group norm clamping.
        name: module name (stable naming for checkpoint mapping).
    """
    if norm == "instance":
        return InstanceNorm(epsilon=eps, name=name)
    if norm == "layer":
        return LayerNorm(epsilon=eps, dtype=None, name=name)
    if norm == "group":
        return GroupNorm(num_groups=min(n_groups, n_chans) if n_chans else n_groups, epsilon=eps, name=name)
    raise ValueError(f"Invalid norm type, got {norm}, must be 'instance' or 'layer' or 'group'.")


class Conv(nn.Module):
    """N-d convolution, channels-last, torch-default init.

    kernel/strides are full spatial tuples; padding 'SAME' or 'VALID'.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Optional[Sequence[int]] = None
    padding: str = "SAME"
    feature_group_count: int = 1
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        folded_z: Optional[int] = None,
        folded_argmax_z: Optional[int] = None,
    ) -> jnp.ndarray:
        kernel = tuple(self.kernel_size)
        if folded_argmax_z is not None:
            # serving fast path for 1x1x1 pred heads: x is z-folded
            # (B, X, Y, Z*Ci); returns argmax labels (B, X, Y, Z) uint8
            if kernel != (1, 1, 1) or self.feature_group_count != 1:
                raise ValueError("folded_argmax_z requires a plain 1x1x1 conv head.")
            return _FoldedClassMajorHead(
                features=self.features,
                use_bias=self.use_bias,
                dtype=self.dtype,
                name="conv",
            )(x, folded_argmax_z)
        if folded_z is not None:
            # x arrives z-folded (B, X, Y, Z*Ci) and stays folded (see
            # _ZFoldConv3); only 3x3x3 and 1x1x1 SAME convs reach here
            in_chans = x.shape[-1] // folded_z
            fan_in = in_chans * math.prod(kernel)
            return _ZFoldConv3(
                features=self.features,
                kernel_size=kernel,
                use_bias=self.use_bias,
                fan_in=fan_in,
                dtype=self.dtype,
                name="conv",
            )(x, folded_z=folded_z)
        in_chans = x.shape[-1]
        fan_in = (in_chans // self.feature_group_count) * math.prod(kernel)
        # Small-C 3x3x3 convs (the ConvUNetR finest decoder levels) run at
        # <10% MXU: both contraction and output channels are 4x lane-padded
        # at C=32. The z-folded banded form below trades ~Z/3x redundant
        # FLOPs for full-depth MXU matmuls — measured 2.4x on v5e at
        # (8,192,192,16,32). (A Pallas K-folded conv was tried first:
        # ops/pallas/conv3d.py, bit-exact and 3.1x in ISOLATION, but the
        # pallas_call boundary breaks XLA's producer fusion and serving
        # regressed 28.1 -> 23.7 frames/s end-to-end.)
        if _zfold_profitable(x.shape, kernel, self.strides, self.padding,
                             self.feature_group_count, self.features):
            return _ZFoldConv3(
                features=self.features,
                kernel_size=kernel,
                use_bias=self.use_bias,
                fan_in=fan_in,
                dtype=self.dtype,
                name="conv",
            )(x)
        return nn.Conv(
            features=self.features,
            kernel_size=kernel,
            strides=tuple(self.strides) if self.strides is not None else None,
            padding=self.padding,
            feature_group_count=self.feature_group_count,
            use_bias=self.use_bias,
            kernel_init=torch_default_kernel_init,
            bias_init=torch_default_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)


def _zfold_profitable(
    x_shape, kernel, strides, padding: str, groups: int, features: int
) -> bool:
    """Dispatch condition for the z-folded banded conv.

    Profitable when the lane-padding loss (128/C)^2 exceeds the band's
    Z/3 FLOP overhead: true for C<=48 with Z*C spanning >=1 lane tile.
    The weight blowup (3,3,Z*Ci,Z*Co) is capped at ~16MB f32.
    """
    import os

    if os.environ.get("CINEMA_TPU_ZFOLD", "1") == "0":
        return False
    if len(x_shape) != 5 or kernel != (3, 3, 3) or groups != 1 or padding != "SAME":
        return False
    if strides is not None and tuple(strides) != (1, 1, 1):
        return False
    z, ci = x_shape[3], x_shape[4]
    if ci > 48 or features > 48:
        return False
    # the banded contraction spans 9*z*ci lanes — one full MXU tile is
    # enough (z*ci alone may be tiny, e.g. the full-res image adapter's
    # ci=1 conv1: 9*16*1=144 lanes, vs its unfolded im2col K=27)
    if 9 * z * ci < 128 or z * features < 128:
        return False
    return 9 * z * ci * z * features * 4 <= 16 * 2**20


def zfold_weight(w: jnp.ndarray, z: int) -> jnp.ndarray:
    """(3,3,3,Ci,Co) kernel -> (3,3,Z*Ci,Z*Co) block-banded 2D kernel;
    (1,1,1,Ci,Co) -> (1,1,Z*Ci,Z*Co) block-diagonal.

    Folding z into channels turns the z-taps into banded channel mixing:
    entry (z_in,ci),(z_out,co) is w[:, :, z_in-z_out+1] when
    |z_in-z_out| <= kz//2, else 0 — z boundaries are handled exactly by
    the band's edge (no z padding exists to leak).
    """
    kx, ky, kz, ci, co = w.shape
    half = kz // 2
    out = jnp.zeros((kx, ky, z * ci, z * co), w.dtype)
    for zo in range(z):
        for dz in range(-half, half + 1):
            zi = zo + dz
            if 0 <= zi < z:
                out = out.at[:, :, zi * ci : (zi + 1) * ci, zo * co : (zo + 1) * co].set(
                    w[:, :, dz + half]
                )
    return out


def partial_fold_group(z: int, ci: int, co: int, kz: int, batch: int = 8) -> int:
    """Fold group g for a z-folded conv: the z axis folds into channels by
    the smallest divisor g of z filling a 128-lane tile on BOTH operands,
    with the leftover z/g kept as a real (3-tap) spatial dim.

    Returns z (the full-Z band / block-diagonal — the round-3 kernel) when
    no smaller g pays: the partial fold's FLOP redundancy is g (vs Z/3 for
    the 3x3x3 band and Z for the 1x1x1 block-diagonal), so it needs
    g*min(ci,co) >= 128 AND, for banded kernels, 3*g <= z. Measured on v5e
    at (8,192,192,16,32): band 11.16 ms vs g=4 fold 9.13 ms (-18%), equal
    numerics; g=2 (64 lanes) loses, g=8 redundancy loses to the band.

    Batch-gated at >= 8: the same fold LOSES end-to-end at the
    sliding-window shape (B=2: p50 83.7 -> 89.1 ms) while winning serving
    (B=8 chunks: 44.3 -> 48.5 frames/s), both measured on v5e 2026-08-19 —
    small batches keep the measured-better band (also the round-4 behavior
    for the untimed B=4 fine-tune shape).
    """
    import os

    if min(ci, co) <= 0 or batch < 8 or os.environ.get("CINEMA_TPU_GFOLD", "1") == "0":
        return z
    need = -(-128 // min(ci, co))  # ceil
    for g in range(need, z):
        if z % g != 0:
            continue
        if kz > 1 and kz * g > z:
            break  # band is cheaper from here on
        return g
    return z


def gfold_weight(w: jnp.ndarray, z: int, g: int) -> jnp.ndarray:
    """(kx,ky,kz,Ci,Co) kernel -> (kx,ky,kz',g*Ci,g*Co) partial-fold kernel.

    z folds into channels by groups of g (layout (..., z/g, g*C)); the
    surviving z' axis needs kz' = 3 taps when kz == 3 (a tap can cross one
    group boundary), 1 when kz == 1. Entry (dz', b*Ci+ci, a*Co+co) is
    w[..., dz'*g + b - a + kz//2] when that original tap exists, else 0;
    the z boundary is exact (SAME-padded z' groups are entirely zero).
    ``g == z`` degenerates to ``zfold_weight`` with a size-1 z' axis.
    """
    kx, ky, kz, ci, co = w.shape
    half = kz // 2
    kzp = 3 if kz == 3 else 1
    out = jnp.zeros((kx, ky, kzp, g * ci, g * co), w.dtype)
    for dzp in range(-(kzp // 2), kzp // 2 + 1):
        for b in range(g):
            for a in range(g):
                dz = dzp * g + b - a
                if -half <= dz <= half:
                    out = out.at[
                        :, :, dzp + kzp // 2, b * ci : (b + 1) * ci, a * co : (a + 1) * co
                    ].set(w[:, :, dz + half])
    return out


class _ZFoldConv3(nn.Module):
    """nn.Conv-compatible 3x3x3 SAME conv as a z-folded banded 2D conv.

    Param tree identical to nn.Conv (kernel (3,3,3,Ci,Co) + bias), so
    checkpoints are unaffected; only the compute layout changes. The
    (B,X,Y,Z,C)->(B,X,Y,Z*C) reshape merges adjacent minor dims — free, no
    relayout — and the 2D conv contracts over 9*Z*Ci lanes at full MXU
    depth instead of 4x-padded C=32 tiles. A segmented variant (grouped
    conv over halo'd z-segment windows, (z_seg+2)/3x instead of Z/3x
    redundant FLOPs) was measured SLOWER on v5e despite 2.7x fewer FLOPs
    (TPU grouped convs run at ~1/3 the band's MXU rate and the window
    materialization adds an HBM pass) — pruned 2026-08-19, see
    docs/KERNEL_NOTES.md.
    """

    features: int
    kernel_size: Tuple[int, ...]
    use_bias: bool
    fan_in: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, folded_z: Optional[int] = None) -> jnp.ndarray:
        if folded_z is None:
            batch, xs, ys, z, ci = x.shape
            x2 = x.astype(self.dtype).reshape(batch, xs, ys, z * ci)
        else:
            z = folded_z
            batch, xs, ys = x.shape[:3]
            ci = x.shape[-1] // z
            x2 = x.astype(self.dtype)
        w = self.param(
            "kernel",
            torch_default_kernel_init,
            (*self.kernel_size, ci, self.features),
            jnp.float32,
        )
        g = partial_fold_group(z, ci, self.features, self.kernel_size[2], batch)
        if g < z:
            # partial fold: (B,X,Y,Z*Ci) -> (B,X,Y,Z/g,g*Ci) is a minor-dim
            # split (fuses into the conv's input read); the surviving z'
            # axis is a real 3-tap (or 1-tap) spatial dim, cutting the FLOP
            # redundancy from Z/3 (band) to g at the same full-lane tiling
            wg = gfold_weight(w.astype(self.dtype), z, g)
            out = jax.lax.conv_general_dilated(
                x2.reshape(batch, xs, ys, z // g, g * ci),
                wg,
                window_strides=(1, 1, 1),
                padding="SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            out = out.reshape(
                (batch, xs, ys, z, self.features)
                if folded_z is None
                else (batch, xs, ys, z * self.features)
            )
        else:
            w2 = zfold_weight(w.astype(self.dtype), z)
            out = jax.lax.conv_general_dilated(
                x2,
                w2,
                window_strides=(1, 1),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if folded_z is None:
                out = out.reshape(batch, xs, ys, z, self.features)
        if self.use_bias:
            b = self.param("bias", torch_default_bias_init(self.fan_in), (self.features,), jnp.float32)
            bt = jnp.tile(b, z) if folded_z is not None else b
            out = out + bt.astype(out.dtype)
        return out


class _FoldedClassMajorHead(nn.Module):
    """1x1x1 pred head + argmax, computed on the z-folded layout.

    Param tree identical to the dense head's nn.Conv ("conv"/{kernel,bias},
    kernel (1,1,1,Ci,n_classes)), so checkpoints are unaffected. The folded
    head weight is built CLASS-MAJOR — output channel c*Z+z — so each
    class's score plane is a CONTIGUOUS lane slice and the argmax is a
    where-chain over full-lane tensors. The dense 5D head output puts
    n_classes (=4) in the 128-lane minor dim (~6 ms/serving-chunk just to
    write + iota-reduce that 32x-padded layout, measured on v5e).
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_folded: jnp.ndarray, z: int) -> jnp.ndarray:
        """x_folded: (batch, X, Y, Z*Ci) -> argmax labels (batch, X, Y, Z) uint8."""
        ci = x_folded.shape[-1] // z
        w = self.param(
            "kernel", torch_default_kernel_init, (1, 1, 1, ci, self.features), jnp.float32
        )
        w0 = w[0, 0, 0].astype(self.dtype)
        b = (
            self.param("bias", torch_default_bias_init(ci), (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        eye = jnp.eye(z, dtype=self.dtype)
        x_folded = x_folded.astype(self.dtype)

        # one TILE-ALIGNED (Z*Ci -> Z) matmul per class — lane-slicing a
        # single class-major score tensor costs a sub-tile lane shift per
        # class (measured 7.5 ms/chunk); separate matmuls keep every
        # operand aligned and fuse the argmax compares into their epilogue
        def class_scores(c: int) -> jnp.ndarray:
            # wc[zin*ci + i, zout] = w[i, c] iff zin == zout
            wc = jnp.einsum("i,ab->aib", w0[:, c], eye).reshape(z * ci, z)
            s = jnp.einsum("...k,kn->...n", x_folded, wc)
            return s + b[c].astype(s.dtype) if b is not None else s

        # first-max semantics, same as jnp.argmax
        best = class_scores(0)
        idx = jnp.zeros(best.shape, jnp.uint8)
        for c in range(1, self.features):
            part = class_scores(c)
            hit = part > best
            idx = jnp.where(hit, jnp.uint8(c), idx)
            best = jnp.where(hit, part, best)
        return idx


class ConvTranspose(nn.Module):
    """N-d transposed convolution, channels-last.

    Only used with kernel_size == strides (pure upsampling), where flax
    ConvTranspose('VALID') matches torch ConvTranspose exactly.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, folded_z: Optional[int] = None) -> jnp.ndarray:
        kernel = tuple(self.kernel_size)
        if folded_z is not None:
            # z-folded upsampling (see _ZFoldConv3): x is (B, X, Y, Z*Ci) and
            # the result stays folded — only valid when z is untouched
            if len(kernel) != 3 or kernel[2] != 1 or tuple(self.strides)[2] != 1:
                raise ValueError("folded_z requires a z-identity ConvTranspose.")
            return _ZFoldConvT(
                features=self.features,
                kernel_size=kernel,
                strides=tuple(self.strides),
                use_bias=self.use_bias,
                dtype=self.dtype,
                name="conv",
            )(x, folded_z)
        # transpose_kernel=True gives gradient-of-conv semantics (== torch
        # ConvTranspose); the kernel layout is then (*k, out, in), so the
        # torch (in, out, *k) weight maps with the same transpose as Conv.
        # torch init fan_in for ConvTranspose = weight.shape[1] * prod(k)
        # = out_chans * prod(kernel).
        fan_in = self.features * math.prod(kernel)
        return nn.ConvTranspose(
            features=self.features,
            kernel_size=kernel,
            strides=tuple(self.strides),
            padding="VALID",
            use_bias=self.use_bias,
            transpose_kernel=True,
            kernel_init=torch_default_kernel_init,
            bias_init=torch_default_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)


class _ZFoldConvT(nn.Module):
    """z-identity ConvTranspose on the z-folded layout.

    Param tree identical to the dense path's nn.ConvTranspose
    ("conv"/{kernel,bias}, kernel (*k, out, in) with transpose_kernel
    semantics); the folded kernel is block-diagonal over z, so each z slice
    upsamples independently — exactly the 3D op with z-kernel/z-stride 1.
    """

    features: int
    kernel_size: Tuple[int, ...]
    strides: Tuple[int, ...]
    use_bias: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x2: jnp.ndarray, z: int) -> jnp.ndarray:
        ci = x2.shape[-1] // z
        w = self.param(
            "kernel",
            torch_default_kernel_init,
            (*self.kernel_size, self.features, ci),
            jnp.float32,
        )
        w0 = w[:, :, 0].astype(self.dtype)
        # block-diag over g z-groups instead of all Z: the z-identity
        # transpose needs no cross-group taps at all, so the partial fold's
        # only constraint is the 128-lane fill (g*min(ci,co) >= 128) and the
        # redundancy drops from Z to g (the finest serving up-conv: 16x -> 4x)
        g = partial_fold_group(z, ci, self.features, 1, x2.shape[0])
        eye = jnp.eye(g, dtype=self.dtype)
        if g < z:
            wg = jnp.einsum("xyoi,ab->xyaobi", w0, eye).reshape(
                *w0.shape[:2], 1, g * self.features, g * ci
            )
            b, xs, ys = x2.shape[:3]
            out = jax.lax.conv_transpose(
                x2.astype(self.dtype).reshape(b, xs, ys, z // g, g * ci),
                wg,
                strides=(*self.strides[:2], 1),
                padding="VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                transpose_kernel=True,
            )
            out = out.reshape(b, out.shape[1], out.shape[2], z * self.features)
        else:
            w2 = jnp.einsum("xyoi,ab->xyaobi", w0, eye).reshape(
                *w0.shape[:2], z * self.features, z * ci
            )
            out = jax.lax.conv_transpose(
                x2.astype(self.dtype),
                w2,
                strides=self.strides[:2],
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                transpose_kernel=True,
            )
        if self.use_bias:
            fan_in = self.features * math.prod(self.kernel_size)
            b_p = self.param(
                "bias", torch_default_bias_init(fan_in), (self.features,), jnp.float32
            )
            out = out + jnp.tile(b_p.astype(out.dtype), z)
        return out


class Dense(nn.Module):
    """Linear layer with xavier-uniform init + zero bias (reference vit.py:38-42)."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            kernel_init=xavier_uniform,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="linear",
        )(x)


class DropPath(nn.Module):
    """Per-sample stochastic depth."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return x
        keep_prob = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        keep = jax.random.bernoulli(rng, keep_prob, shape)
        return jnp.where(keep, x / keep_prob, jnp.zeros_like(x))


class ConvMlp(nn.Module):
    """MLP with 1x1 convs (reference conv.py:111-166).

    On channels-last tensors a 1x1 conv is a matmul over the channel axis;
    XLA lowers both identically onto the MXU.
    """

    hidden_features: int
    out_features: Optional[int] = None
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        nd = x.ndim - 2
        out_features = self.out_features or x.shape[-1]
        one = (1,) * nd
        x = Conv(self.hidden_features, one, padding="VALID", dtype=self.dtype, name="fc1")(x)
        x = gelu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = Conv(out_features, one, padding="VALID", dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class ConvNormActBlock(nn.Module):
    """conv -> norm -> GELU (reference conv.py:212-273)."""

    out_chans: int
    kernel_size: KernelSize = 3
    strides: KernelSize = 1
    padding: str = "SAME"
    norm: str = "layer"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        nd = x.ndim - 2
        x = Conv(
            self.out_chans,
            _as_tuple(self.kernel_size, nd),
            strides=_as_tuple(self.strides, nd),
            padding=self.padding,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = get_conv_norm(self.norm, n_chans=self.out_chans, name="norm")(x)
        return gelu(x)


class ConvResBlock(nn.Module):
    """norm-act-conv x2 + 1x1 shortcut (reference conv.py:276-346)."""

    out_chans: int
    kernel_size: KernelSize = 3
    dropout: float = 0.0
    norm: str = "layer"
    dtype: Dtype = jnp.float32

    def _folded_body(
        self, x2: jnp.ndarray, z: int, in_chans: int, k, deterministic: bool
    ) -> jnp.ndarray:
        """Block body on the z-folded (B, X, Y, Z*C) layout, in folded out."""
        h = get_conv_norm(self.norm, n_chans=in_chans, name="norm1")(x2, segments=z)
        h = gelu(h)
        h = Conv(self.out_chans, k, padding="SAME", dtype=self.dtype, name="conv1")(h, folded_z=z)
        h = get_conv_norm(self.norm, n_chans=self.out_chans, name="norm2")(h, segments=z)
        h = gelu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = Conv(self.out_chans, k, padding="SAME", dtype=self.dtype, name="conv2")(h, folded_z=z)
        if in_chans != self.out_chans:
            x2 = Conv(
                self.out_chans, (1, 1, 1), padding="VALID", dtype=self.dtype, name="shortcut"
            )(x2, folded_z=z)
        return h + x2

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        folded_z: Optional[int] = None,
    ) -> jnp.ndarray:
        if folded_z is not None:
            # caller keeps a whole decoder level folded (see UpsampleDecoder):
            # x is (B, X, Y, Z*C) and the result stays folded
            if self.norm != "layer" or (self.dropout > 0.0 and not deterministic):
                raise ValueError("folded_z requires layer norm and inactive dropout.")
            z = folded_z
            in_chans = x.shape[-1] // z
            return self._folded_body(x, z, in_chans, _as_tuple(self.kernel_size, 3), deterministic)
        nd = x.ndim - 2
        in_chans = x.shape[-1]
        k = _as_tuple(self.kernel_size, nd)
        if (
            nd == 3
            and self.norm == "layer"
            and (self.dropout == 0.0 or deterministic)
            and _zfold_profitable(x.shape, k, None, "SAME", 1, self.out_chans)
        ):
            # whole block in the z-folded layout: the 5D (Z,C=32) minor dims
            # tile 4x lane-padded, so every unfused LN/residual pass around a
            # folded conv pays a relayout copy (~17ms/block measured at the
            # serving finest level); folding once at block entry keeps all
            # elementwise ops dense and the LN runs via matmul segment stats
            # (measured 39.3 -> 27.9 ms/block on v5e)
            b, xs_, ys_, z, _ = x.shape
            x2 = x.reshape(b, xs_, ys_, z * in_chans)
            out = self._folded_body(x2, z, in_chans, k, deterministic)
            return out.reshape(b, xs_, ys_, z, self.out_chans)
        h = get_conv_norm(self.norm, n_chans=in_chans, name="norm1")(x)
        h = gelu(h)
        h = Conv(self.out_chans, k, padding="SAME", dtype=self.dtype, name="conv1")(h)
        h = get_conv_norm(self.norm, n_chans=self.out_chans, name="norm2")(h)
        h = gelu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = Conv(self.out_chans, k, padding="SAME", dtype=self.dtype, name="conv2")(h)
        if in_chans != self.out_chans:
            x = Conv(self.out_chans, (1,) * nd, padding="VALID", dtype=self.dtype, name="shortcut")(x)
        return h + x


class MaskedConvBlock(nn.Module):
    """ConvMAE block with mask-multiply (reference conv.py:349-415).

    x += drop_path(conv2(dwconv5(mask * conv1(norm1(x))))); x += drop_path(mlp(norm2(x)))
    The mask multiply keeps masked-patch pixels from leaking through the
    conv stem during MAE pretraining.
    """

    mlp_ratio: int = 4
    dropout: float = 0.0
    drop_path: float = 0.0
    norm: str = "layer"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        dense_ctx=None,
    ) -> jnp.ndarray:
        """When ``dense_ctx`` (ops.sparse_cells.CellDenseCtx) is given, ``x``
        is visible-cells-only (batch*k, *cell, C); the depthwise conv — the
        only cross-cell op — runs densely via densify/sparsify, with the
        scatter's zeros at masked cells playing the mask-multiply's role
        (``mask`` must be None then)."""
        if dense_ctx is not None and mask is not None:
            raise ValueError("mask and dense_ctx are mutually exclusive.")
        nd = x.ndim - 2
        chans = x.shape[-1]
        one = (1,) * nd
        h = get_conv_norm(self.norm, n_chans=chans, name="norm1")(x)
        h = Conv(chans, one, padding="VALID", dtype=self.dtype, name="conv1")(h)
        if mask is not None:
            h = h * mask[..., None].astype(h.dtype)
        if dense_ctx is not None:
            h = dense_ctx.densify(h)
        h = Conv(
            chans,
            (5,) * nd,
            padding="SAME",
            feature_group_count=chans,
            dtype=self.dtype,
            name="dw_conv",
        )(h)
        if dense_ctx is not None:
            h = dense_ctx.sparsify(h)
        h = Conv(chans, one, padding="VALID", dtype=self.dtype, name="conv2")(h)
        x = x + DropPath(self.drop_path, name="drop_path1")(h, deterministic)
        h = get_conv_norm(self.norm, n_chans=chans, name="norm2")(x)
        h = ConvMlp(
            hidden_features=chans * self.mlp_ratio,
            dropout=self.dropout,
            dtype=self.dtype,
            name="mlp",
        )(h, deterministic)
        return x + DropPath(self.drop_path, name="drop_path2")(h, deterministic)
