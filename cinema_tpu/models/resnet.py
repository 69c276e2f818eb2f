"""ResNet 2D/3D baselines for classification/regression (reference: cinema/resnet.py).

A single rank-generic implementation covers both the reference's torchvision
2D subclass (resnet.py:318-456) and its from-scratch 3D stack
(resnet.py:49-315): channels-last convs + BatchNorm, basic and bottleneck
blocks, configurable per-layer planes, consuming a single-view image dict.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from cinema_tpu.models.layers import Conv, Dense

Dtype = Any


def BatchNorm(name: str) -> nn.BatchNorm:
    """Torch-semantics BatchNorm (momentum 0.9 == torch 0.1, eps 1e-5).

    A plain nn.BatchNorm so the param tree is flat (bn1.{scale,bias} +
    batch_stats bn1.{mean,var}) and exports to torch
    bn1.{weight,bias,running_mean,running_var} through the bridge.
    """
    return nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=jnp.float32, name=name)


class BasicBlock(nn.Module):
    """3x3-3x3 residual block (reference resnet.py:49-106)."""

    planes: int
    strides: Tuple[int, ...]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        nd = x.ndim - 2
        identity = x
        # explicit (1,1) padding: torch pads 3x3 stride-2 convs symmetrically,
        # which differs from XLA's asymmetric SAME at stride 2
        out = Conv(self.planes, (3,) * nd, strides=self.strides, padding=((1, 1),) * nd,
                   use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = BatchNorm("bn1")(out, use_running_average=deterministic)
        out = nn.relu(out)
        out = Conv(self.planes, (3,) * nd, padding="SAME", use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = BatchNorm("bn2")(out, use_running_average=deterministic)
        if x.shape[-1] != self.planes or any(s != 1 for s in self.strides):
            identity = Conv(self.planes, (1,) * nd, strides=self.strides, padding="VALID",
                            use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = BatchNorm("downsample_bn")(identity, use_running_average=deterministic)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """1x1-3x3-1x1 bottleneck block, expansion 4 (reference resnet.py:109-172)."""

    planes: int
    strides: Tuple[int, ...]
    expansion: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        nd = x.ndim - 2
        identity = x
        out_planes = self.planes * self.expansion
        out = Conv(self.planes, (1,) * nd, padding="VALID", use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = BatchNorm("bn1")(out, use_running_average=deterministic)
        out = nn.relu(out)
        out = Conv(self.planes, (3,) * nd, strides=self.strides, padding=((1, 1),) * nd,
                   use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = BatchNorm("bn2")(out, use_running_average=deterministic)
        out = nn.relu(out)
        out = Conv(out_planes, (1,) * nd, padding="VALID", use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = BatchNorm("bn3")(out, use_running_average=deterministic)
        if x.shape[-1] != out_planes or any(s != 1 for s in self.strides):
            identity = Conv(out_planes, (1,) * nd, strides=self.strides, padding="VALID",
                            use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = BatchNorm("downsample_bn")(identity, use_running_average=deterministic)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Rank-generic ResNet (2D or 3D by input rank), dict-in/dict-out.

    Args mirror the reference: layers (blocks per stage), layer_inplanes
    (stage widths, reference resnet.py:362-369), bottleneck toggle.
    """

    out_chans: int
    layers: Tuple[int, ...] = (2, 2, 2, 2)
    layer_inplanes: Tuple[int, ...] = (64, 128, 256, 512)
    bottleneck: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        image_dict: Dict[str, jnp.ndarray],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if len(image_dict) != 1:
            raise ValueError(f"Only one view is supported, got {len(image_dict)} views.")
        x = next(iter(image_dict.values()))
        nd = x.ndim - 2

        # torch-exact stem: 7x7 stride 2 with symmetric padding 3 (SAME pads
        # (2,3) at stride 2 on even sizes -> different pixels)
        x = Conv(self.layer_inplanes[0], (7,) * nd, strides=(2,) * nd, padding=((3, 3),) * nd,
                 use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = BatchNorm("bn1")(x, use_running_average=deterministic)
        x = nn.relu(x)
        x = nn.max_pool(x, (3,) * nd, strides=(2,) * nd, padding=((1, 1),) * nd)

        block_cls = Bottleneck if self.bottleneck else BasicBlock
        for stage, (n_blocks, planes) in enumerate(zip(self.layers, self.layer_inplanes)):
            for b in range(n_blocks):
                strides = (2,) * nd if (stage > 0 and b == 0) else (1,) * nd
                x = block_cls(planes=planes, strides=strides, dtype=self.dtype,
                              name=f"layer{stage + 1}_{b}")(x, deterministic)

        x = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)))  # global average pool
        return Dense(self.out_chans, dtype=self.dtype, name="fc")(x)


def get_resnet(size: str, out_chans: int, dtype: Dtype = jnp.float32) -> ResNet:
    """ResNet presets (reference get_resnet2d/3d, resnet.py:283-456)."""
    presets = {
        "resnet10": dict(layers=(1, 1, 1, 1), bottleneck=False),
        "resnet18": dict(layers=(2, 2, 2, 2), bottleneck=False),
        "resnet34": dict(layers=(3, 4, 6, 3), bottleneck=False),
        "resnet50": dict(layers=(3, 4, 6, 3), bottleneck=True),
    }
    if size not in presets:
        raise ValueError(f"size must be in {sorted(presets)}, got {size}.")
    return ResNet(out_chans=out_chans, dtype=dtype, **presets[size])
