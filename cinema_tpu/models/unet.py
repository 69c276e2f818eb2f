"""Residual UNet baseline (reference: cinema/segmentation/unet.py).

Single-view, 2D/3D, channels-last. Skip connections are additive at every
residual block; on spatial mismatch after an upsample the tensor is
end-padded to match (reference unet.py:211-218).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

from cinema_tpu.models.layers import Conv, ConvNormActBlock, ConvResBlock, ConvTranspose

Dtype = Any
KernelSize = Union[int, Tuple[int, ...]]


def _as_tuple(v: KernelSize, n: int) -> Tuple[int, ...]:
    return (v,) * n if isinstance(v, int) else tuple(v)


class DownsampleEncoder(nn.Module):
    """UNet encoder (reference unet.py:12-114)."""

    n_dims: int
    chans: Tuple[int, ...]
    patch_size: KernelSize = 2
    scale_factor: KernelSize = 2
    norm: str = "instance"
    kernel_size: int = 3
    n_blocks: int = 2
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self) -> None:
        self.in_conv = ConvNormActBlock(
            out_chans=self.chans[0], kernel_size=self.kernel_size, norm=self.norm, dtype=self.dtype
        )
        blocks = []
        for i, ch in enumerate(self.chans):
            block = {
                "conv": [
                    ConvResBlock(
                        out_chans=ch,
                        kernel_size=self.kernel_size,
                        dropout=self.dropout,
                        norm=self.norm,
                        dtype=self.dtype,
                    )
                    for _ in range(self.n_blocks)
                ]
            }
            if i < len(self.chans) - 1:
                down_kernel = _as_tuple(self.patch_size if i == 0 else self.scale_factor, self.n_dims)
                block["down"] = Conv(
                    self.chans[i + 1], down_kernel, strides=down_kernel, padding="VALID", dtype=self.dtype
                )
            blocks.append(block)
        self.blocks = blocks

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> List[jnp.ndarray]:
        x = self.in_conv(x)
        embeddings = [x]
        for i, block in enumerate(self.blocks):
            for conv in block["conv"]:
                x = conv(x, deterministic)
                embeddings.append(x)
            if i < len(self.blocks) - 1:
                x = block["down"](x)
                embeddings.append(x)
        return embeddings


class UpsampleDecoder(nn.Module):
    """UNet decoder with per-res-block skip adds (reference unet.py:117-219)."""

    n_dims: int
    chans: Tuple[int, ...]
    patch_size: KernelSize = 2
    scale_factor: KernelSize = 2
    norm: str = "instance"
    kernel_size: int = 3
    n_blocks: int = 2
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self) -> None:
        blocks = []
        chans_rev = tuple(self.chans)[::-1]
        for i, ch in enumerate(chans_rev):
            block = {
                "conv": [
                    ConvResBlock(
                        out_chans=ch,
                        kernel_size=self.kernel_size,
                        dropout=self.dropout,
                        norm=self.norm,
                        dtype=self.dtype,
                    )
                    for _ in range(self.n_blocks)
                ]
            }
            if i < len(self.chans) - 1:
                up_kernel = _as_tuple(
                    self.patch_size if i == len(self.chans) - 2 else self.scale_factor, self.n_dims
                )
                block["up"] = ConvTranspose(self.chans[-i - 2], up_kernel, strides=up_kernel, dtype=self.dtype)
            blocks.append(block)
        self.blocks = blocks

    def __call__(self, embeddings: List[jnp.ndarray], deterministic: bool = True) -> jnp.ndarray:
        embeddings = list(embeddings)
        x = embeddings.pop()
        for i, block in enumerate(self.blocks):
            for conv in block["conv"]:
                x = conv(x, deterministic) + embeddings.pop()
            if i < len(self.blocks) - 1:
                x = block["up"](x)
                skipped = embeddings.pop()
                if x.shape != skipped.shape:
                    # end-pad to the skipped tensor's (larger) spatial shape
                    pad = [(0, s - t) for s, t in zip(skipped.shape, x.shape)]
                    x = jnp.pad(x, pad)
                x = x + skipped
        return x


class UNet(nn.Module):
    """Plain residual UNet taking a single-view image dict (reference unet.py:222-308)."""

    n_dims: int
    in_chans: int
    out_chans: int
    chans: Tuple[int, ...]
    dropout: float = 0.0
    patch_size: KernelSize = 2
    scale_factor: KernelSize = 2
    n_blocks: int = 2
    kernel_size: int = 3
    norm: str = "instance"
    dtype: Dtype = jnp.float32

    def setup(self) -> None:
        if self.n_dims not in (2, 3):
            raise ValueError(f"Invalid n_dims, must be 2 or 3, got {self.n_dims}.")
        kwargs = dict(
            n_dims=self.n_dims,
            chans=tuple(self.chans),
            patch_size=self.patch_size,
            scale_factor=self.scale_factor,
            kernel_size=self.kernel_size,
            n_blocks=self.n_blocks,
            dropout=self.dropout,
            norm=self.norm,
            dtype=self.dtype,
        )
        self.encoder = DownsampleEncoder(**kwargs)
        self.decoder = UpsampleDecoder(**kwargs)
        self.out_conv = Conv(self.out_chans, (1,) * self.n_dims, padding="VALID", dtype=self.dtype)

    def __call__(
        self,
        image_dict: Dict[str, jnp.ndarray],
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        if len(image_dict) != 1:
            raise ValueError(f"Only one view is supported, got {len(image_dict)} views.")
        view = next(iter(image_dict.keys()))
        embeddings = self.encoder(image_dict[view], deterministic)
        x = self.decoder(embeddings, deterministic)
        return {view: self.out_conv(x)}
