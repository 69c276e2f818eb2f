"""ConvUNetR: UNetR-style segmentation model (reference: cinema/segmentation/convunetr.py).

Per-view ConvMAE DownsampleEncoder, shared ViT encoder, per-view decoder:
tokens reshaped to grid -> extra strided-conv downsample levels -> per-skip
ConvResBlock channel adapters -> transpose-conv UpsampleDecoder with additive
skips -> 1x1 pred head.

TPU notes: tokens reshape to channels-last grids for free (the token order
is row-major over the grid by construction of patchify), and all decoder
convs run in XLA's native NHWC/NDHWC layout.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from cinema_tpu.models.convvit import DownsampleEncoder, np_cumsum
from cinema_tpu.models.layers import Conv, ConvResBlock, ConvTranspose, _zfold_profitable
from cinema_tpu.models.vit import ViTEncoder

Dtype = Any


def check_conv_unetr_enc_dec_compatibility(
    enc_patch_size: Tuple[int, ...],
    enc_scale_factor: Tuple[int, ...],
    enc_n_conv_layers: int,
    dec_depth: int,
    dec_patch_size: Tuple[int, ...],
    dec_scale_factor: Tuple[int, ...],
) -> Tuple[int, int]:
    """Validate encoder/decoder geometry (reference convunetr.py:109-161).

    Returns:
        n_layers_wo_skip: decoder layers below the first conv-skip resolution.
        n_downsample_layers: extra strided-conv levels below the ViT grid.
    """
    if enc_n_conv_layers >= dec_depth:
        raise ValueError(f"enc_n_conv_layers {enc_n_conv_layers} must be less than dec_depth {dec_depth}.")
    if any(f < s for f, s in zip(enc_patch_size, dec_patch_size)):
        raise ValueError(f"enc_patch_size {enc_patch_size} must be greater than dec_patch_size {dec_patch_size}.")
    enc_patch_size = tuple(enc_patch_size)
    enc_scale_factor = tuple(enc_scale_factor)
    dec_patch_size = tuple(dec_patch_size)
    dec_scale_factor = tuple(dec_scale_factor)

    enc_factor = enc_patch_size
    for _ in range(enc_n_conv_layers):
        enc_factor = tuple(f * s for f, s in zip(enc_factor, enc_scale_factor))

    dec_factor = dec_patch_size
    n_layers_wo_skip = None
    n_downsample_layers = None
    for i in range(dec_depth):
        if dec_factor == enc_patch_size:
            n_layers_wo_skip = i
        if dec_factor == enc_factor:
            n_downsample_layers = dec_depth - 1 - i
        dec_factor = tuple(f * s for f, s in zip(dec_factor, dec_scale_factor))

    if n_layers_wo_skip is None:
        raise ValueError(
            f"enc_patch_size {enc_patch_size} must be equal to "
            f"dec_patch_size {dec_patch_size} times certain number of {dec_scale_factor}."
        )
    if n_downsample_layers is None:
        raise ValueError(
            f"enc_factor {enc_factor} must be equal to "
            f"dec_patch_size {dec_patch_size} times certain number of {dec_scale_factor}."
        )
    return n_layers_wo_skip, n_downsample_layers


class UpsampleDecoder(nn.Module):
    """Transpose-conv up + residual blocks with additive skips
    (reference convunetr.py:25-106)."""

    chans: Tuple[int, ...]
    patch_size: Tuple[int, ...]
    scale_factor: Tuple[int, ...]
    norm: str = "layer"
    kernel_size: int = 3
    n_blocks: int = 2
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    def setup(self) -> None:
        blocks = []
        chans_rev = tuple(self.chans)[::-1]
        for i, ch in enumerate(chans_rev):
            up_kernel = self.patch_size if i == len(self.chans) - 1 else self.scale_factor
            out_chans = self.chans[-i - 2] if i < len(self.chans) - 1 else ch
            blocks.append(
                {
                    "up": ConvTranspose(out_chans, tuple(up_kernel), strides=tuple(up_kernel), dtype=self.dtype),
                    "conv": [
                        ConvResBlock(
                            out_chans=out_chans,
                            kernel_size=self.kernel_size,
                            dropout=self.dropout,
                            norm=self.norm,
                            dtype=self.dtype,
                        )
                        for _ in range(self.n_blocks)
                    ],
                }
            )
        self.blocks = blocks

    def __call__(
        self,
        embeddings: List[Optional[jnp.ndarray]],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """embeddings: coarsest last; None entries skip the additive skip.

        Fine 3D levels run entirely z-folded (see layers._ZFoldConv3): the
        transpose-conv, the additive skip, and every ConvResBlock stay on the
        (B, X, Y, Z*C) layout, so the only (Z, C) minor-dim relayouts are one
        fold of the pre-up input (at the coarse resolution) and one unfold of
        the level output — and consecutive fold/unfold reshapes cancel in
        XLA's simplifier, including against the folded pred head.
        """
        embeddings = list(embeddings)
        x = embeddings.pop()
        for block in self.blocks:
            up = block["up"]
            z_fold = None
            if (
                x.ndim == 5
                and self.norm == "layer"
                and (self.dropout == 0.0 or deterministic)
                and len(up.kernel_size) == 3
                and up.kernel_size[2] == 1
                and tuple(up.strides)[2] == 1
            ):
                b, xs_, ys_, z, _ = x.shape
                out_shape = (b, xs_ * up.strides[0], ys_ * up.strides[1], z, up.features)
                k = (self.kernel_size,) * 3
                if _zfold_profitable(out_shape, k, None, "SAME", 1, up.features):
                    z_fold = z
            if z_fold is not None:
                b, xs_, ys_, z, ci = x.shape
                x = up(x.reshape(b, xs_, ys_, z * ci), folded_z=z)
                skip = embeddings.pop()
                if skip is not None:
                    x = x + skip.reshape(*x.shape)
                for conv in block["conv"]:
                    x = conv(x, deterministic, folded_z=z)
                x = x.reshape(b, *x.shape[1:3], z, up.features)
            else:
                x = block["up"](x)
                skip = embeddings.pop()
                if skip is not None:
                    x = x + skip
                for conv in block["conv"]:
                    x = conv(x, deterministic)
        return x


class ConvUNetR(nn.Module):
    """Multi-view UNetR with ConvMAE encoder (reference convunetr.py:213-485)."""

    image_size_dict: Dict[str, Tuple[int, ...]]
    in_chans_dict: Dict[str, int]
    out_chans: int
    enc_patch_size_dict: Dict[str, Tuple[int, ...]]
    enc_scale_factor_dict: Dict[str, Tuple[int, ...]]
    enc_conv_chans: Tuple[int, ...]
    enc_conv_n_blocks: int
    enc_embed_dim: int
    enc_depth: int
    enc_n_heads: int
    dec_chans: Tuple[int, ...]
    dec_patch_size_dict: Dict[str, Tuple[int, ...]]
    dec_scale_factor_dict: Dict[str, Tuple[int, ...]]
    dec_kernel_size: int = 3
    mlp_ratio: float = 4
    qkv_bias: bool = True
    norm_eps: float = 1e-5
    rotary: bool = False
    dropout: float = 0.0
    drop_path: float = 0.0
    norm: str = "layer"
    mlp_type: str = "mlp"
    attn_impl: str = "auto"
    remat: bool = False
    dtype: Dtype = jnp.float32

    @property
    def views(self) -> List[str]:
        return list(self.image_size_dict.keys())

    def _geometry(self) -> Tuple[int, int]:
        ids = set()
        for view in self.views:
            ids.add(
                check_conv_unetr_enc_dec_compatibility(
                    enc_patch_size=tuple(self.enc_patch_size_dict[view]),
                    enc_scale_factor=tuple(self.enc_scale_factor_dict[view]),
                    enc_n_conv_layers=len(self.enc_conv_chans),
                    dec_depth=len(self.dec_chans),
                    dec_patch_size=tuple(self.dec_patch_size_dict[view]),
                    dec_scale_factor=tuple(self.dec_scale_factor_dict[view]),
                )
            )
        if len(ids) != 1:
            raise ValueError(f"Inconsistent enc/dec geometry across views: {ids}.")
        return next(iter(ids))

    def setup(self) -> None:
        for view in self.views:
            if len(self.image_size_dict[view]) not in (2, 3):
                raise ValueError(
                    f"Invalid image_size for {view}, must be 2D or 3D, got {self.image_size_dict[view]}."
                )
        n_layers_wo_skip, n_downsample_layers = self._geometry()

        self.enc_down_dict = {
            view: DownsampleEncoder(
                image_size=tuple(self.image_size_dict[view]),
                patch_size=tuple(self.enc_patch_size_dict[view]),
                scale_factor=tuple(self.enc_scale_factor_dict[view]),
                conv_chans=tuple(self.enc_conv_chans),
                conv_n_blocks=self.enc_conv_n_blocks,
                embed_dim=self.enc_embed_dim,
                norm=self.norm,
                dtype=self.dtype,
            )
            for view in self.views
        }
        self.encoder = ViTEncoder(
            embed_dim=self.enc_embed_dim,
            depth=self.enc_depth,
            n_heads=self.enc_n_heads,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            norm_eps=self.norm_eps,
            rotary=self.rotary,
            drop_path=self.drop_path,
            mlp_type=self.mlp_type,
            attn_impl=self.attn_impl,
            remat=self.remat,
            dtype=self.dtype,
        )

        dec_image_conv, dec_down, dec_conv, decoders, heads = {}, {}, {}, {}, {}
        for view in self.views:
            nd = len(self.image_size_dict[view])
            dec_image_conv[view] = ConvResBlock(
                out_chans=self.dec_chans[0],
                kernel_size=self.dec_kernel_size,
                dropout=self.dropout,
                norm=self.norm,
                dtype=self.dtype,
            )
            dec_down[view] = [
                Conv(
                    self.enc_embed_dim,
                    tuple(self.dec_scale_factor_dict[view]),
                    strides=tuple(self.dec_scale_factor_dict[view]),
                    padding="VALID",
                    dtype=self.dtype,
                )
                for _ in range(n_downsample_layers)
            ]
            adapters = []
            for i, _ch in enumerate(self.enc_conv_chans):
                adapters.append(
                    ConvResBlock(
                        out_chans=self.dec_chans[n_layers_wo_skip + i],
                        kernel_size=self.dec_kernel_size,
                        dropout=self.dropout,
                        norm=self.norm,
                        dtype=self.dtype,
                    )
                )
            for i in range(n_downsample_layers + 1):
                adapters.append(
                    ConvResBlock(
                        out_chans=self.dec_chans[n_layers_wo_skip + len(self.enc_conv_chans) + i],
                        kernel_size=self.dec_kernel_size,
                        dropout=self.dropout,
                        norm=self.norm,
                        dtype=self.dtype,
                    )
                )
            dec_conv[view] = adapters
            decoders[view] = UpsampleDecoder(
                chans=tuple(self.dec_chans),
                patch_size=tuple(self.dec_patch_size_dict[view]),
                scale_factor=tuple(self.dec_scale_factor_dict[view]),
                norm=self.norm,
                dropout=self.dropout,
                dtype=self.dtype,
            )
            heads[view] = Conv(self.out_chans, (1,) * nd, padding="VALID", dtype=self.dtype)
        self.dec_image_conv_block_dict = dec_image_conv
        self.dec_down_blocks_dict = dec_down
        self.dec_conv_blocks_dict = dec_conv
        self.decoder_dict = decoders
        self.pred_head_dict = heads

    def __call__(
        self,
        image_dict: Dict[str, jnp.ndarray],
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """image_dict: (batch, *image_size, in_chans) per view.

        Returns logits (batch, *image_size, out_chans) per view.
        """
        feats = self._decode(image_dict, deterministic)
        return {view: self.pred_head_dict[view](out) for view, out in feats.items()}

    def predict_labels(
        self,
        image_dict: Dict[str, jnp.ndarray],
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """Argmax segmentation labels (batch, *image_size) uint8 per view.

        Serving fast path — equals ``argmax(__call__(...), -1)`` but computes
        the 3D pred head in the z-folded class-major layout, skipping the
        lane-padded (Z, n_classes) logits layout entirely (apply via
        ``model.apply(params, images, method=model.predict_labels)``).
        """
        feats = self._decode(image_dict, deterministic)
        labels = {}
        for view, out in feats.items():
            if out.ndim == 5:
                b, xs, ys, z, c = out.shape
                labels[view] = self.pred_head_dict[view](
                    out.reshape(b, xs, ys, z * c), folded_argmax_z=z
                )
            else:
                labels[view] = jnp.argmax(
                    self.pred_head_dict[view](out), axis=-1
                ).astype(jnp.uint8)
        return labels

    def _decode(
        self,
        image_dict: Dict[str, jnp.ndarray],
        deterministic: bool,
    ) -> Dict[str, jnp.ndarray]:
        views = list(image_dict.keys())
        for v in views:
            if v not in self.views:
                raise ValueError(f"views {views} must be in {self.views}.")
        n_layers_wo_skip, _ = self._geometry()

        xs, skips, ns = [], [], []
        for view in views:
            skips_view, x_view = self.enc_down_dict[view](image_dict[view], None, deterministic)
            skips.append(skips_view)
            xs.append(x_view)
            ns.append(x_view.shape[1])

        x = self.encoder(jnp.concatenate(xs, axis=1), deterministic)
        bounds = np_cumsum([1, *ns])
        xs = [x[:, s:e] for s, e in zip([0] + bounds[:-1], bounds)][1:]  # drop cls

        feats = {}
        for i, view in enumerate(views):
            grid = self.enc_down_dict[view].grid_size
            x_view = xs[i].reshape(xs[i].shape[0], *grid, self.enc_embed_dim)

            skips_view = list(skips[i]) + [x_view]
            for block in self.dec_down_blocks_dict[view]:
                x_view = block(x_view)
                skips_view.append(x_view)

            embeddings_view: List[Optional[jnp.ndarray]] = [
                self.dec_image_conv_block_dict[view](image_dict[view], deterministic)
            ] + [None] * n_layers_wo_skip
            for j, block in enumerate(self.dec_conv_blocks_dict[view]):
                embeddings_view.append(block(skips_view[j], deterministic))

            feats[view] = self.decoder_dict[view](embeddings_view, deterministic)
        return feats
