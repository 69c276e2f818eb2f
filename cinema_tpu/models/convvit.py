"""ConvViT: ConvMAE-style conv stems + shared ViT trunk (reference: cinema/convvit.py).

TPU-native re-design notes:

- masking is threaded through as a :class:`PatchMask` (static keep/mask index
  tensors) rather than dynamic boolean indexing; the masked-skip gather in
  MultiScaleFusion (reference convvit.py:287-289) becomes one
  ``take_along_axis`` kernel;
- conv stems run channels-last so the strided patch-embed convs hit XLA's
  native TPU conv path;
- the frozen sincos pos-embed is a baked constant, not a parameter (the
  reference stores it as a requires_grad=False param and the checkpoint
  loader drops it anyway, convvit.py:640-658).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from cinema_tpu.models.layers import Conv, ConvNormActBlock, Dense, LayerNorm, MaskedConvBlock
from cinema_tpu.models.vit import PatchEmbed, ViTEncoder
from cinema_tpu.ops.masking import PatchMask, gather_tokens, upsample_mask
from cinema_tpu.ops.pos_embed import get_nd_sincos_pos_embed, interpolate_pos_embed

Dtype = Any


def downsample_stack_sizes(
    image_size: Sequence[int],
    patch_size: Sequence[int],
    scale_factor: Sequence[int],
    n_conv_layers: int,
) -> Tuple[List[Tuple[int, ...]], Tuple[int, ...], Tuple[int, ...]]:
    """Shape bookkeeping for the conv stem.

    Returns:
        conv_sizes: spatial size after each conv level (n_conv_layers entries).
        eff_patch_size: effective patch size after conv layers + ViT patch embed.
        vit_grid: ViT grid size.
    """
    patch_sizes = [tuple(patch_size)] + [tuple(scale_factor)] * n_conv_layers
    size = tuple(image_size)
    conv_sizes = []
    for p in patch_sizes[:-1]:
        size = tuple(s // q for s, q in zip(size, p))
        conv_sizes.append(size)
    eff = tuple(math.prod(ps[i] for ps in patch_sizes) for i in range(len(image_size)))
    vit_grid = tuple(s // q for s, q in zip(size, patch_sizes[-1]))
    return conv_sizes, eff, vit_grid


class DownsampleEncoder(nn.Module):
    """ConvMAE downsampling stem before the ViT (reference convvit.py:54-207).

    Per level: strided ConvNormActBlock patch-embed + ``conv_n_blocks``
    MaskedConvBlocks, then PatchEmbed + extra Linear + frozen sincos
    pos-embed (interpolated for off-size inputs).
    """

    image_size: Tuple[int, ...]
    patch_size: Tuple[int, ...]
    scale_factor: Tuple[int, ...]
    conv_chans: Tuple[int, ...]
    conv_n_blocks: int
    embed_dim: int
    norm: str = "layer"
    sparse_masking: bool = False
    dtype: Dtype = jnp.float32

    @property
    def patch_sizes(self) -> List[Tuple[int, ...]]:
        return [tuple(self.patch_size)] + [tuple(self.scale_factor)] * len(self.conv_chans)

    @property
    def grid_size(self) -> Tuple[int, ...]:
        return downsample_stack_sizes(self.image_size, self.patch_size, self.scale_factor, len(self.conv_chans))[2]

    @property
    def eff_patch_size(self) -> Tuple[int, ...]:
        return downsample_stack_sizes(self.image_size, self.patch_size, self.scale_factor, len(self.conv_chans))[1]

    @property
    def n_patches(self) -> int:
        return math.prod(self.grid_size)

    def setup(self) -> None:
        conv_sizes, _, _ = downsample_stack_sizes(
            self.image_size, self.patch_size, self.scale_factor, len(self.conv_chans)
        )
        blocks = []
        for patch_size_i, chans_i in zip(self.patch_sizes[:-1], self.conv_chans):
            blocks.append(
                {
                    "patch_embed": ConvNormActBlock(
                        out_chans=chans_i,
                        kernel_size=patch_size_i,
                        strides=patch_size_i,
                        padding="VALID",
                        norm=self.norm,
                        dtype=self.dtype,
                    ),
                    "conv": [
                        MaskedConvBlock(norm=self.norm, dtype=self.dtype)
                        for _ in range(self.conv_n_blocks)
                    ],
                }
            )
        self.conv_blocks = blocks
        self.patch_embed = PatchEmbed(
            image_size=conv_sizes[-1] if conv_sizes else tuple(self.image_size),
            patch_size=self.patch_sizes[-1],
            embed_dim=self.embed_dim,
            dtype=self.dtype,
        )
        self.linear = Dense(self.embed_dim, dtype=self.dtype)

    def __call__(
        self,
        image: jnp.ndarray,
        mask: Optional[PatchMask] = None,
        deterministic: bool = True,
    ) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
        """Args: image (batch, *spatial, in_chans); mask at ViT grid size.

        Returns:
            skips: per-conv-level features (batch, *size_i, chans_i).
            x: (batch, n_patches, embed_dim) tokens with pos-embed added.
        """
        image_size = image.shape[1:-1]
        grid_size = tuple(s // p for s, p in zip(image_size, self.eff_patch_size))

        # exactness precondition for the sparse path: DropPath in the cell
        # layout samples per visible CELL (batch*k leading dim) rather than
        # per sample — only equivalent when stem drop_path is 0
        sparse_exact = all(
            c.drop_path == 0.0 for b in self.conv_blocks for c in b["conv"]
        )
        if mask is not None and self.sparse_masking and self.norm == "layer" and sparse_exact:
            # visible-cells-only stem (exact for per-position norms; see
            # ops/sparse_cells.py): returns sparse skips (batch, k, *cell, C)
            # and tokens already gathered to (batch, k, E)
            return self._sparse_forward(image, grid_size, mask, deterministic)

        if mask is None:
            conv_masks: List[Optional[jnp.ndarray]] = [None] * len(self.conv_chans)
        else:
            # visible (1=keep) masks at each conv level's resolution,
            # upsampled progressively from the ViT grid (reference
            # convvit.py:183-192)
            conv_masks = []
            vis = (~mask.bool_mask).reshape(mask.bool_mask.shape[0], *grid_size)
            for patch_size in self.patch_sizes[:0:-1]:
                vis = upsample_mask(vis, patch_size)
                conv_masks.insert(0, vis)

        skips = []
        x = image
        for block, conv_mask in zip(self.conv_blocks, conv_masks):
            x = block["patch_embed"](x)
            for conv in block["conv"]:
                x = conv(x, conv_mask, deterministic)
            skips.append(x)

        x = self.linear(self.patch_embed(x))
        # stay in numpy until the add: the table is a baked constant and the
        # torch-exact resize (bicubic A=-0.75) runs host-side at trace time
        pos_embed = get_nd_sincos_pos_embed(self.embed_dim, self.patch_embed.grid_size)[None]
        pos_embed = interpolate_pos_embed(pos_embed, self.patch_embed.grid_size, grid_size)
        x = x + jnp.asarray(pos_embed, dtype=x.dtype)
        return skips, x

    def _sparse_forward(
        self,
        image: jnp.ndarray,
        grid_size: Tuple[int, ...],
        mask: PatchMask,
        deterministic: bool,
    ) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
        """Run the stem on visible cells only (mask ratio r => 1-r of the
        dense FLOPs/HBM traffic). Every conv except the depthwise has
        kernel == stride aligned to cell boundaries, so cells are
        independent; MaskedConvBlock densifies around its dw conv via
        CellDenseCtx, whose scatter-zeros reproduce the reference's
        mask-multiply semantics exactly (reference conv.py:385-390)."""
        from cinema_tpu.ops.sparse_cells import CellDenseCtx, gather_cells, image_to_cells

        cells = image_to_cells(image, grid_size)
        vis = gather_cells(cells, mask.keep_ids)
        batch, n_keep = vis.shape[:2]
        x = vis.reshape(batch * n_keep, *vis.shape[2:])
        ctx = CellDenseCtx(grid_size=grid_size, keep_ids=mask.keep_ids)

        skips = []
        for block in self.conv_blocks:
            x = block["patch_embed"](x)
            for conv in block["conv"]:
                x = conv(x, None, deterministic, dense_ctx=ctx)
            skips.append(x.reshape(batch, n_keep, *x.shape[1:]))

        x = self.linear(self.patch_embed(x))  # (batch*k, 1, E)
        x = x.reshape(batch, n_keep, self.embed_dim)
        pos_embed = get_nd_sincos_pos_embed(self.embed_dim, self.patch_embed.grid_size)[None]
        pos_embed = interpolate_pos_embed(pos_embed, self.patch_embed.grid_size, grid_size)
        pos = jnp.asarray(pos_embed, dtype=x.dtype)[0]  # (n_cells, E)
        x = x + jnp.take(pos, mask.keep_ids, axis=0)
        return skips, x


class MultiScaleFusion(nn.Module):
    """Fuse conv-stem skips into ViT output tokens (reference convvit.py:210-291)."""

    image_size: Tuple[int, ...]
    patch_size: Tuple[int, ...]
    scale_factor: Tuple[int, ...]
    conv_chans: Tuple[int, ...]
    embed_dim: int
    norm_eps: float = 1e-5
    dtype: Dtype = jnp.float32

    def setup(self) -> None:
        conv_sizes, _, vit_grid = downsample_stack_sizes(
            self.image_size, self.patch_size, self.scale_factor, len(self.conv_chans)
        )
        convs = []
        for i, _ in enumerate(self.conv_chans):
            down_kernel = tuple(s // g for s, g in zip(conv_sizes[i], vit_grid))
            convs.append(
                Conv(
                    self.embed_dim,
                    down_kernel,
                    strides=down_kernel,
                    padding="VALID",
                    dtype=self.dtype,
                )
            )
        self.down_convs = convs
        self.norm = LayerNorm(epsilon=self.norm_eps, dtype=self.dtype)

    def __call__(
        self,
        skips: List[jnp.ndarray],
        x: jnp.ndarray,
        mask: Optional[PatchMask] = None,
    ) -> jnp.ndarray:
        """skips: conv features, dense (batch, *size_i, C_i) or sparse
        visible cells (batch, k, *cell_i, C_i); x: (batch, n_keep, E) ViT
        tokens (no cls)."""
        nd = len(self.image_size)
        for skip, conv in zip(skips, self.down_convs):
            if skip.ndim == nd + 3:
                # sparse cells: the down conv (kernel == stride == cell size)
                # maps each cell to exactly one token — no gather needed
                batch, n_keep = skip.shape[:2]
                down = conv(skip.reshape(batch * n_keep, *skip.shape[2:]))
                down = down.reshape(batch, n_keep, self.embed_dim)
            else:
                down = conv(skip)
                down = down.reshape(down.shape[0], -1, down.shape[-1])
                if mask is not None:
                    down = gather_tokens(down, mask.keep_ids)
            x = x + down
        return self.norm(x)


class ConvViT(nn.Module):
    """Multi-view ConvViT for classification/regression (reference convvit.py:335-613)."""

    image_size_dict: Dict[str, Tuple[int, ...]]
    in_chans_dict: Dict[str, int]
    n_frames: int
    out_chans: int
    enc_patch_size_dict: Dict[str, Tuple[int, ...]]
    enc_scale_factor_dict: Dict[str, Tuple[int, ...]]
    enc_conv_chans: Tuple[int, ...]
    enc_conv_n_blocks: int
    enc_embed_dim: int
    enc_depth: int
    enc_n_heads: int
    mlp_ratio: float = 4
    qkv_bias: bool = True
    norm_eps: float = 1e-5
    rotary: bool = False
    drop_path: float = 0.0
    norm: str = "layer"
    mlp_type: str = "mlp"
    attn_impl: str = "auto"
    remat: bool = False
    use_head: bool = True
    dtype: Dtype = jnp.float32

    @property
    def views(self) -> List[str]:
        return list(self.image_size_dict.keys())

    def setup(self) -> None:
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
        self.enc_fusion_dict = {
            view: MultiScaleFusion(
                image_size=tuple(self.image_size_dict[view]),
                patch_size=tuple(self.enc_patch_size_dict[view]),
                scale_factor=tuple(self.enc_scale_factor_dict[view]),
                conv_chans=tuple(self.enc_conv_chans),
                embed_dim=self.enc_embed_dim,
                norm_eps=self.norm_eps,
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
        if self.use_head:
            self.pred_head_dict = {
                view: Dense(self.out_chans, dtype=self.dtype) for view in [*self.views, "cls"]
            }

    def feature_forward(
        self,
        image_dict: Dict[str, jnp.ndarray],
        mask_dict: Optional[Dict[str, PatchMask]] = None,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """Per-view stems -> shared encoder -> per-view fusion.

        Returns dict with 'cls' (batch, 1, E) and per-view (batch, n_patches, E).
        Masking only hides patches from the encoder; output keeps full size
        (reference convvit.py:459-503 keeps fusion mask=None).
        """
        views = list(image_dict.keys())
        for v in views:
            if v not in self.views:
                raise ValueError(f"views {views} must be in {self.views}.")

        xs, ns_patch, skips_view = [], [], {}
        for view in views:
            mask_view = mask_dict[view] if mask_dict is not None else None
            skip_view, x_view = self.enc_down_dict[view](image_dict[view], mask_view, deterministic)
            ns_patch.append(x_view.shape[1])
            skips_view[view] = skip_view
            xs.append(x_view)

        x = self.encoder(jnp.concatenate(xs, axis=1), deterministic)

        bounds = np_cumsum([1, *ns_patch])
        starts = [0] + bounds[:-1]
        xs = [x[:, s:e] for s, e in zip(starts, bounds)]
        x_dict = dict(zip(["cls", *views], xs))
        for view in views:
            x_dict[view] = self.enc_fusion_dict[view](skips_view[view], x_dict[view], None)
        return x_dict

    def __call__(
        self,
        image_dict: Dict[str, jnp.ndarray],
        mask_dict: Optional[Dict[str, PatchMask]] = None,
        reduce: str = "all",
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Forward to logits (batch, out_chans); reduce in {'patch','all','cls'}."""
        x_dict = self.feature_forward(image_dict, mask_dict, deterministic)
        views = [v for v in x_dict if v != "cls"]
        if reduce == "patch":
            logits = jnp.concatenate(
                [self.pred_head_dict[view](x_dict[view].mean(axis=1, keepdims=True)) for view in views],
                axis=1,
            )
            return logits.mean(axis=1)
        if reduce == "all":
            logits = jnp.concatenate(
                [self.pred_head_dict[view](x_dict[view].mean(axis=1, keepdims=True)) for view in views]
                + [self.pred_head_dict["cls"](x_dict["cls"])],
                axis=1,
            )
            return logits.mean(axis=1)
        if reduce == "cls":
            return self.pred_head_dict["cls"](x_dict["cls"])[:, 0]
        raise NotImplementedError(f"Unsupported reduce method {reduce}.")


def np_cumsum(xs: Sequence[int]) -> List[int]:
    """Cumulative sums of a python int list (split boundaries)."""
    out, acc = [], 0
    for x in xs:
        acc += x
        out.append(acc)
    return out


def get_layer_id_for_vit(path: str, n_layers: int) -> int:
    """BEiT-style layer id for layer-wise LR decay (reference convvit.py:707-737).

    Args:
        path: '/'-joined flax param path.
        n_layers: encoder depth + 1.

    Returns:
        layer id; conv stems / embeddings are 0, block i is i+1, rest n_layers.
    """
    if path.startswith("enc_"):
        return 0
    if any(x in path for x in ["cls_token", "pos_embed", "patch_embed", "view_embed"]):
        return 0
    if path.startswith("encoder/blocks_"):
        return int(path.split("/")[1].split("_")[1]) + 1
    return n_layers
