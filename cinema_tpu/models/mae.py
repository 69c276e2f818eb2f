"""CineMA: multi-view cine masked autoencoder (reference: cinema/mae/mae.py).

TPU-native re-design:

- masks are :class:`PatchMask` structs (static keep/mask index tensors from
  one argsort), so every gather in the pipeline — visible tokens (reference
  mae.py:550), decoder pos-embed shuffle (mae.py:97-99), masked-target loss
  gather (mae.py:140) — compiles to a fused static-shape ``take_along_axis``;
- per-view losses use a masked finite-mean instead of python-side NaN
  filtering (mae.py:604-608), keeping the whole loss inside one jit;
- mask sampling uses the flax 'mask' RNG collection so the training step is
  a pure function of (params, batch, rng).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from cinema_tpu.models.convvit import DownsampleEncoder, MultiScaleFusion, np_cumsum
from cinema_tpu.models.layers import Dense, token_init
from cinema_tpu.models.vit import ViTDecoder, ViTEncoder, get_pos_embed_array
from cinema_tpu.ops.masking import PatchMask, gather_tokens, random_patch_mask
from cinema_tpu.ops.patch import patchify

Dtype = Any


def get_decoder_patch_size(
    image_size: Tuple[int, ...],
    n_conv_layers: int,
    enc_patch_size: Tuple[int, ...],
    enc_scale_factor: Tuple[int, ...],
) -> Tuple[int, ...]:
    """Effective decoder patch size (reference mae.py:207-228)."""
    dec = (1,) * len(image_size)
    for i in range(1 + n_conv_layers):
        p = enc_patch_size if i == 0 else enc_scale_factor
        dec = tuple(s * q for s, q in zip(dec, p))
    return dec


def mse_loss(
    target: jnp.ndarray,
    pred: jnp.ndarray,
    mask: PatchMask,
    norm_target: bool,
    epsilon: float = 1.0e-6,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """MSE on masked patches only (reference mae.py:107-152).

    Args:
        target: (batch, n_patches, out_chans) patchified image.
        pred: (batch, n_masked, out_chans) predictions.
        mask: PatchMask whose mask_ids select target rows.
        norm_target: per-patch normalisation of the target.
        epsilon: div-by-zero guard.

    Returns:
        scalar loss, metrics dict.
    """
    target = target.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    mean = target.mean(axis=-1, keepdims=True)
    # torch.Tensor.var defaults to correction=1 (unbiased); jnp defaults to
    # ddof=0 — match the reference (mae.py:130) exactly
    var = target.var(axis=-1, keepdims=True, ddof=1)
    std = var**0.5
    metrics = {"target_mean": mean.mean(), "target_std": std.mean()}
    if norm_target:
        target = (target - mean) / (std + epsilon)
    target = gather_tokens(target, mask.mask_ids)
    loss = jnp.mean(jnp.square(pred - jax.lax.stop_gradient(target)))
    metrics["mse_loss"] = loss
    if norm_target and target.shape[1] > 0:
        metrics["normed_target_max"] = target.max()
        metrics["pred_max"] = pred.max()
    return loss, metrics


class DecoderEmbedding(nn.Module):
    """Per-view decoder pos-embed shuffle + mask token (reference mae.py:155-204)."""

    enc_grid_size: Tuple[int, ...]
    dec_embed_dim: int
    add_embed_token: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: PatchMask) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (batch, n_keep, D) visible tokens (no cls).

        Returns:
            x_vis: (batch, n_keep, D) with pos-embed added.
            x_mask: (batch, n_masked, D) mask tokens with pos-embed added.
        """
        pos_embed = get_pos_embed_array(self.dec_embed_dim, self.enc_grid_size)[0].astype(x.dtype)
        vis_pe = gather_tokens(pos_embed, mask.keep_ids)
        mask_pe = gather_tokens(pos_embed, mask.mask_ids)
        mask_token = self.param("mask_token", token_init, (1, 1, self.dec_embed_dim), jnp.float32)
        x_vis = x + vis_pe
        x_mask = mask_token.astype(x.dtype) + mask_pe
        if self.add_embed_token:
            embed_token = self.param("embed_token", token_init, (1, 1, self.dec_embed_dim), jnp.float32)
            x_vis = x_vis + embed_token.astype(x.dtype)
            x_mask = x_mask + embed_token.astype(x.dtype)
        return x_vis, x_mask


class CineMA(nn.Module):
    """Cine masked autoencoder (reference mae.py:285-612).

    Per-view conv stems -> shared ViT encoder over concatenated visible
    tokens -> multi-scale fusion -> shared cross-attention decoder (queries =
    cls + mask tokens, keys = visible tokens) -> per-view linear pred heads.
    """

    image_size_dict: Dict[str, Tuple[int, ...]]
    in_chans_dict: Dict[str, int]
    enc_patch_size_dict: Dict[str, Tuple[int, ...]]
    enc_scale_factor_dict: Dict[str, Tuple[int, ...]]
    enc_conv_chans: Tuple[int, ...]
    enc_conv_n_blocks: int
    enc_embed_dim: int
    enc_depth: int
    enc_n_heads: int
    dec_embed_dim: int
    dec_depth: int
    dec_n_heads: int
    mlp_ratio: float = 4
    qkv_bias: bool = True
    norm_target: bool = False
    cross_attn: bool = True
    norm_eps: float = 1e-5
    rotary: bool = False
    drop_path: float = 0.0
    norm: str = "layer"
    mlp_type: str = "mlp"
    attn_impl: str = "auto"
    remat: bool = False
    # nn.scan over transformer blocks: one compiled block body per stack
    # (compile-time lever; params gain a leading depth axis — see
    # vit._scanned_blocks_cls)
    scan_blocks: bool = False
    # run stems on visible cells only during masked training (exact for
    # per-position norms — see ops/sparse_cells.py; auto-disabled otherwise)
    sparse_masking: bool = True
    dtype: Dtype = jnp.float32

    @property
    def views(self) -> List[str]:
        return list(self.image_size_dict.keys())

    def dec_patch_size(self, view: str) -> Tuple[int, ...]:
        return get_decoder_patch_size(
            image_size=tuple(self.image_size_dict[view]),
            n_conv_layers=len(self.enc_conv_chans),
            enc_patch_size=tuple(self.enc_patch_size_dict[view]),
            enc_scale_factor=tuple(self.enc_scale_factor_dict[view]),
        )

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
                sparse_masking=self.sparse_masking,
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
            scan_blocks=self.scan_blocks,
            dtype=self.dtype,
        )
        self.dec_linear = Dense(self.dec_embed_dim, dtype=self.dtype)
        self.dec_embed_dict = {
            view: DecoderEmbedding(
                enc_grid_size=self.enc_down_dict[view].grid_size,
                dec_embed_dim=self.dec_embed_dim,
                add_embed_token=False,
                dtype=self.dtype,
            )
            for view in self.views
        }
        self.decoder = ViTDecoder(
            embed_dim=self.dec_embed_dim,
            depth=self.dec_depth,
            n_heads=self.dec_n_heads,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            norm_eps=self.norm_eps,
            rotary=self.rotary,
            drop_path=self.drop_path,
            mlp_type=self.mlp_type,
            attn_impl=self.attn_impl,
            remat=self.remat,
            scan_blocks=self.scan_blocks,
            dtype=self.dtype,
        )
        self.pred_head_dict = {
            view: Dense(
                math.prod(self.dec_patch_size(view)) * self.in_chans_dict[view],
                dtype=self.dtype,
            )
            for view in self.views
        }

    def feature_forward(
        self,
        image_dict: Dict[str, jnp.ndarray],
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """No-mask feature extraction (reference mae.py:457-502).

        Returns {'cls': (batch, 1, E), view: (batch, n_patches_view, E)}.
        """
        views = list(image_dict.keys())
        for v in views:
            if v not in self.views:
                raise ValueError(f"views {views} must be in {self.views}.")

        xs, ns_keep, skips_view = [], [], []
        for view in views:
            skip_view, x_view = self.enc_down_dict[view](image_dict[view], None, deterministic)
            skips_view.append(skip_view)
            ns_keep.append(x_view.shape[1])
            xs.append(x_view)

        x = self.encoder(jnp.concatenate(xs, axis=1), deterministic)
        bounds = np_cumsum([1, *ns_keep])
        xs = [x[:, s:e] for s, e in zip([0] + bounds[:-1], bounds)]
        for i, view in enumerate(views):
            xs[i + 1] = self.enc_fusion_dict[view](skips_view[i], xs[i + 1], None)
        return dict(zip(["cls", *views], xs))

    def __call__(
        self,
        image_dict: Dict[str, jnp.ndarray],
        enc_mask_ratio: float,
        mask_dict: Optional[Dict[str, PatchMask]] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, PatchMask], Dict[str, jnp.ndarray]]:
        """MAE training forward (reference mae.py:504-612).

        Args:
            image_dict: per-view images (batch, *spatial, in_chans).
            enc_mask_ratio: static mask ratio.
            mask_dict: optional externally sampled masks (for tests/parity).
            deterministic: disables dropout/drop-path.

        Returns:
            loss: mean over views with finite losses (NaN if none).
            pred_dict: per-view (batch, n_masked_view, out_chans).
            mask_dict: per-view PatchMask.
            metrics: scalar metrics.
        """
        views = list(image_dict.keys())
        for v in views:
            if v not in self.views:
                raise ValueError(f"views {views} must be in {self.views}.")
        batch_size = image_dict[views[0]].shape[0]
        metrics: Dict[str, jnp.ndarray] = {}

        if mask_dict is None:
            rng = self.make_rng("mask")
            rngs = jax.random.split(rng, len(views))
            mask_dict = {
                view: random_patch_mask(
                    rngs[i], batch_size, self.enc_down_dict[view].n_patches, enc_mask_ratio
                )
                for i, view in enumerate(views)
            }

        # conv stems with masked conv blocks + visible-token gather
        xs, ns_keep, ns_masked, skips_view = [], [], [], []
        for view in views:
            mask = mask_dict[view]
            skip_view, x_view = self.enc_down_dict[view](image_dict[view], mask, deterministic)
            if x_view.shape[1] != mask.n_keep:
                # dense stem path returns full-grid tokens; the sparse path
                # (sparse_masking) already gathered to visible tokens
                x_view = gather_tokens(x_view, mask.keep_ids)
            skips_view.append(skip_view)
            ns_keep.append(x_view.shape[1])
            ns_masked.append(mask.n_masked)
            xs.append(x_view)

        # shared encoder over concat of all views' visible tokens (+cls)
        x = self.encoder(jnp.concatenate(xs, axis=1), deterministic)

        # fuse conv skips (masked-gathered)
        bounds = np_cumsum([1, *ns_keep])
        xs = [x[:, s:e] for s, e in zip([0] + bounds[:-1], bounds)]
        for i, view in enumerate(views):
            xs[i + 1] = self.enc_fusion_dict[view](skips_view[i], xs[i + 1], mask_dict[view])

        # project to decoder dim
        x = self.dec_linear(jnp.concatenate(xs, axis=1))
        xs = [x[:, s:e] for s, e in zip([0] + bounds[:-1], bounds)]

        # per-view decoder embeddings
        xs_vis, xs_mask = [], []
        for i, view in enumerate(views):
            x_vis_view, x_mask_view = self.dec_embed_dict[view](xs[i + 1], mask_dict[view])
            xs_vis.append(x_vis_view)
            xs_mask.append(x_mask_view)

        # shared decoder
        if self.cross_attn:
            x_q = jnp.concatenate([xs[0], *xs_mask], axis=1)
            x_k = jnp.concatenate(xs_vis, axis=1)
            x = self.decoder(x_q, x_k, sum(ns_masked), deterministic)
        else:
            x_q = jnp.concatenate([xs[0], *xs_vis, *xs_mask], axis=1)
            x = self.decoder(x_q, None, sum(ns_masked), deterministic)
        mask_bounds = np_cumsum(ns_masked)
        xs = [x[:, s:e] for s, e in zip([0] + mask_bounds[:-1], mask_bounds)]

        # per-view heads + masked MSE, averaging finite view losses only
        preds = {}
        view_losses = []
        for i, view in enumerate(views):
            pred_view = self.pred_head_dict[view](xs[i])
            preds[view] = pred_view
            target = patchify(image_dict[view], self.dec_patch_size(view))
            loss_view, metrics_view = mse_loss(
                target=target,
                pred=pred_view,
                mask=mask_dict[view],
                norm_target=self.norm_target,
            )
            metrics.update({f"{view}_{m}": v for m, v in metrics_view.items()})
            view_losses.append(loss_view)

        losses = jnp.stack(view_losses)
        finite = jnp.isfinite(losses)
        n_finite = jnp.sum(finite)
        loss = jnp.where(
            n_finite > 0,
            jnp.sum(jnp.where(finite, losses, 0.0)) / jnp.maximum(n_finite, 1),
            jnp.nan,
        )
        metrics["loss"] = loss
        return loss, preds, mask_dict, metrics
