"""Plain-torch spec of the reference CineMA semantics, for numerical parity tests.

Written from the reference's documented behavior (cinema/conv.py, vit.py,
convvit.py, mae/mae.py, segmentation/convunetr.py) using only torch.nn —
no timm/monai. State-dict naming matches the published checkpoints, so
``cinema_tpu.bridge.params_to_torch_state_dict`` output loads directly and
full-model outputs can be compared against the flax implementation.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import torch
from torch import nn
from torch.nn import functional as F


# ---------------------------------------------------------------- primitives
class ConvLayerNorm(nn.LayerNorm):
    """LayerNorm over the channel axis of NCHW(D)."""

    def forward(self, x):
        x = x.permute(0, *range(2, x.ndim), 1)
        x = super().forward(x)
        return x.permute(0, x.ndim - 1, *range(1, x.ndim - 1)).contiguous()


def conv_nd(nd):
    return nn.Conv2d if nd == 2 else nn.Conv3d


class ConvNormActBlock(nn.Module):
    def __init__(self, nd, in_chans, out_chans, kernel_size, stride):
        super().__init__()
        self.conv = conv_nd(nd)(in_chans, out_chans, kernel_size=kernel_size, stride=stride)
        self.norm = ConvLayerNorm(out_chans, eps=1e-6)

    def forward(self, x):
        return F.gelu(self.norm(self.conv(x)))


class ConvMlp(nn.Module):
    def __init__(self, nd, chans, hidden):
        super().__init__()
        self.fc1 = conv_nd(nd)(chans, hidden, kernel_size=1)
        self.fc2 = conv_nd(nd)(hidden, chans, kernel_size=1)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class MaskedConvBlock(nn.Module):
    def __init__(self, nd, chans, mlp_ratio=4):
        super().__init__()
        self.norm1 = ConvLayerNorm(chans, eps=1e-6)
        self.norm2 = ConvLayerNorm(chans, eps=1e-6)
        self.conv1 = conv_nd(nd)(chans, chans, kernel_size=1)
        self.conv2 = conv_nd(nd)(chans, chans, kernel_size=1)
        self.dw_conv = conv_nd(nd)(chans, chans, kernel_size=5, padding="same", groups=chans)
        self.mlp = ConvMlp(nd, chans, chans * mlp_ratio)

    def forward(self, x, mask=None):
        h = self.conv1(self.norm1(x))
        if mask is not None:
            h = mask.unsqueeze(1).to(h.dtype) * h
        x = x + self.conv2(self.dw_conv(h))
        return x + self.mlp(self.norm2(x))


class ConvResBlock(nn.Module):
    def __init__(self, nd, in_chans, out_chans, kernel_size=3):
        super().__init__()
        self.norm1 = ConvLayerNorm(in_chans, eps=1e-6)
        self.norm2 = ConvLayerNorm(out_chans, eps=1e-6)
        self.conv1 = conv_nd(nd)(in_chans, out_chans, kernel_size=kernel_size, padding="same")
        self.conv2 = conv_nd(nd)(out_chans, out_chans, kernel_size=kernel_size, padding="same")
        self.shortcut = (
            conv_nd(nd)(in_chans, out_chans, kernel_size=1) if in_chans != out_chans else nn.Identity()
        )

    def forward(self, x):
        h = self.conv1(F.gelu(self.norm1(x)))
        h = self.conv2(F.gelu(self.norm2(h)))
        return h + self.shortcut(x)


# ----------------------------------------------------------------- vit parts
def patchify(image: torch.Tensor, patch_size) -> torch.Tensor:
    nd = len(patch_size)
    batch, in_chans, *spatial = image.shape
    grid = [s // p for s, p in zip(spatial, patch_size)]
    shape = [batch, in_chans]
    for g, p in zip(grid, patch_size):
        shape += [g, p]
    x = image.reshape(shape)
    if nd == 2:
        x = torch.einsum("nchpwq->nhwpqc", x)
    elif nd == 3:
        x = torch.einsum("nchpwqdr->nhwdpqrc", x)
    else:
        raise ValueError(nd)
    return x.reshape(batch, int(np.prod(grid)), int(np.prod(patch_size)) * in_chans)


def sincos_pos_embed(embed_dim: int, grid_size) -> torch.Tensor:
    from cinema_tpu.ops.pos_embed import get_nd_sincos_pos_embed

    return torch.from_numpy(get_nd_sincos_pos_embed(embed_dim, tuple(grid_size))).float()[None]


class PatchEmbed(nn.Module):
    def __init__(self, image_size, patch_size, in_chans, embed_dim):
        super().__init__()
        self.patch_size = tuple(patch_size)
        self.grid_size = tuple(s // p for s, p in zip(image_size, patch_size))
        self.n_patches = int(np.prod(self.grid_size))
        self.proj = nn.Linear(in_chans * int(np.prod(patch_size)), embed_dim)

    def forward(self, image):
        return self.proj(patchify(image, self.patch_size))


class Attention(nn.Module):
    def __init__(self, dim, n_heads):
        super().__init__()
        self.n_heads = n_heads
        self.head_dim = dim // n_heads
        self.q = nn.Linear(dim, dim, bias=True)
        self.kv = nn.Linear(dim, dim * 2, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, q, k=None):
        if k is None:
            k = q
        b, nq, dim = q.shape
        nk = k.shape[1]
        qh = self.q(q).reshape(b, nq, self.n_heads, self.head_dim).permute(0, 2, 1, 3)
        kv = self.kv(k).reshape(b, nk, 2, self.n_heads, self.head_dim).permute(2, 0, 3, 1, 4)
        kh, vh = kv.unbind(0)
        o = F.scaled_dot_product_attention(qh, kh, vh)
        o = o.transpose(1, 2).reshape(b, nq, dim)
        return self.proj(o)


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class Block(nn.Module):
    def __init__(self, dim, n_heads, mlp_ratio=4):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn = Attention(dim, n_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def forward(self, q, k=None):
        q = q + self.attn(self.norm1(q), k)
        return q + self.mlp(self.norm2(q))


class ViTEncoder(nn.Module):
    def __init__(self, dim, depth, n_heads):
        super().__init__()
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.blocks = nn.ModuleList([Block(dim, n_heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-5)

    def forward(self, x):
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1)
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)


class ViTDecoder(nn.Module):
    def __init__(self, dim, depth, n_heads):
        super().__init__()
        self.blocks = nn.ModuleList([Block(dim, n_heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim)

    def forward(self, x_q, x_k, n_masked):
        for blk in self.blocks:
            x_q = blk(x_q, x_k)
        return self.norm(x_q[:, -n_masked:, :])


# --------------------------------------------------------------- conv stems
class DownsampleEncoder(nn.Module):
    def __init__(self, image_size, in_chans, patch_size, scale_factor, conv_chans, conv_n_blocks, embed_dim):
        super().__init__()
        nd = len(image_size)
        patch_sizes = [tuple(patch_size)] + [tuple(scale_factor)] * len(conv_chans)
        self.patch_sizes = patch_sizes
        size = tuple(image_size)
        blocks = []
        chans = in_chans
        for ps, ch in zip(patch_sizes[:-1], conv_chans):
            block = nn.Module()
            block.patch_embed = ConvNormActBlock(nd, chans, ch, ps, ps)
            block.conv = nn.ModuleList([MaskedConvBlock(nd, ch) for _ in range(conv_n_blocks)])
            blocks.append(block)
            size = tuple(s // p for s, p in zip(size, ps))
            chans = ch
        self.conv_blocks = nn.ModuleList(blocks)
        self.patch_embed = PatchEmbed(size, patch_sizes[-1], chans, embed_dim)
        self.linear = nn.Linear(embed_dim, embed_dim)
        self.register_buffer("pos_embed", sincos_pos_embed(embed_dim, self.patch_embed.grid_size))

    def forward(self, image, mask=None):
        batch = image.shape[0]
        grid = self.patch_embed.grid_size
        if mask is None:
            conv_masks: List[Optional[torch.Tensor]] = [None] * len(self.conv_blocks)
        else:
            conv_masks = []
            vis = (~mask).reshape(batch, *grid)
            for ps in self.patch_sizes[:0:-1]:
                for axis, f in enumerate(ps):
                    if f != 1:
                        vis = vis.repeat_interleave(f, dim=axis + 1)
                conv_masks.insert(0, vis)
        skips = []
        x = image
        for block, cm in zip(self.conv_blocks, conv_masks):
            x = block.patch_embed(x)
            for conv in block.conv:
                x = conv(x, cm)
            skips.append(x)
        x = self.linear(self.patch_embed(x)) + self.pos_embed
        return skips, x


class MultiScaleFusion(nn.Module):
    def __init__(self, image_size, patch_size, scale_factor, conv_chans, embed_dim):
        super().__init__()
        nd = len(image_size)
        patch_sizes = [tuple(patch_size)] + [tuple(scale_factor)] * len(conv_chans)
        grid = tuple(image_size)
        for ps in patch_sizes:
            grid = tuple(s // p for s, p in zip(grid, ps))
        size = tuple(image_size)
        convs = []
        for i, ch in enumerate(conv_chans):
            size = tuple(s // p for s, p in zip(size, patch_sizes[i]))
            k = tuple(s // g for s, g in zip(size, grid))
            convs.append(conv_nd(nd)(ch, embed_dim, kernel_size=k, stride=k))
        self.down_convs = nn.ModuleList(convs)
        self.norm = nn.LayerNorm(embed_dim, eps=1e-5)

    def forward(self, skips, x, mask=None):
        for skip, conv in zip(skips, self.down_convs):
            down = conv(skip).flatten(2).transpose(1, 2)
            if mask is not None:
                down = down[~mask].reshape(x.shape[0], -1, x.shape[-1])
            x = x + down
        return self.norm(x)


# --------------------------------------------------------------------- MAE
class CineMA(nn.Module):
    def __init__(
        self,
        image_size_dict: Dict[str, Sequence[int]],
        in_chans_dict: Dict[str, int],
        enc_patch_size_dict,
        enc_scale_factor_dict,
        enc_conv_chans,
        enc_conv_n_blocks,
        enc_embed_dim,
        enc_depth,
        enc_n_heads,
        dec_embed_dim,
        dec_depth,
        dec_n_heads,
    ):
        super().__init__()
        self.views = list(image_size_dict.keys())
        self.enc_down_dict = nn.ModuleDict(
            {
                v: DownsampleEncoder(
                    image_size_dict[v],
                    in_chans_dict[v],
                    enc_patch_size_dict[v],
                    enc_scale_factor_dict[v],
                    enc_conv_chans,
                    enc_conv_n_blocks,
                    enc_embed_dim,
                )
                for v in self.views
            }
        )
        self.enc_fusion_dict = nn.ModuleDict(
            {
                v: MultiScaleFusion(
                    image_size_dict[v],
                    enc_patch_size_dict[v],
                    enc_scale_factor_dict[v],
                    enc_conv_chans,
                    enc_embed_dim,
                )
                for v in self.views
            }
        )
        self.encoder = ViTEncoder(enc_embed_dim, enc_depth, enc_n_heads)
        self.dec_linear = nn.Linear(enc_embed_dim, dec_embed_dim)

        self.dec_embed_dict = nn.ModuleDict()
        for v in self.views:
            mod = nn.Module()
            mod.mask_token = nn.Parameter(torch.zeros(1, 1, dec_embed_dim))
            mod.register_buffer(
                "pos_embed", sincos_pos_embed(dec_embed_dim, self.enc_down_dict[v].patch_embed.grid_size)
            )
            self.dec_embed_dict[v] = mod
        self.decoder = ViTDecoder(dec_embed_dim, dec_depth, dec_n_heads)
        self.dec_patch_size_dict = {}
        self.pred_head_dict = nn.ModuleDict()
        for v in self.views:
            dec_patch = [1] * len(image_size_dict[v])
            for i in range(1 + len(enc_conv_chans)):
                p = enc_patch_size_dict[v] if i == 0 else enc_scale_factor_dict[v]
                dec_patch = [a * b for a, b in zip(dec_patch, p)]
            self.dec_patch_size_dict[v] = tuple(dec_patch)
            self.pred_head_dict[v] = nn.Linear(
                dec_embed_dim, int(np.prod(dec_patch)) * in_chans_dict[v]
            )

    def forward(self, image_dict: Dict[str, torch.Tensor], mask_dict: Dict[str, torch.Tensor]):
        """mask_dict: per-view bool (batch, n_patches), True = masked."""
        views = list(image_dict.keys())
        batch = image_dict[views[0]].shape[0]
        xs, ns_keep, ns_masked, skips_view = [], [], [], []
        for v in views:
            mask = mask_dict[v]
            skips, x = self.enc_down_dict[v](image_dict[v], mask)
            x = x[~mask].reshape(batch, -1, x.shape[-1])
            skips_view.append(skips)
            ns_keep.append(x.shape[1])
            ns_masked.append(int(mask.sum(dim=1)[0]))
            xs.append(x)
        x = self.encoder(torch.cat(xs, dim=1))
        xs = list(torch.split(x, [1, *ns_keep], dim=1))
        for i, v in enumerate(views):
            xs[i + 1] = self.enc_fusion_dict[v](skips_view[i], xs[i + 1], mask_dict[v])
        x = self.dec_linear(torch.cat(xs, dim=1))
        xs = torch.split(x, [1, *ns_keep], dim=1)
        xs_vis, xs_mask = [], []
        for i, v in enumerate(views):
            mask = mask_dict[v]
            pe = self.dec_embed_dict[v].pos_embed.expand(batch, -1, -1)
            vis_pe = pe[~mask].reshape(batch, ns_keep[i], -1)
            mask_pe = pe[mask].reshape(batch, ns_masked[i], -1)
            xs_vis.append(xs[i + 1] + vis_pe)
            xs_mask.append(self.dec_embed_dict[v].mask_token + mask_pe)
        x_q = torch.cat([xs[0], *xs_mask], dim=1)
        x_k = torch.cat(xs_vis, dim=1)
        x = self.decoder(x_q, x_k, sum(ns_masked))
        xs = torch.split(x, ns_masked, dim=1)
        preds, losses = {}, []
        for i, v in enumerate(views):
            pred = self.pred_head_dict[v](xs[i])
            preds[v] = pred
            target = patchify(image_dict[v], self.dec_patch_size_dict[v])
            target = target[mask_dict[v]].reshape(pred.shape)
            losses.append(F.mse_loss(pred, target))
        loss = sum(losses) / len(losses)
        return loss, preds


# ------------------------------------------------------------- ConvUNetR
def conv_transpose_nd(nd):
    return nn.ConvTranspose2d if nd == 2 else nn.ConvTranspose3d


class UpsampleDecoder(nn.Module):
    """Mirrors cinema_tpu.models.convunetr.UpsampleDecoder (reference
    convunetr.py:25-106): transpose-conv up + residual blocks, additive skips."""

    def __init__(self, nd, chans, patch_size, scale_factor, n_blocks=2, kernel_size=3):
        super().__init__()
        chans = tuple(chans)
        chans_rev = chans[::-1]
        blocks = []
        for i, ch in enumerate(chans_rev):
            up_kernel = tuple(patch_size) if i == len(chans) - 1 else tuple(scale_factor)
            out_chans = chans[-i - 2] if i < len(chans) - 1 else ch
            block = nn.Module()
            block.up = conv_transpose_nd(nd)(ch, out_chans, kernel_size=up_kernel, stride=up_kernel)
            block.conv = nn.ModuleList(
                [ConvResBlock(nd, out_chans, out_chans, kernel_size) for _ in range(n_blocks)]
            )
            blocks.append(block)
        self.blocks = nn.ModuleList(blocks)

    def forward(self, embeddings):
        embeddings = list(embeddings)
        x = embeddings.pop()
        for block in self.blocks:
            x = block.up(x)
            skip = embeddings.pop()
            if skip is not None:
                x = x + skip
            for conv in block.conv:
                x = conv(x)
        return x


class ConvUNetR(nn.Module):
    """Mirrors cinema_tpu.models.convunetr.ConvUNetR (reference
    convunetr.py:213-485) with the published checkpoint's module names."""

    def __init__(
        self,
        image_size_dict,
        in_chans_dict,
        out_chans,
        enc_patch_size_dict,
        enc_scale_factor_dict,
        enc_conv_chans,
        enc_conv_n_blocks,
        enc_embed_dim,
        enc_depth,
        enc_n_heads,
        dec_chans,
        dec_patch_size_dict,
        dec_scale_factor_dict,
        n_layers_wo_skip,
        n_downsample_layers,
    ):
        super().__init__()
        self.views = list(image_size_dict.keys())
        self.n_layers_wo_skip = n_layers_wo_skip
        self.grid_size_dict = {}

        self.enc_down_dict = nn.ModuleDict()
        for v in self.views:
            self.enc_down_dict[v] = DownsampleEncoder(
                image_size_dict[v],
                in_chans_dict[v],
                enc_patch_size_dict[v],
                enc_scale_factor_dict[v],
                enc_conv_chans,
                enc_conv_n_blocks,
                enc_embed_dim,
            )
            self.grid_size_dict[v] = self.enc_down_dict[v].patch_embed.grid_size
        self.encoder = ViTEncoder(enc_embed_dim, enc_depth, enc_n_heads)

        self.dec_image_conv_block_dict = nn.ModuleDict()
        self.dec_down_blocks_dict = nn.ModuleDict()
        self.dec_conv_blocks_dict = nn.ModuleDict()
        self.decoder_dict = nn.ModuleDict()
        self.pred_head_dict = nn.ModuleDict()
        for v in self.views:
            nd = len(image_size_dict[v])
            self.dec_image_conv_block_dict[v] = ConvResBlock(nd, in_chans_dict[v], dec_chans[0])
            self.dec_down_blocks_dict[v] = nn.ModuleList(
                [
                    conv_nd(nd)(
                        enc_embed_dim,
                        enc_embed_dim,
                        kernel_size=tuple(dec_scale_factor_dict[v]),
                        stride=tuple(dec_scale_factor_dict[v]),
                    )
                    for _ in range(n_downsample_layers)
                ]
            )
            adapters = []
            skip_chans = list(enc_conv_chans) + [enc_embed_dim] * (n_downsample_layers + 1)
            for i, in_ch in enumerate(skip_chans):
                adapters.append(ConvResBlock(nd, in_ch, dec_chans[n_layers_wo_skip + i]))
            self.dec_conv_blocks_dict[v] = nn.ModuleList(adapters)
            self.decoder_dict[v] = UpsampleDecoder(
                nd, dec_chans, dec_patch_size_dict[v], dec_scale_factor_dict[v]
            )
            self.pred_head_dict[v] = conv_nd(nd)(dec_chans[0], out_chans, kernel_size=1)

    def forward(self, image_dict):
        xs, skips, ns = [], [], []
        for v in self.views:
            skips_v, x_v = self.enc_down_dict[v](image_dict[v], None)
            skips.append(skips_v)
            xs.append(x_v)
            ns.append(x_v.shape[1])

        x = self.encoder(torch.cat(xs, dim=1))
        bounds = np.cumsum([1] + ns).tolist()
        xs = [x[:, s:e] for s, e in zip([0] + bounds[:-1], bounds)][1:]  # drop cls

        preds = {}
        for i, v in enumerate(self.views):
            grid = self.grid_size_dict[v]
            batch, _, dim = xs[i].shape
            # tokens are row-major over the grid: (b, n, e) -> (b, e, *grid)
            nd = len(grid)
            x_v = xs[i].reshape(batch, *grid, dim)
            x_v = x_v.permute(0, nd + 1, *range(1, nd + 1)).contiguous()

            skips_v = list(skips[i]) + [x_v]
            for block in self.dec_down_blocks_dict[v]:
                x_v = block(x_v)
                skips_v.append(x_v)

            embeddings = [self.dec_image_conv_block_dict[v](image_dict[v])]
            embeddings += [None] * self.n_layers_wo_skip
            for j, block in enumerate(self.dec_conv_blocks_dict[v]):
                embeddings.append(block(skips_v[j]))

            out = self.decoder_dict[v](embeddings)
            preds[v] = self.pred_head_dict[v](out)
        return preds


# --------------------------------------------------------------- ConvViT
class ConvViT(nn.Module):
    """Mirrors cinema_tpu.models.convvit.ConvViT (reference convvit.py:335-613):
    per-view stems + fusion, shared encoder, per-view + cls heads with
    reduce in {patch, all, cls}."""

    def __init__(
        self,
        image_size_dict,
        in_chans_dict,
        n_frames,
        out_chans,
        enc_patch_size_dict,
        enc_scale_factor_dict,
        enc_conv_chans,
        enc_conv_n_blocks,
        enc_embed_dim,
        enc_depth,
        enc_n_heads,
    ):
        super().__init__()
        self.views = list(image_size_dict.keys())
        self.enc_down_dict = nn.ModuleDict(
            {
                v: DownsampleEncoder(
                    image_size_dict[v],
                    n_frames * in_chans_dict[v],
                    enc_patch_size_dict[v],
                    enc_scale_factor_dict[v],
                    enc_conv_chans,
                    enc_conv_n_blocks,
                    enc_embed_dim,
                )
                for v in self.views
            }
        )
        self.enc_fusion_dict = nn.ModuleDict(
            {
                v: MultiScaleFusion(
                    image_size_dict[v],
                    enc_patch_size_dict[v],
                    enc_scale_factor_dict[v],
                    enc_conv_chans,
                    enc_embed_dim,
                )
                for v in self.views
            }
        )
        self.encoder = ViTEncoder(enc_embed_dim, enc_depth, enc_n_heads)
        self.pred_head_dict = nn.ModuleDict(
            {v: nn.Linear(enc_embed_dim, out_chans) for v in [*self.views, "cls"]}
        )

    def feature_forward(self, image_dict):
        views = list(image_dict.keys())
        xs, ns_patch, skips_view = [], [], {}
        for v in views:
            skips, x = self.enc_down_dict[v](image_dict[v], None)
            ns_patch.append(x.shape[1])
            skips_view[v] = skips
            xs.append(x)
        x = self.encoder(torch.cat(xs, dim=1))
        xs = list(torch.split(x, [1, *ns_patch], dim=1))
        x_dict = dict(zip(["cls", *views], xs))
        for v in views:
            x_dict[v] = self.enc_fusion_dict[v](skips_view[v], x_dict[v], mask=None)
        return x_dict

    def forward(self, image_dict, reduce="all"):
        x_dict = self.feature_forward(image_dict)
        if reduce == "patch":
            logits = torch.cat(
                [self.pred_head_dict[v](x_dict[v].mean(dim=1, keepdim=True)) for v in self.views],
                dim=1,
            )
            return logits.mean(dim=1)
        if reduce == "all":
            logits = torch.cat(
                [self.pred_head_dict[v](x_dict[v].mean(dim=1, keepdim=True)) for v in self.views]
                + [self.pred_head_dict["cls"](x_dict["cls"])],
                dim=1,
            )
            return logits.mean(dim=1)
        if reduce == "cls":
            return self.pred_head_dict["cls"](x_dict["cls"])[:, 0]
        raise NotImplementedError(reduce)


# -------------------------------------------------------------- UNet
def norm_nd(nd, norm, chans):
    if norm == "instance":
        cls = nn.InstanceNorm2d if nd == 2 else nn.InstanceNorm3d
        return cls(chans, eps=1e-6)
    return ConvLayerNorm(chans, eps=1e-6)


class UNetConvResBlock(nn.Module):
    """ConvResBlock with selectable norm (reference conv.py:276-346; the
    ConvUNetR path above hard-codes layer norm)."""

    def __init__(self, nd, in_chans, out_chans, kernel_size=3, norm="instance"):
        super().__init__()
        self.norm1 = norm_nd(nd, norm, in_chans)
        self.norm2 = norm_nd(nd, norm, out_chans)
        self.conv1 = conv_nd(nd)(in_chans, out_chans, kernel_size=kernel_size, padding="same")
        self.conv2 = conv_nd(nd)(out_chans, out_chans, kernel_size=kernel_size, padding="same")
        self.shortcut = (
            conv_nd(nd)(in_chans, out_chans, kernel_size=1) if in_chans != out_chans else nn.Identity()
        )

    def forward(self, x):
        h = self.conv1(F.gelu(self.norm1(x)))
        h = self.conv2(F.gelu(self.norm2(h)))
        return h + self.shortcut(x)


class UNet(nn.Module):
    """Mirrors cinema_tpu.models.unet.UNet (reference segmentation/unet.py:
    12-308): residual encoder recording every block output, decoder with a
    skip add at every res block and end-padding on upsample mismatch."""

    def __init__(self, nd, in_chans, out_chans, chans, patch_size=2, scale_factor=2,
                 kernel_size=3, n_blocks=2, norm="instance"):
        super().__init__()
        self.nd = nd
        chans = tuple(chans)

        def tup(v):
            return (v,) * nd if isinstance(v, int) else tuple(v)

        enc = nn.Module()
        enc.in_conv = nn.Module()
        enc.in_conv.conv = conv_nd(nd)(in_chans, chans[0], kernel_size=kernel_size, padding="same")
        enc.in_conv.norm = norm_nd(nd, norm, chans[0])
        enc.blocks = nn.ModuleList()
        for i, ch in enumerate(chans):
            blk = nn.Module()
            blk.conv = nn.ModuleList(
                [UNetConvResBlock(nd, ch, ch, kernel_size, norm) for _ in range(n_blocks)]
            )
            if i < len(chans) - 1:
                k = tup(patch_size if i == 0 else scale_factor)
                blk.down = conv_nd(nd)(ch, chans[i + 1], kernel_size=k, stride=k)
            enc.blocks.append(blk)
        self.encoder = enc

        dec = nn.Module()
        dec.blocks = nn.ModuleList()
        chans_rev = chans[::-1]
        for i, ch in enumerate(chans_rev):
            blk = nn.Module()
            blk.conv = nn.ModuleList(
                [UNetConvResBlock(nd, ch, ch, kernel_size, norm) for _ in range(n_blocks)]
            )
            if i < len(chans) - 1:
                k = tup(patch_size if i == len(chans) - 2 else scale_factor)
                blk.up = conv_transpose_nd(nd)(ch, chans[-i - 2], kernel_size=k, stride=k)
            dec.blocks.append(blk)
        self.decoder = dec
        self.out_conv = conv_nd(nd)(chans[0], out_chans, kernel_size=1)

    def forward(self, image_dict):
        view = next(iter(image_dict))
        x = image_dict[view]
        x = F.gelu(self.encoder.in_conv.norm(self.encoder.in_conv.conv(x)))
        embeddings = [x]
        for i, blk in enumerate(self.encoder.blocks):
            for conv in blk.conv:
                x = conv(x)
                embeddings.append(x)
            if i < len(self.encoder.blocks) - 1:
                x = blk.down(x)
                embeddings.append(x)
        x = embeddings.pop()
        n = len(self.decoder.blocks)
        for i, blk in enumerate(self.decoder.blocks):
            for conv in blk.conv:
                x = conv(x) + embeddings.pop()
            if i < n - 1:
                x = blk.up(x)
                skipped = embeddings.pop()
                if x.shape != skipped.shape:
                    pad = []
                    for s, t in zip(reversed(skipped.shape), reversed(x.shape)):
                        pad += [0, s - t]
                    x = F.pad(x, pad)
                x = x + skipped
        return {view: self.out_conv(x)}


# ------------------------------------------------------------- ResNet
class ResNetBasicBlock(nn.Module):
    """Mirrors torchvision BasicBlock / reference resnet.py:49-106."""

    def __init__(self, nd, in_planes, planes, stride=1):
        super().__init__()
        self.conv1 = conv_nd(nd)(in_planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn1 = (nn.BatchNorm2d if nd == 2 else nn.BatchNorm3d)(planes)
        self.conv2 = conv_nd(nd)(planes, planes, 3, padding=1, bias=False)
        self.bn2 = (nn.BatchNorm2d if nd == 2 else nn.BatchNorm3d)(planes)
        self.downsample_conv = None
        if in_planes != planes or stride != 1:
            self.downsample_conv = conv_nd(nd)(in_planes, planes, 1, stride=stride, bias=False)
            self.downsample_bn = (nn.BatchNorm2d if nd == 2 else nn.BatchNorm3d)(planes)

    def forward(self, x):
        identity = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample_conv is not None:
            identity = self.downsample_bn(self.downsample_conv(x))
        return F.relu(out + identity)


class ResNet(nn.Module):
    """Mirrors cinema_tpu.models.resnet.ResNet (reference resnet.py
    ResNet2d/ResNet3d, torchvision-style, basic blocks)."""

    def __init__(self, nd, in_chans, out_chans, layers, layer_inplanes):
        super().__init__()
        self.nd = nd
        self.conv1 = conv_nd(nd)(in_chans, layer_inplanes[0], 7, stride=2, padding=3, bias=False)
        self.bn1 = (nn.BatchNorm2d if nd == 2 else nn.BatchNorm3d)(layer_inplanes[0])
        self.maxpool = (nn.MaxPool2d if nd == 2 else nn.MaxPool3d)(3, stride=2, padding=1)
        in_planes = layer_inplanes[0]
        for stage, (n_blocks, planes) in enumerate(zip(layers, layer_inplanes)):
            blocks = []
            for b in range(n_blocks):
                stride = 2 if (stage > 0 and b == 0) else 1
                blocks.append(ResNetBasicBlock(nd, in_planes, planes, stride))
                in_planes = planes
            setattr(self, f"layer{stage + 1}", nn.ModuleList(blocks))
        self.n_stages = len(layers)
        self.fc = nn.Linear(layer_inplanes[-1], out_chans)

    def forward(self, image_dict):
        x = next(iter(image_dict.values()))
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        for stage in range(self.n_stages):
            for block in getattr(self, f"layer{stage + 1}"):
                x = block(x)
        x = x.mean(dim=tuple(range(2, x.ndim)))
        return self.fc(x)
