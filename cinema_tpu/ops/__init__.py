"""TPU-native tensor ops: patchify, positional embeddings, masking, attention."""

from cinema_tpu.ops.masking import (
    PatchMask,
    full_patch_mask,
    gather_tokens,
    random_patch_mask,
    upsample_mask,
)
from cinema_tpu.ops.patch import patchify, unpatchify
from cinema_tpu.ops.pos_embed import (
    get_1d_sincos_pos_embed_from_grid,
    get_nd_sincos_pos_embed,
    get_nd_sincos_pos_embed_from_grid,
    interpolate_pos_embed,
)

__all__ = [
    "PatchMask",
    "full_patch_mask",
    "gather_tokens",
    "random_patch_mask",
    "upsample_mask",
    "patchify",
    "unpatchify",
    "get_1d_sincos_pos_embed_from_grid",
    "get_nd_sincos_pos_embed",
    "get_nd_sincos_pos_embed_from_grid",
    "interpolate_pos_embed",
]
