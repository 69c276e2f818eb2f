"""Vision Transformer core (reference: cinema/vit.py), TPU-native.

Differences from the reference by design:

- attention keeps the (batch, tokens, heads, head_dim) layout end to end —
  no permutes around the SDPA call (reference vit.py:498-519);
- PatchEmbed is patchify + one Dense: a single reshape fused into one MXU
  matmul (the reference materialises the patchified tensor);
- gradient checkpointing is a constructor flag (`remat=True`) that wraps
  block bodies with nn.remat instead of mutating module state
  (reference set_grad_ckpt, vit.py:654-659);
- norms compute statistics in float32, activations may be bfloat16.

Checkpoint-compatible naming: blocks_{i}/{norm1,attn,norm2,mlp},
attn/{q,kv,proj}, mlp/{fc1,fc2} mirror the reference module tree so the
torch-safetensors bridge is a pure name/transposition map.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from cinema_tpu.ops.attention import dot_product_attention
from cinema_tpu.ops.patch import patchify
from cinema_tpu.ops.rotary import apply_rotary
from cinema_tpu.models.layers import Dense, DropPath, LayerNorm, gelu, token_init

Dtype = Any


def get_vit_config(size: str) -> dict[str, int]:
    """ViT size presets (reference vit.py:784-831)."""
    configs = {
        "tiny": dict(enc_embed_dim=16, enc_depth=1, enc_n_heads=2, dec_embed_dim=16, dec_depth=1, dec_n_heads=2),
        "base": dict(enc_embed_dim=768, enc_depth=12, enc_n_heads=12, dec_embed_dim=512, dec_depth=8, dec_n_heads=16),
        "large": dict(enc_embed_dim=1024, enc_depth=24, enc_n_heads=16, dec_embed_dim=512, dec_depth=8, dec_n_heads=16),
        "huge": dict(enc_embed_dim=1280, enc_depth=32, enc_n_heads=16, dec_embed_dim=512, dec_depth=8, dec_n_heads=16),
    }
    if size not in configs:
        raise ValueError(f"size must be in ['tiny', 'base', 'large', 'huge'], got {size}.")
    return configs[size]


class PatchEmbed(nn.Module):
    """Image -> patch token embedding: patchify + Dense (reference vit.py:259-344)."""

    image_size: Tuple[int, ...]
    patch_size: Tuple[int, ...]
    embed_dim: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @property
    def grid_size(self) -> Tuple[int, ...]:
        return tuple(s // p for s, p in zip(self.image_size, self.patch_size))

    @property
    def n_patches(self) -> int:
        return math.prod(self.grid_size)

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> jnp.ndarray:
        """(batch, *spatial, chans) -> (batch, n_patches, embed_dim)."""
        spatial = image.shape[1:-1]
        for s, p in zip(spatial, self.patch_size):
            if s % p != 0:
                raise ValueError(f"Input size ({spatial}) should be divisible by patch size ({self.patch_size}).")
        x = patchify(image, self.patch_size)
        return Dense(self.embed_dim, use_bias=self.use_bias, dtype=self.dtype, name="proj")(x)


class Mlp(nn.Module):
    """Transformer MLP: fc1 -> GELU -> drop -> fc2 -> drop (timm Mlp semantics)."""

    hidden_features: int
    out_features: Optional[int] = None
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        out_features = self.out_features or x.shape[-1]
        x = Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = gelu(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = Dense(out_features, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class SwiGLU(nn.Module):
    """SwiGLU MLP (timm SwiGLU semantics): (silu(fc1_g) * fc1_x) -> fc2."""

    hidden_features: int
    out_features: Optional[int] = None
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        out_features = self.out_features or x.shape[-1]
        x_g = Dense(self.hidden_features, dtype=self.dtype, name="fc1_g")(x)
        x_x = Dense(self.hidden_features, dtype=self.dtype, name="fc1_x")(x)
        x = nn.silu(x_g) * x_x
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = Dense(out_features, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


def swiglu_hidden_features(dim: int, mlp_ratio: float) -> int:
    """SwiGLU hidden-size adjustment (reference vit.py:566-569)."""
    hidden = int(dim * mlp_ratio)
    return int(((hidden * 2.0 / 3.0) + 255) // 256 * 256)


class Attention(nn.Module):
    """Self/cross attention with separate q and fused kv projections
    (reference vit.py:446-522)."""

    n_heads: int
    qkv_bias: bool = True
    qk_norm: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    norm_eps: float = 1e-5
    rotary: bool = False
    attn_impl: str = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        q: jnp.ndarray,
        k: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """q: (batch, n_q, dim); k: optional (batch, n_k, dim) for cross-attn."""
        if k is None:
            k = q
        elif self.rotary:
            raise ValueError("Rotary positional embedding is not supported with different query and key.")
        batch, n_q, dim = q.shape
        if dim % self.n_heads != 0:
            raise ValueError(f"dim {dim} should be divisible by n_heads {self.n_heads}")
        head_dim = dim // self.n_heads
        n_k = k.shape[1]

        q = Dense(dim, use_bias=self.qkv_bias, dtype=self.dtype, name="q")(q)
        kv = Dense(dim * 2, use_bias=self.qkv_bias, dtype=self.dtype, name="kv")(k)

        use_dropout = (not deterministic) and self.attn_drop > 0.0
        packed_ok = not (use_dropout or self.qk_norm or self.rotary)
        impl = self.attn_impl
        if impl == "pallas" and not packed_ok:
            # don't silently hand an explicitly requested flash path to the
            # reference XLA path — say which feature forced the fallback
            import warnings

            blockers = [
                name
                for name, on in [
                    ("attn_drop", use_dropout),
                    ("qk_norm", self.qk_norm),
                    ("rotary", self.rotary),
                ]
                if on
            ]
            warnings.warn(
                "attn_impl='pallas' requested but the packed flash layout does "
                f"not support {'/'.join(blockers)}; falling back to the "
                "per-head flash kernel (XLA manual path if dropout is active).",
                stacklevel=2,
            )
        if impl == "auto" and packed_ok:
            import jax

            if jax.default_backend() == "tpu":
                impl = "pallas"
        if impl == "pallas" and packed_ok:
            # packed flash path: no (B, T, H, D) array ever reaches HBM —
            # those are lane-padded up to 4x for head_dim 32 (the decoder)
            # and every reshape/transpose around them repacks the padding
            from cinema_tpu.ops.pallas.flash_attention import flash_attention_packed

            # the fused kv projection orders outputs (2, n_heads, head_dim),
            # so k is the first `dim` columns, v the rest
            x = flash_attention_packed(q, kv[..., :dim], kv[..., dim:], self.n_heads)
        else:
            q = q.reshape(batch, n_q, self.n_heads, head_dim)
            kv = kv.reshape(batch, n_k, 2, self.n_heads, head_dim)
            k, v = kv[:, :, 0], kv[:, :, 1]

            if self.qk_norm:
                q = LayerNorm(epsilon=self.norm_eps, dtype=None, name="q_norm")(q)
                k = LayerNorm(epsilon=self.norm_eps, dtype=None, name="k_norm")(k)
            if self.rotary:
                q, k = apply_rotary(q, k)

            dropout_rng = None
            if use_dropout:
                dropout_rng = self.make_rng("dropout")
            x = dot_product_attention(
                q,
                k,
                v,
                dropout_rate=self.attn_drop,
                deterministic=deterministic,
                dropout_rng=dropout_rng,
                implementation=self.attn_impl,
            )
            x = x.reshape(batch, n_q, dim)
        x = Dense(dim, dtype=self.dtype, name="proj")(x)
        x = nn.Dropout(self.proj_drop)(x, deterministic=deterministic)
        return x


class Block(nn.Module):
    """Pre-norm transformer block (reference vit.py:525-609)."""

    n_heads: int
    mlp_ratio: float = 4
    qkv_bias: bool = True
    qk_norm: bool = False
    norm_eps: float = 1e-5
    drop_path: float = 0.0
    proj_drop: float = 0.0
    attn_drop: float = 0.0
    init_values: Optional[float] = None
    rotary: bool = False
    mlp_type: str = "mlp"  # 'mlp' | 'swiglu'
    attn_impl: str = "auto"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        q: jnp.ndarray,
        k: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        dim = q.shape[-1]
        h = LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm1")(q)
        h = Attention(
            n_heads=self.n_heads,
            qkv_bias=self.qkv_bias,
            qk_norm=self.qk_norm,
            attn_drop=self.attn_drop,
            proj_drop=self.proj_drop,
            norm_eps=self.norm_eps,
            rotary=self.rotary,
            attn_impl=self.attn_impl,
            dtype=self.dtype,
            name="attn",
        )(h, k, deterministic)
        if self.init_values is not None:
            h = h * self.param("ls1_gamma", nn.initializers.constant(self.init_values), (dim,), jnp.float32).astype(
                h.dtype
            )
        q = q + DropPath(self.drop_path, name="drop_path1")(h, deterministic)

        h = LayerNorm(epsilon=self.norm_eps, dtype=self.dtype, name="norm2")(q)
        if self.mlp_type == "swiglu":
            h = SwiGLU(
                hidden_features=swiglu_hidden_features(dim, self.mlp_ratio),
                dropout=self.proj_drop,
                dtype=self.dtype,
                name="mlp",
            )(h, deterministic)
        else:
            h = Mlp(
                hidden_features=int(dim * self.mlp_ratio),
                dropout=self.proj_drop,
                dtype=self.dtype,
                name="mlp",
            )(h, deterministic)
        if self.init_values is not None:
            h = h * self.param("ls2_gamma", nn.initializers.constant(self.init_values), (dim,), jnp.float32).astype(
                h.dtype
            )
        q = q + DropPath(self.drop_path, name="drop_path2")(h, deterministic)
        return q


def _maybe_remat(block_cls: type, remat: bool) -> type:
    if not remat:
        return block_cls
    return nn.remat(block_cls, static_argnums=(3,))  # deterministic is static


def _scanned_blocks_cls(depth: int, remat: bool, block_kwargs: dict) -> type:
    """nn.scan over ``depth`` identical Blocks: ONE traced/compiled block
    body instead of ``depth`` inlined copies (cuts compile time ~linearly
    in depth). Params gain a leading depth axis under ``blocks/block``;
    the bridge unstacks them to the torch per-layer names on export."""
    block_cls = _maybe_remat(Block, remat)

    class BlockStep(nn.Module):
        @nn.compact
        def __call__(self, q, k, deterministic):
            y = block_cls(**block_kwargs, name="block")(q, k, deterministic)
            return y, y

    return nn.scan(
        BlockStep,
        variable_axes={"params": 0},
        split_rngs={"params": True, "dropout": True},
        in_axes=(nn.broadcast, nn.broadcast),
        out_axes=0,
        length=depth,
    )


class ViTEncoder(nn.Module):
    """ViT encoder: prepend cls token, N blocks, final norm (reference vit.py:612-698)."""

    embed_dim: int
    depth: int
    n_heads: int
    mlp_ratio: float = 4
    qkv_bias: bool = True
    norm_eps: float = 1e-5
    rotary: bool = False
    drop_path: float = 0.0
    mlp_type: str = "mlp"
    attn_impl: str = "auto"
    remat: bool = False
    scan_blocks: bool = False
    dtype: Dtype = jnp.float32

    def _block_kwargs(self) -> dict:
        return dict(
            n_heads=self.n_heads,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            norm_eps=self.norm_eps,
            drop_path=self.drop_path,
            rotary=self.rotary,
            mlp_type=self.mlp_type,
            attn_impl=self.attn_impl,
            dtype=self.dtype,
        )

    def setup(self) -> None:
        if self.scan_blocks:
            self.blocks = _scanned_blocks_cls(self.depth, self.remat, self._block_kwargs())()
        else:
            block_cls = _maybe_remat(Block, self.remat)
            self.blocks = [block_cls(**self._block_kwargs()) for _ in range(self.depth)]
        self.norm = LayerNorm(epsilon=self.norm_eps, dtype=self.dtype)
        self.cls_token = self.param("cls_token", token_init, (1, 1, self.embed_dim), jnp.float32)

    def _prepend_cls(self, x: jnp.ndarray) -> jnp.ndarray:
        cls = jnp.broadcast_to(self.cls_token.astype(x.dtype), (x.shape[0], 1, self.embed_dim))
        return jnp.concatenate([cls, x], axis=1)

    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """(batch, n_keep, E) -> (batch, 1 + n_keep, E)."""
        x = self._prepend_cls(x)
        if self.scan_blocks:
            x, _ = self.blocks(x, None, deterministic)
        else:
            for block in self.blocks:
                x = block(x, None, deterministic)
        return self.norm(x)

    def feature_forward(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """All intermediate features, stacked: (batch, 1+n, E, depth).

        The last layer's entry is post-final-norm (reference vit.py:680-698).
        """
        x = self._prepend_cls(x)
        if self.scan_blocks:
            x, ys = self.blocks(x, None, deterministic)
            xs = [ys[i] for i in range(self.depth - 1)]
        else:
            xs = []
            for i, block in enumerate(self.blocks):
                x = block(x, None, deterministic)
                if i != len(self.blocks) - 1:
                    xs.append(x)
        x = self.norm(x)
        xs.append(x)
        return jnp.stack(xs, axis=-1)


class ViTDecoder(nn.Module):
    """ViT decoder with optional CrossMAE-style cross-attention
    (reference vit.py:701-781)."""

    embed_dim: int
    depth: int
    n_heads: int
    mlp_ratio: float = 4
    qkv_bias: bool = True
    norm_eps: float = 1e-5
    rotary: bool = False
    drop_path: float = 0.0
    mlp_type: str = "mlp"
    attn_impl: str = "auto"
    remat: bool = False
    scan_blocks: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x_q: jnp.ndarray,
        x_k: Optional[jnp.ndarray],
        n_enc_masked: int,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Decode and return the trailing ``n_enc_masked`` tokens, normed."""
        if n_enc_masked <= 0:
            # the reference's x[:, -0:, :] silently returns ALL tokens and the
            # downstream masked loss averages 0 elements to NaN — fail loudly
            raise ValueError(
                f"ViTDecoder needs n_enc_masked > 0, got {n_enc_masked} "
                "(is enc_mask_ratio 0?)."
            )
        kwargs = dict(
            n_heads=self.n_heads,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            norm_eps=self.norm_eps,
            drop_path=self.drop_path,
            rotary=self.rotary,
            mlp_type=self.mlp_type,
            attn_impl=self.attn_impl,
            dtype=self.dtype,
        )
        if self.scan_blocks:
            x_q, _ = _scanned_blocks_cls(self.depth, self.remat, kwargs)(name="blocks")(
                x_q, x_k, deterministic
            )
        else:
            block_cls = _maybe_remat(Block, self.remat)
            for i in range(self.depth):
                x_q = block_cls(**kwargs, name=f"blocks_{i}")(x_q, x_k, deterministic)
        x_q = x_q[:, -n_enc_masked:, :]
        # reference uses torch default eps (1e-5) for the decoder norm (vit.py:738)
        return LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x_q)


def get_pos_embed_array(embed_dim: int, grid_size: Sequence[int]) -> jnp.ndarray:
    """Frozen (1, N, E) sincos positional embedding (reference vit.py:426-443)."""
    from cinema_tpu.ops.pos_embed import get_nd_sincos_pos_embed

    return jnp.asarray(get_nd_sincos_pos_embed(embed_dim, tuple(grid_size)))[None]
