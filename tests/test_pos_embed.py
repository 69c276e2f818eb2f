"""Tests for sin/cos positional embeddings."""

import jax.numpy as jnp
import numpy as np
import pytest

from cinema_tpu.ops.pos_embed import (
    get_1d_sincos_pos_embed_from_grid,
    get_nd_sincos_pos_embed,
    interpolate_pos_embed,
)


def test_1d_values():
    emb = get_1d_sincos_pos_embed_from_grid(4, np.array([0.0, 1.0]))
    # position 0: sin=0, cos=1
    np.testing.assert_allclose(emb[0], [0.0, 0.0, 1.0, 1.0], atol=1e-6)
    # position 1: omega = [1, 1e-2]
    np.testing.assert_allclose(emb[1], [np.sin(1.0), np.sin(1e-2), np.cos(1.0), np.cos(1e-2)], atol=1e-6)


def test_1d_odd_dim_raises():
    with pytest.raises(ValueError):
        get_1d_sincos_pos_embed_from_grid(3, np.arange(2))


@pytest.mark.parametrize("grid_size,embed_dim", [((4, 6), 16), ((4, 6, 2), 30), ((3, 3, 3), 16)])
def test_nd_shapes_and_padding(grid_size, embed_dim):
    emb = get_nd_sincos_pos_embed(embed_dim, grid_size)
    assert emb.shape == (int(np.prod(grid_size)), embed_dim)
    n = len(grid_size)
    d = (embed_dim // n) - (embed_dim // n) % 2
    pad = embed_dim - d * n
    if pad:
        np.testing.assert_array_equal(emb[:, -pad:], 0.0)


def test_nd_uses_meshgrid_xy():
    """First two axes are swapped by np.meshgrid default 'xy' indexing.

    This quirk is load-bearing for checkpoint compatibility, so pin it.
    """
    emb = get_nd_sincos_pos_embed(8, (2, 3))
    grid = np.stack(np.meshgrid(np.arange(2, dtype=np.float32), np.arange(3, dtype=np.float32)), axis=0)
    want = np.concatenate(
        [get_1d_sincos_pos_embed_from_grid(4, grid[i]) for i in range(2)],
        axis=1,
    )
    np.testing.assert_allclose(emb, want, atol=1e-6)


def test_interpolate_identity():
    emb = get_nd_sincos_pos_embed(16, (4, 4))[None]
    out = interpolate_pos_embed(emb, (4, 4), (4, 4))
    np.testing.assert_array_equal(np.asarray(out), emb)


@pytest.mark.parametrize("src,dst", [((4, 4), (8, 8)), ((4, 4, 2), (6, 6, 2))])
def test_interpolate_resizes(src, dst):
    emb = get_nd_sincos_pos_embed(16, src)
    out = interpolate_pos_embed(emb[None], src, dst)
    assert out.shape == (1, int(np.prod(dst)), 16)
    assert np.isfinite(np.asarray(out)).all()


class TestTorchInterpolationParity:
    """interpolate_pos_embed must match torch F.interpolate exactly
    (reference convvit.py:140-163; round-1 gap: Keys a=-0.5 vs torch a=-0.75)."""

    def test_bicubic_matches_torch(self):
        import torch
        import torch.nn.functional as F

        from cinema_tpu.ops.pos_embed import interpolate_pos_embed

        rng = np.random.default_rng(0)
        src, dst, e = (16, 16), (12, 14), 8
        table = rng.normal(size=(1, src[0] * src[1], e)).astype(np.float32)

        ours = np.asarray(interpolate_pos_embed(jnp.asarray(table), src, dst))

        x = torch.from_numpy(table).reshape(1, *src, e).permute(0, 3, 1, 2)
        ref = F.interpolate(x, size=dst, mode="bicubic", align_corners=False)
        ref = ref.permute(0, 2, 3, 1).reshape(1, dst[0] * dst[1], e).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_trilinear_matches_torch(self):
        import torch
        import torch.nn.functional as F

        from cinema_tpu.ops.pos_embed import interpolate_pos_embed

        rng = np.random.default_rng(1)
        src, dst, e = (12, 12, 4), (9, 15, 3), 6
        table = rng.normal(size=(1, np.prod(src), e)).astype(np.float32)

        ours = np.asarray(interpolate_pos_embed(jnp.asarray(table), src, dst))

        x = torch.from_numpy(table).reshape(1, *src, e).permute(0, 4, 1, 2, 3)
        ref = F.interpolate(x, size=dst, mode="trilinear", align_corners=False)
        ref = ref.permute(0, 2, 3, 4, 1).reshape(1, int(np.prod(dst)), e).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_upscale_bicubic_matches_torch(self):
        import torch
        import torch.nn.functional as F

        from cinema_tpu.ops.pos_embed import interpolate_pos_embed

        rng = np.random.default_rng(2)
        src, dst, e = (8, 8), (16, 18), 4
        table = rng.normal(size=(src[0] * src[1], e)).astype(np.float32)
        ours = np.asarray(interpolate_pos_embed(jnp.asarray(table), src, dst))
        x = torch.from_numpy(table).reshape(1, *src, e).permute(0, 3, 1, 2)
        ref = F.interpolate(x, size=dst, mode="bicubic", align_corners=False)
        ref = ref.permute(0, 2, 3, 1).reshape(1, dst[0] * dst[1], e).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
