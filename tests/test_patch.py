"""Tests for patchify/unpatchify (parity with reference vit.py:67-256 semantics)."""

import numpy as np
import pytest

import jax.numpy as jnp

from cinema_tpu.ops.patch import patchify, unpatchify


def _reference_patchify_nchw(image: np.ndarray, patch_size: tuple) -> np.ndarray:
    """Spec of the reference NCHW(D/T) patchify, written with numpy einsum."""
    nd = len(patch_size)
    batch, in_chans, *spatial = image.shape
    grid = [s // p for s, p in zip(spatial, patch_size)]
    shape = [batch, in_chans]
    for g, p in zip(grid, patch_size):
        shape += [g, p]
    x = image.reshape(shape)
    if nd == 2:
        x = np.einsum("nchpwq->nhwpqc", x)
    elif nd == 3:
        x = np.einsum("nchpwqdr->nhwdpqrc", x)
    else:
        x = np.einsum("nchpwqdrts->nhwdtpqrsc", x)
    return x.reshape(batch, int(np.prod(grid)), int(np.prod(patch_size)) * in_chans)


@pytest.mark.parametrize(
    "spatial,patch_size",
    [
        ((8, 12), (2, 3)),
        ((8, 12, 6), (2, 3, 1)),
        ((8, 12, 6, 4), (2, 3, 2, 2)),
    ],
)
@pytest.mark.parametrize("chans", [1, 3])
def test_patchify_matches_reference_ordering(spatial, patch_size, chans):
    rng = np.random.default_rng(0)
    img_nchw = rng.normal(size=(2, chans, *spatial)).astype(np.float32)
    want = _reference_patchify_nchw(img_nchw, patch_size)
    img_cl = np.moveaxis(img_nchw, 1, -1)
    got = np.asarray(patchify(jnp.asarray(img_cl), patch_size))
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


@pytest.mark.parametrize(
    "spatial,patch_size",
    [
        ((8, 12), (2, 3)),
        ((8, 12, 6), (2, 3, 1)),
        ((8, 12, 6, 4), (2, 3, 2, 2)),
    ],
)
def test_patchify_round_trip(spatial, patch_size):
    rng = np.random.default_rng(1)
    chans = 2
    img = jnp.asarray(rng.normal(size=(2, *spatial, chans)).astype(np.float32))
    grid = tuple(s // p for s, p in zip(spatial, patch_size))
    tokens = patchify(img, patch_size)
    back = unpatchify(tokens, patch_size, grid)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(img))


def test_patchify_indivisible_raises():
    img = jnp.zeros((1, 7, 8, 1))
    with pytest.raises(ValueError):
        patchify(img, (2, 2))


def test_unpatchify_bad_grid_raises():
    x = jnp.zeros((1, 6, 8))
    with pytest.raises(ValueError):
        unpatchify(x, (2, 2), (2, 2))
    with pytest.raises(ValueError):
        unpatchify(x, (3, 1), (2, 3))
