"""Tests for static-shape MAE masking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cinema_tpu.ops.masking import (
    full_patch_mask,
    gather_tokens,
    random_patch_mask,
    upsample_mask,
    visible_grid_mask,
)


@pytest.mark.parametrize("mask_ratio", [0.0, 0.25, 0.5, 0.75])
def test_mask_counts_exact(mask_ratio):
    n_patches = 20
    mask = random_patch_mask(jax.random.PRNGKey(0), 4, n_patches, mask_ratio)
    n_keep = int(n_patches * (1 - mask_ratio))
    assert mask.keep_ids.shape == (4, n_keep)
    assert mask.mask_ids.shape == (4, n_patches - n_keep)
    np.testing.assert_array_equal(np.asarray((~mask.bool_mask).sum(axis=1)), n_keep)


def test_ids_sorted_and_disjoint():
    mask = random_patch_mask(jax.random.PRNGKey(1), 3, 16, 0.5)
    keep = np.asarray(mask.keep_ids)
    masked = np.asarray(mask.mask_ids)
    assert (np.diff(keep, axis=1) > 0).all()
    assert (np.diff(masked, axis=1) > 0).all()
    for b in range(3):
        union = np.union1d(keep[b], masked[b])
        np.testing.assert_array_equal(union, np.arange(16))


def test_bool_mask_consistent_with_ids():
    mask = random_patch_mask(jax.random.PRNGKey(2), 2, 12, 0.25)
    bm = np.asarray(mask.bool_mask)
    for b in range(2):
        np.testing.assert_array_equal(np.where(~bm[b])[0], np.asarray(mask.keep_ids[b]))
        np.testing.assert_array_equal(np.where(bm[b])[0], np.asarray(mask.mask_ids[b]))


def test_gather_matches_boolean_indexing():
    """Gather by sorted ids == torch-style x[~mask] in original order."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 10, 4)).astype(np.float32)
    mask = random_patch_mask(jax.random.PRNGKey(3), 2, 10, 0.5)
    got = np.asarray(gather_tokens(jnp.asarray(x), mask.keep_ids))
    bm = np.asarray(mask.bool_mask)
    want = np.stack([x[b][~bm[b]] for b in range(2)])
    np.testing.assert_array_equal(got, want)


def test_gather_broadcasts_2d():
    x = jnp.arange(12.0).reshape(6, 2)
    ids = jnp.array([[0, 2], [1, 3]], dtype=jnp.int32)
    out = np.asarray(gather_tokens(x, ids))
    np.testing.assert_array_equal(out[0], np.asarray(x)[[0, 2]])
    np.testing.assert_array_equal(out[1], np.asarray(x)[[1, 3]])


def test_full_mask():
    mask = full_patch_mask(2, 5)
    assert mask.n_masked == 0
    np.testing.assert_array_equal(np.asarray(mask.keep_ids), np.tile(np.arange(5), (2, 1)))


def test_upsample_mask_nearest():
    mask = jnp.array([[[1, 0], [0, 1]]], dtype=bool)
    up = np.asarray(upsample_mask(mask, (2, 2)))
    want = np.array(
        [[[1, 1, 0, 0], [1, 1, 0, 0], [0, 0, 1, 1], [0, 0, 1, 1]]],
        dtype=bool,
    )
    np.testing.assert_array_equal(up, want)


def test_visible_grid_mask():
    mask = random_patch_mask(jax.random.PRNGKey(4), 2, 6, 0.5)
    vis = visible_grid_mask(mask, grid_size=(2, 3), scale_factor=(2, 2))
    assert vis.shape == (2, 4, 6)
    np.testing.assert_array_equal(
        np.asarray(vis[:, ::2, ::2].reshape(2, 6)),
        ~np.asarray(mask.bool_mask),
    )


def test_mask_jit_static_shapes():
    @jax.jit
    def fn(key):
        m = random_patch_mask(key, 2, 16, 0.75)
        return m.keep_ids

    out = fn(jax.random.PRNGKey(0))
    assert out.shape == (2, 4)


def test_mask_ratio_validation():
    """Out-of-range ratios raise instead of silently mis-masking
    (ratio 1.5 used to behave like 0.5 via a negative keep-count)."""
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        random_patch_mask(jax.random.PRNGKey(0), 2, 8, 1.5)
    with pytest.raises(ValueError, match=r"\[0, 1\]"):
        random_patch_mask(jax.random.PRNGKey(0), 2, 8, -0.1)
    # boundary values stay valid
    m0 = random_patch_mask(jax.random.PRNGKey(0), 2, 8, 0.0)
    assert m0.mask_ids.shape[1] == 0
