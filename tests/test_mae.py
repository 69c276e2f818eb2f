"""Tests for the CineMA masked autoencoder."""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # full-model tier; fast tier runs -m "not slow"

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cinema_tpu.models.mae import CineMA, get_decoder_patch_size, mse_loss
from cinema_tpu.ops.masking import random_patch_mask

SAX_SIZE = (32, 32, 4)
LAX_SIZE = (32, 32)


def _tiny_mae(views=("sax", "lax_2c", "lax_3c", "lax_4c"), **kwargs):
    sizes = {"sax": SAX_SIZE, "lax_2c": LAX_SIZE, "lax_3c": LAX_SIZE, "lax_4c": LAX_SIZE}
    patch = {"sax": (4, 4, 1), "lax_2c": (4, 4), "lax_3c": (4, 4), "lax_4c": (4, 4)}
    scale = {"sax": (2, 2, 1), "lax_2c": (2, 2), "lax_3c": (2, 2), "lax_4c": (2, 2)}
    return CineMA(
        image_size_dict={v: sizes[v] for v in views},
        in_chans_dict={v: 1 for v in views},
        enc_patch_size_dict={v: patch[v] for v in views},
        enc_scale_factor_dict={v: scale[v] for v in views},
        enc_conv_chans=(8, 16),
        enc_conv_n_blocks=1,
        enc_embed_dim=16,
        enc_depth=1,
        enc_n_heads=2,
        dec_embed_dim=16,
        dec_depth=1,
        dec_n_heads=2,
        **kwargs,
    )


def _images(views, batch=2):
    sizes = {"sax": SAX_SIZE, "lax_2c": LAX_SIZE, "lax_3c": LAX_SIZE, "lax_4c": LAX_SIZE}
    rng = np.random.default_rng(0)
    return {
        v: jnp.asarray(rng.normal(size=(batch, *sizes[v], 1)).astype(np.float32)) for v in views
    }


def test_get_decoder_patch_size():
    assert get_decoder_patch_size((192, 192, 16), 2, (4, 4, 1), (2, 2, 1)) == (16, 16, 1)
    assert get_decoder_patch_size((256, 256), 2, (4, 4), (2, 2)) == (16, 16)


@pytest.mark.parametrize("cross_attn", [True, False])
@pytest.mark.parametrize("norm_target", [True, False])
def test_mae_forward(cross_attn, norm_target):
    views = ("sax", "lax_2c")
    model = _tiny_mae(views, cross_attn=cross_attn, norm_target=norm_target)
    images = _images(views)
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}
    params = model.init(rngs, images, 0.75)
    loss, preds, masks, metrics = model.apply(
        params, images, 0.75, rngs={"mask": jax.random.PRNGKey(2)}
    )
    assert np.isfinite(float(loss))
    for view in views:
        n_patches = masks[view].n_patches
        n_masked = masks[view].n_masked
        assert n_masked == n_patches - int(n_patches * 0.25)
        dec_patch = model.dec_patch_size(view)
        assert preds[view].shape == (2, n_masked, int(np.prod(dec_patch)))
        assert np.isfinite(np.asarray(preds[view])).all()
    assert "loss" in metrics and "sax_mse_loss" in metrics


def test_mae_forward_full_four_views():
    views = ("sax", "lax_2c", "lax_3c", "lax_4c")
    model = _tiny_mae(views)
    images = _images(views)
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}
    params = model.init(rngs, images, 0.75)
    loss, preds, masks, _ = model.apply(params, images, 0.75, rngs={"mask": jax.random.PRNGKey(2)})
    assert np.isfinite(float(loss))
    assert set(preds) == set(views)


def test_mae_deterministic_given_mask():
    views = ("sax",)
    model = _tiny_mae(views)
    images = _images(views)
    mask = {"sax": random_patch_mask(jax.random.PRNGKey(5), 2, 2 * 2 * 4, 0.5)}
    params = model.init({"params": jax.random.PRNGKey(0)}, images, 0.5, mask)
    l1, p1, _, _ = model.apply(params, images, 0.5, mask)
    l2, p2, _, _ = model.apply(params, images, 0.5, mask)
    np.testing.assert_array_equal(np.asarray(p1["sax"]), np.asarray(p2["sax"]))
    assert float(l1) == float(l2)


def test_mae_feature_forward():
    views = ("sax", "lax_2c")
    model = _tiny_mae(views)
    images = _images(views)
    params = model.init({"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}, images, 0.75)
    feats = model.apply(params, images, method="feature_forward")
    assert feats["cls"].shape == (2, 1, 16)
    assert feats["sax"].shape == (2, 16, 16)  # grid 2*2*4
    assert feats["lax_2c"].shape == (2, 4, 16)  # grid 2*2


def test_mae_loss_gradient_flows():
    views = ("sax",)
    model = _tiny_mae(views)
    images = _images(views)
    mask = {"sax": random_patch_mask(jax.random.PRNGKey(5), 2, 16, 0.5)}
    params = model.init({"params": jax.random.PRNGKey(0)}, images, 0.5, mask)

    def loss_fn(p):
        loss, *_ = model.apply(p, images, 0.5, mask)
        return loss

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    total = sum(float(jnp.sum(jnp.abs(x))) for x in leaves)
    assert np.isfinite(total) and total > 0


def test_mse_loss_masked_only():
    """Loss only depends on masked patches."""
    rng = np.random.default_rng(0)
    target = jnp.asarray(rng.normal(size=(2, 8, 4)).astype(np.float32))
    mask = random_patch_mask(jax.random.PRNGKey(0), 2, 8, 0.5)
    pred = jnp.asarray(rng.normal(size=(2, 4, 4)).astype(np.float32))
    loss1, _ = mse_loss(target, pred, mask, norm_target=False)
    # perturb only the visible patches: loss unchanged
    perturbed = np.asarray(target).copy()
    keep = np.asarray(mask.keep_ids)
    for b in range(2):
        perturbed[b, keep[b]] += 100.0
    loss2, _ = mse_loss(jnp.asarray(perturbed), pred, mask, norm_target=False)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    # perfect prediction -> zero loss
    gathered = jnp.take_along_axis(target, mask.mask_ids[..., None], axis=1)
    loss3, _ = mse_loss(target, gathered, mask, norm_target=False)
    assert float(loss3) == 0.0


def test_mse_loss_norm_target_matches_torch():
    """norm_target normalisation must match the reference bit-for-bit —
    incl. torch.Tensor.var's default correction=1 (reference mae.py:130)."""
    import torch

    rng = np.random.default_rng(3)
    target = rng.normal(size=(2, 8, 6)).astype(np.float32)
    pred = rng.normal(size=(2, 4, 6)).astype(np.float32)
    mask = random_patch_mask(jax.random.PRNGKey(2), 2, 8, 0.5)
    eps = 1.0e-6

    loss, metrics = mse_loss(
        jnp.asarray(target), jnp.asarray(pred), mask, norm_target=True, epsilon=eps
    )

    t = torch.from_numpy(target)
    mean = t.mean(dim=-1, keepdim=True)
    std = t.var(dim=-1, keepdim=True) ** 0.5  # unbiased (correction=1)
    normed = (t - mean) / (std + eps)
    gathered = torch.take_along_dim(
        normed, torch.from_numpy(np.asarray(mask.mask_ids)).long()[..., None], dim=1
    )
    want = torch.nn.functional.mse_loss(torch.from_numpy(pred), gathered)
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-6)
    np.testing.assert_allclose(
        float(metrics["target_std"]), float(std.mean()), rtol=1e-6
    )


def test_mae_jit_end_to_end():
    views = ("sax", "lax_2c")
    model = _tiny_mae(views)
    images = _images(views)
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}
    params = model.init(rngs, images, 0.75)

    @jax.jit
    def step(p, imgs, key):
        loss, _, _, metrics = model.apply(p, imgs, 0.75, rngs={"mask": key})
        return loss, metrics

    l1, _ = step(params, images, jax.random.PRNGKey(2))
    l2, _ = step(params, images, jax.random.PRNGKey(3))
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l1) != float(l2)  # different masks
