"""Tests for DownsampleEncoder / MultiScaleFusion / ConvViT."""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # full-model tier; fast tier runs -m "not slow"

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cinema_tpu.models.convvit import (
    ConvViT,
    DownsampleEncoder,
    MultiScaleFusion,
    downsample_stack_sizes,
    get_layer_id_for_vit,
)
from cinema_tpu.ops.masking import full_patch_mask, random_patch_mask

SAX = dict(image_size=(32, 32, 4), patch_size=(4, 4, 1), scale_factor=(2, 2, 1))
LAX = dict(image_size=(32, 32), patch_size=(4, 4), scale_factor=(2, 2))


def test_downsample_stack_sizes():
    conv_sizes, eff, grid = downsample_stack_sizes((192, 192, 16), (4, 4, 1), (2, 2, 1), 2)
    assert conv_sizes == [(48, 48, 16), (24, 24, 16)]
    assert eff == (16, 16, 1)
    assert grid == (12, 12, 16)


@pytest.mark.parametrize("spec", [SAX, LAX], ids=["sax3d", "lax2d"])
@pytest.mark.parametrize("masked", [False, True])
def test_downsample_encoder(spec, masked):
    enc = DownsampleEncoder(
        **{k: tuple(v) for k, v in spec.items()},
        conv_chans=(8, 16),
        conv_n_blocks=2,
        embed_dim=16,
    )
    nd = len(spec["image_size"])
    x = jnp.ones((2, *spec["image_size"], 1))
    n_patches = enc.n_patches
    mask = random_patch_mask(jax.random.PRNGKey(0), 2, n_patches, 0.5) if masked else None
    params = enc.init(jax.random.PRNGKey(0), x, mask)
    skips, tokens = enc.apply(params, x, mask)
    assert len(skips) == 2
    assert skips[0].shape == (2, *(s // p for s, p in zip(spec["image_size"], spec["patch_size"])), 8)
    assert tokens.shape == (2, n_patches, 16)
    assert np.isfinite(np.asarray(tokens)).all()


def test_downsample_encoder_param_names():
    enc = DownsampleEncoder(**SAX, conv_chans=(8,), conv_n_blocks=1, embed_dim=16)
    x = jnp.ones((1, *SAX["image_size"], 1))
    params = enc.init(jax.random.PRNGKey(0), x, None)
    keys = set(params["params"].keys())
    assert "conv_blocks_0_patch_embed" in keys
    assert "conv_blocks_0_conv_0" in keys
    assert "patch_embed" in keys
    assert "linear" in keys


@pytest.mark.parametrize("masked", [False, True])
def test_multi_scale_fusion(masked):
    fusion = MultiScaleFusion(**SAX, conv_chans=(8, 16), embed_dim=16)
    conv_sizes, _, grid = downsample_stack_sizes(SAX["image_size"], SAX["patch_size"], SAX["scale_factor"], 2)
    n_patches = int(np.prod(grid))
    skips = [jnp.ones((2, *conv_sizes[0], 8)), jnp.ones((2, *conv_sizes[1], 16))]
    mask = random_patch_mask(jax.random.PRNGKey(0), 2, n_patches, 0.5) if masked else full_patch_mask(2, n_patches)
    n_tokens = mask.n_keep if masked else n_patches
    x = jnp.ones((2, n_tokens, 16))
    params = fusion.init(jax.random.PRNGKey(0), skips, x, mask if masked else None)
    out = fusion.apply(params, skips, x, mask if masked else None)
    assert out.shape == (2, n_tokens, 16)


def _tiny_convvit(views=("sax", "lax_2c"), **kwargs):
    specs = {"sax": SAX, "lax_2c": LAX, "lax_4c": LAX}
    return ConvViT(
        image_size_dict={v: tuple(specs[v]["image_size"]) for v in views},
        in_chans_dict={v: 1 for v in views},
        n_frames=1,
        out_chans=3,
        enc_patch_size_dict={v: tuple(specs[v]["patch_size"]) for v in views},
        enc_scale_factor_dict={v: tuple(specs[v]["scale_factor"]) for v in views},
        enc_conv_chans=(8, 16),
        enc_conv_n_blocks=1,
        enc_embed_dim=16,
        enc_depth=1,
        enc_n_heads=2,
        **kwargs,
    )


@pytest.mark.parametrize("reduce", ["patch", "all", "cls"])
def test_convvit_forward(reduce):
    model = _tiny_convvit()
    images = {
        "sax": jnp.ones((2, *SAX["image_size"], 1)),
        "lax_2c": jnp.ones((2, *LAX["image_size"], 1)),
    }
    params = model.init(jax.random.PRNGKey(0), images)
    logits = model.apply(params, images, None, reduce)
    assert logits.shape == (2, 3)
    assert np.isfinite(np.asarray(logits)).all()


def test_convvit_feature_forward():
    model = _tiny_convvit(views=("sax",))
    images = {"sax": jnp.ones((2, *SAX["image_size"], 1))}
    params = model.init(jax.random.PRNGKey(0), images)
    feats = model.apply(params, images, method="feature_forward")
    assert feats["cls"].shape == (2, 1, 16)
    n_patches = 2 * 2 * 4
    assert feats["sax"].shape == (2, n_patches, 16)


def test_convvit_rejects_unknown_view():
    model = _tiny_convvit(views=("sax",))
    images = {"sax": jnp.ones((2, *SAX["image_size"], 1))}
    params = model.init(jax.random.PRNGKey(0), images)
    with pytest.raises(ValueError):
        model.apply(params, {"lax_4c": jnp.ones((2, *LAX["image_size"], 1))})


def test_get_layer_id():
    n_layers = 13
    assert get_layer_id_for_vit("enc_down_dict_sax/patch_embed/proj/linear/kernel", n_layers) == 0
    assert get_layer_id_for_vit("encoder/cls_token", n_layers) == 0
    assert get_layer_id_for_vit("encoder/blocks_0/attn/q/linear/kernel", n_layers) == 1
    assert get_layer_id_for_vit("encoder/blocks_11/mlp/fc2/linear/bias", n_layers) == 12
    assert get_layer_id_for_vit("encoder/norm/scale", n_layers) == n_layers
    assert get_layer_id_for_vit("pred_head_dict_cls/linear/kernel", n_layers) == n_layers
