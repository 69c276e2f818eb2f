"""Tests for the torch checkpoint bridge (naming + layout round-trip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cinema_tpu.bridge.torch_loader import (
    flax_path_to_torch_key,
    load_pretrain_weights,
    load_torch_state_dict,
    loaded_freeze_mask,
    params_to_torch_state_dict,
)
from cinema_tpu.models.convunetr import ConvUNetR
from cinema_tpu.models.convvit import ConvViT
from cinema_tpu.models.mae import CineMA

SAX_SIZE = (32, 32, 4)
LAX_SIZE = (32, 32)


def _tiny_mae(views=("sax", "lax_2c")):
    sizes = {"sax": SAX_SIZE, "lax_2c": LAX_SIZE}
    nd = {v: len(sizes[v]) for v in views}
    return CineMA(
        image_size_dict={v: sizes[v] for v in views},
        in_chans_dict={v: 1 for v in views},
        enc_patch_size_dict={v: (4, 4, 1)[: nd[v]] for v in views},
        enc_scale_factor_dict={v: (2, 2, 1)[: nd[v]] for v in views},
        enc_conv_chans=(8, 16),
        enc_conv_n_blocks=1,
        enc_embed_dim=16,
        enc_depth=2,
        enc_n_heads=2,
        dec_embed_dim=16,
        dec_depth=1,
        dec_n_heads=2,
    )


import functools


@functools.lru_cache(maxsize=2)
def _cached_mae():
    """One shared tiny-MAE init for the whole module: six tests used to pay
    a full init compile each (~80 s of the suite on one core). Callers must
    not mutate the returned trees."""
    mae_model = _tiny_mae()
    mae_params, mae_images = _mae_params(mae_model)
    return mae_model, mae_params, mae_images


def _mae_params(model, views=("sax", "lax_2c")):
    sizes = {"sax": SAX_SIZE, "lax_2c": LAX_SIZE}
    images = {v: jnp.ones((1, *sizes[v], 1)) for v in views}
    return model.init({"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}, images, 0.75), images


def test_expected_torch_key_names():
    """Pin the naming contract against the reference state_dict vocabulary."""
    model, params, _ = _cached_mae()
    sd = params_to_torch_state_dict(params)
    expected = [
        "enc_down_dict.sax.conv_blocks.0.patch_embed.conv.weight",
        "enc_down_dict.sax.conv_blocks.0.patch_embed.norm.weight",
        "enc_down_dict.sax.conv_blocks.0.conv.0.conv1.weight",
        "enc_down_dict.sax.conv_blocks.0.conv.0.dw_conv.weight",
        "enc_down_dict.sax.conv_blocks.0.conv.0.mlp.fc1.weight",
        "enc_down_dict.sax.conv_blocks.0.conv.0.norm1.weight",
        "enc_down_dict.lax_2c.patch_embed.proj.weight",
        "enc_down_dict.lax_2c.linear.weight",
        "enc_fusion_dict.sax.down_convs.0.weight",
        "enc_fusion_dict.sax.norm.weight",
        "encoder.cls_token",
        "encoder.blocks.0.attn.q.weight",
        "encoder.blocks.1.attn.kv.bias",
        "encoder.blocks.0.attn.proj.weight",
        "encoder.blocks.0.mlp.fc1.weight",
        "encoder.blocks.0.norm1.weight",
        "encoder.norm.weight",
        "dec_linear.weight",
        "dec_embed_dict.sax.mask_token",
        "decoder.blocks.0.norm2.bias",
        "decoder.norm.weight",
        "pred_head_dict.sax.weight",
        "pred_head_dict.lax_2c.bias",
    ]
    for key in expected:
        assert key in sd, f"missing {key}; have e.g. {sorted(sd)[:5]}"


def test_linear_weight_layout():
    model, params, _ = _cached_mae()
    sd = params_to_torch_state_dict(params)
    # torch Linear weight is (out, in): q is (dim, dim), kv is (2*dim, dim)
    assert sd["encoder.blocks.0.attn.kv.weight"].shape == (32, 16)
    # conv weight is (out, in, *k)
    assert sd["enc_down_dict.sax.conv_blocks.0.patch_embed.conv.weight"].shape == (8, 1, 4, 4, 1)


def test_round_trip_identity():
    model, params, images = _cached_mae()
    sd = params_to_torch_state_dict(params)
    # zero out the tree, then restore from the torch dict
    zeros = jax.tree.map(jnp.zeros_like, params)
    restored, missing, unused = load_torch_state_dict(zeros, sd, strict=True)
    assert not missing and not unused
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), params, restored
    )
    # restored params give identical forward
    loss0, *_ = model.apply(params, images, 0.75, rngs={"mask": jax.random.PRNGKey(3)})
    loss1, *_ = model.apply(restored, images, 0.75, rngs={"mask": jax.random.PRNGKey(3)})
    assert float(loss0) == float(loss1)


def test_strict_errors():
    model, params, _ = _cached_mae()
    sd = params_to_torch_state_dict(params)
    sd_missing = dict(sd)
    del sd_missing["dec_linear.weight"]
    with pytest.raises(ValueError, match="Missing"):
        load_torch_state_dict(params, sd_missing, strict=True)
    sd_extra = dict(sd)
    sd_extra["decoder.blocks.9.attn.q.weight"] = np.zeros((16, 16), np.float32)
    with pytest.raises(ValueError, match="Unused"):
        load_torch_state_dict(params, sd_extra, strict=True)
    with pytest.raises(ValueError, match="Shape mismatch"):
        bad = dict(sd)
        bad["dec_linear.weight"] = np.zeros((3, 3), np.float32)
        load_torch_state_dict(params, bad, strict=True)


def test_transfer_to_convvit_with_inflation():
    mae, mae_params, _ = _cached_mae()
    sd = params_to_torch_state_dict(mae_params)

    clf = ConvViT(
        image_size_dict={"sax": SAX_SIZE},
        in_chans_dict={"sax": 1},
        n_frames=2,  # ED+ES stacked -> first conv has 2 input chans
        out_chans=3,
        enc_patch_size_dict={"sax": (4, 4, 1)},
        enc_scale_factor_dict={"sax": (2, 2, 1)},
        enc_conv_chans=(8, 16),
        enc_conv_n_blocks=1,
        enc_embed_dim=16,
        enc_depth=2,
        enc_n_heads=2,
    )
    images = {"sax": jnp.ones((1, *SAX_SIZE, 2))}
    clf_params = clf.init(jax.random.PRNGKey(0), images)
    new_params, loaded = load_pretrain_weights(clf_params, "sax", sd, keep_fusion=True)

    # encoder block weights transferred exactly
    np.testing.assert_array_equal(
        np.asarray(new_params["params"]["encoder"]["blocks_0"]["attn"]["q"]["linear"]["kernel"]),
        np.asarray(mae_params["params"]["encoder"]["blocks_0"]["attn"]["q"]["linear"]["kernel"]),
    )
    # first conv kernel inflated from 1 -> 2 input channels by duplication
    got = np.asarray(
        new_params["params"]["enc_down_dict_sax"]["conv_blocks_0_patch_embed"]["conv"]["conv"]["kernel"]
    )
    src = np.asarray(
        mae_params["params"]["enc_down_dict_sax"]["conv_blocks_0_patch_embed"]["conv"]["conv"]["kernel"]
    )
    assert got.shape[-2] == 2
    np.testing.assert_array_equal(got[..., 0, :], src[..., 0, :])
    np.testing.assert_array_equal(got[..., 1, :], src[..., 0, :])
    # forward still works
    logits = clf.apply(new_params, images)
    assert logits.shape == (1, 3)
    # freeze mask marks loaded params
    mask = loaded_freeze_mask(clf_params, loaded)
    assert mask["params"]["encoder"]["blocks_0"]["attn"]["q"]["linear"]["kernel"]
    assert not mask["params"]["pred_head_dict_cls"]["linear"]["kernel"]


def test_transfer_to_convunetr():
    mae, mae_params, _ = _cached_mae()
    sd = params_to_torch_state_dict(mae_params)

    seg = ConvUNetR(
        image_size_dict={"sax": SAX_SIZE},
        in_chans_dict={"sax": 1},
        out_chans=4,
        enc_patch_size_dict={"sax": (4, 4, 1)},
        enc_scale_factor_dict={"sax": (2, 2, 1)},
        enc_conv_chans=(8, 16),
        enc_conv_n_blocks=1,
        enc_embed_dim=16,
        enc_depth=2,
        enc_n_heads=2,
        dec_chans=(4, 8, 16, 24, 32),
        dec_patch_size_dict={"sax": (2, 2, 1)},
        dec_scale_factor_dict={"sax": (2, 2, 1)},
    )
    images = {"sax": jnp.ones((1, *SAX_SIZE, 1))}
    seg_params = seg.init(jax.random.PRNGKey(0), images)
    new_params, _loaded = load_pretrain_weights(seg_params, "sax", sd, keep_fusion=False)
    np.testing.assert_array_equal(
        np.asarray(new_params["params"]["encoder"]["norm"]["scale"]),
        np.asarray(mae_params["params"]["encoder"]["norm"]["scale"]),
    )
    preds = seg.apply(new_params, images)
    assert preds["sax"].shape == (1, *SAX_SIZE, 4)


def test_path_mapping_unknown_leaf():
    assert flax_path_to_torch_key(("encoder", "something_else")) is None
