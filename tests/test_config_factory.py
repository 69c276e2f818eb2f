"""Tests for the config system and model factories."""

from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

from cinema_tpu.config import apply_overrides, from_dict, load_config, merge, save_config
from cinema_tpu.factory import (
    get_convvit_model,
    get_mae_model,
    get_segmentation_model,
    init_params,
)

CONFIG_DIR = Path(__file__).parent.parent / "cinema_tpu" / "configs"


def test_config_attribute_access_and_overrides():
    cfg = from_dict({"a": {"b": 1}, "c": [1, 2]})
    assert cfg.a.b == 1
    cfg2 = apply_overrides(cfg, ["a.b=5", "d.e=hello", "c=[3,4]"])
    assert cfg2.a.b == 5
    assert cfg2.d.e == "hello"
    assert cfg2.c == [3, 4]
    assert cfg.a.b == 1  # original untouched
    with pytest.raises(ValueError):
        apply_overrides(cfg, ["nonsense"])


def test_config_yaml_round_trip(tmp_path):
    cfg = load_config(CONFIG_DIR / "mae.yaml")
    assert cfg.model.size == "base"
    assert cfg.data.sax.patch_size == [192, 192, 16]
    save_config(cfg, tmp_path / "copy.yaml")
    cfg2 = load_config(tmp_path / "copy.yaml")
    assert cfg2.to_dict() == cfg.to_dict()


def test_merge():
    base = from_dict({"a": {"b": 1, "c": 2}})
    out = merge(base, {"a": {"b": 9}})
    assert out.a.b == 9 and out.a.c == 2


def _tiny_mae_config():
    cfg = load_config(CONFIG_DIR / "mae.yaml")
    return apply_overrides(
        cfg,
        [
            "model.size=tiny",
            "model.enc_conv_chans=[8,16]",
            "model.enc_conv_n_blocks=1",
            "data.sax.patch_size=[32,32,4]",
            "data.lax.patch_size=[32,32]",
            "grad_ckpt=false",
        ],
    )


def test_mae_factory_builds_and_runs():
    cfg = _tiny_mae_config()
    model = get_mae_model(cfg)
    assert model.views == ["sax", "lax_2c", "lax_3c", "lax_4c"]
    params = init_params(model)
    images = {
        v: jnp.ones((1, *model.image_size_dict[v], 1)) for v in model.views
    }
    loss, *_ = model.apply(params, images, 0.75, rngs={"mask": jax.random.PRNGKey(0)})
    assert loss.shape == ()


def test_segmentation_factory():
    cfg = load_config(CONFIG_DIR / "segmentation" / "acdc.yaml")
    cfg = apply_overrides(
        cfg,
        [
            "model.convunetr.size=tiny",
            "model.convunetr.enc_conv_chans=[8,16]",
            "model.convunetr.enc_conv_n_blocks=1",
            "model.convunetr.dec_chans=[4,8,16,24,32]",
            "data.sax.patch_size=[32,32,4]",
            "grad_ckpt=false",
        ],
    )
    model = get_segmentation_model(cfg)
    params = init_params(model)
    preds = model.apply(params, {"sax": jnp.ones((1, 32, 32, 4, 1))})
    assert preds["sax"].shape == (1, 32, 32, 4, 4)

    cfg_unet = apply_overrides(cfg, ["model.name=unet", "model.unet.chans=[4,8]"])
    unet = get_segmentation_model(cfg_unet)
    params = init_params(unet, {"sax": jnp.ones((1, 32, 32, 4, 1))})
    preds = unet.apply(params, {"sax": jnp.ones((1, 32, 32, 4, 1))})
    assert preds["sax"].shape == (1, 32, 32, 4, 4)

    with pytest.raises(ValueError):
        get_segmentation_model(apply_overrides(cfg, ["model.name=bogus"]))


def test_convvit_factory_class_column():
    cfg = load_config(CONFIG_DIR / "segmentation" / "acdc.yaml")
    cfg = apply_overrides(
        cfg,
        [
            "model.n_frames=2",
            "model.convvit.size=tiny",
            "model.convvit.enc_patch_size=[4,4,1]",
            "model.convvit.enc_scale_factor=[2,2,1]",
            "model.convvit.enc_conv_chans=[8,16]",
            "model.convvit.enc_conv_n_blocks=1",
            "model.convvit.drop_path=0.0",
            "data.sax.patch_size=[32,32,4]",
            "data.class_column=pathology",
            "data.pathology=[a,b,c]",
            "grad_ckpt=false",
        ],
    )
    model = get_convvit_model(cfg)
    assert model.out_chans == 3
    params = init_params(model, {"sax": jnp.ones((1, 32, 32, 4, 2))})
    logits = model.apply(params, {"sax": jnp.ones((2, 32, 32, 4, 2))})
    assert logits.shape == (2, 3)
