"""Tests for ConvUNetR, UNet, and ResNet baselines."""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # full-model tier; fast tier runs -m "not slow"

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cinema_tpu.models.convunetr import (
    ConvUNetR,
    UpsampleDecoder,
    check_conv_unetr_enc_dec_compatibility,
)
from cinema_tpu.models.resnet import ResNet, get_resnet
from cinema_tpu.models.unet import UNet


def test_compat_check_acdc_geometry():
    """ACDC config geometry (reference segmentation/acdc/config.yaml:56-64)."""
    n_wo_skip, n_down = check_conv_unetr_enc_dec_compatibility(
        enc_patch_size=(4, 4, 1),
        enc_scale_factor=(2, 2, 1),
        enc_n_conv_layers=2,
        dec_depth=5,
        dec_patch_size=(2, 2, 1),
        dec_scale_factor=(2, 2, 1),
    )
    # dec_factor hits enc_patch (4,4,1) after 1 dec layer and enc_factor
    # (16,16,1) at layer 3 of 5 -> one extra downsample level below the grid
    assert (n_wo_skip, n_down) == (1, 1)


def test_compat_check_errors():
    with pytest.raises(ValueError):
        check_conv_unetr_enc_dec_compatibility((4, 4), (2, 2), 5, 5, (2, 2), (2, 2))
    with pytest.raises(ValueError):
        check_conv_unetr_enc_dec_compatibility((1, 1), (2, 2), 1, 5, (2, 2), (2, 2))
    with pytest.raises(ValueError):
        check_conv_unetr_enc_dec_compatibility((3, 3), (2, 2), 1, 5, (2, 2), (2, 2))


def test_upsample_decoder():
    dec = UpsampleDecoder(chans=(4, 8, 16), patch_size=(2, 2), scale_factor=(2, 2))
    embeddings = [
        jnp.ones((2, 32, 32, 4)),  # finest skip (after the patch-size up)
        jnp.ones((2, 16, 16, 4)),
        jnp.ones((2, 8, 8, 8)),
        jnp.ones((2, 4, 4, 16)),  # coarsest, popped first
    ]
    params = dec.init(jax.random.PRNGKey(0), embeddings)
    out = dec.apply(params, embeddings)
    assert out.shape == (2, 32, 32, 4)


@pytest.mark.parametrize("z", [4, 8])
def test_upsample_decoder_folded_levels_match_dense(z, monkeypatch):
    """3D levels that z-fold (C<=48, z*C>=128) must match the dense path
    bit-for-bit-ish: same params, CINEMA_TPU_ZFOLD toggles the layout.
    z=8 additionally exercises the segmented band (z divisible by the
    default z_seg=4) through the whole folded chain incl. 1x1 convs."""
    dec = UpsampleDecoder(chans=(32, 48), patch_size=(2, 2, 1), scale_factor=(2, 2, 1))
    rng = np.random.default_rng(0)
    embeddings = [
        jnp.asarray(rng.normal(size=(2, 16, 16, z, 32)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(2, 8, 8, z, 32)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(2, 4, 4, z, 48)).astype(np.float32)),
    ]
    params = dec.init(jax.random.PRNGKey(0), embeddings)
    out_folded = dec.apply(params, embeddings)
    monkeypatch.setenv("CINEMA_TPU_ZFOLD", "0")
    out_dense = dec.apply(params, embeddings)
    assert out_folded.shape == (2, 16, 16, z, 32)
    np.testing.assert_allclose(
        np.asarray(out_folded), np.asarray(out_dense), rtol=1e-4, atol=1e-4
    )


def _tiny_convunetr(views=("sax",)):
    sizes = {"sax": (32, 32, 4), "lax_2c": (32, 32)}
    nd = {v: len(sizes[v]) for v in views}
    return ConvUNetR(
        image_size_dict={v: sizes[v] for v in views},
        in_chans_dict={v: 1 for v in views},
        out_chans=4,
        enc_patch_size_dict={v: (4, 4, 1)[: nd[v]] for v in views},
        enc_scale_factor_dict={v: (2, 2, 1)[: nd[v]] for v in views},
        enc_conv_chans=(8, 16),
        enc_conv_n_blocks=1,
        enc_embed_dim=16,
        enc_depth=1,
        enc_n_heads=2,
        dec_chans=(4, 8, 16, 24, 32),
        dec_patch_size_dict={v: (2, 2, 1)[: nd[v]] for v in views},
        dec_scale_factor_dict={v: (2, 2, 1)[: nd[v]] for v in views},
    )


@pytest.mark.parametrize("views", [("sax",), ("lax_2c",), ("sax", "lax_2c")])
def test_convunetr_forward(views):
    sizes = {"sax": (32, 32, 4), "lax_2c": (32, 32)}
    model = _tiny_convunetr(views)
    images = {v: jnp.ones((2, *sizes[v], 1)) for v in views}
    params = model.init(jax.random.PRNGKey(0), images)
    preds = model.apply(params, images)
    for v in views:
        assert preds[v].shape == (2, *sizes[v], 4)
        assert np.isfinite(np.asarray(preds[v])).all()


@pytest.mark.parametrize("views", [("sax",), ("lax_2c",), ("sax", "lax_2c")])
def test_convunetr_predict_labels_matches_argmax(views):
    """predict_labels (z-folded class-major head + fused argmax) must equal
    argmax over the dense logits, including first-max tie semantics."""
    sizes = {"sax": (32, 32, 4), "lax_2c": (32, 32)}
    model = _tiny_convunetr(views)
    rng = np.random.default_rng(0)
    images = {v: jnp.asarray(rng.normal(size=(2, *sizes[v], 1)).astype(np.float32)) for v in views}
    params = model.init(jax.random.PRNGKey(0), images)
    labels = model.apply(params, images, method=model.predict_labels)
    logits = model.apply(params, images)
    for v in views:
        assert labels[v].dtype == jnp.uint8
        np.testing.assert_array_equal(
            np.asarray(labels[v]), np.argmax(np.asarray(logits[v]), axis=-1)
        )


def test_convunetr_shares_encoder_params():
    model = _tiny_convunetr(("sax", "lax_2c"))
    images = {"sax": jnp.ones((1, 32, 32, 4, 1)), "lax_2c": jnp.ones((1, 32, 32, 1))}
    params = model.init(jax.random.PRNGKey(0), images)
    keys = set(params["params"].keys())
    assert "encoder" in keys  # one shared trunk
    assert "enc_down_dict_sax" in keys and "enc_down_dict_lax_2c" in keys


@pytest.mark.parametrize("n_dims", [2, 3])
def test_unet_forward(n_dims):
    size = (32, 32) if n_dims == 2 else (32, 32, 4)
    model = UNet(
        n_dims=n_dims,
        in_chans=1,
        out_chans=4,
        chans=(4, 8, 16),
        patch_size=(2, 2, 1)[:n_dims],
        scale_factor=(2, 2, 1)[:n_dims],
    )
    images = {"sax": jnp.ones((2, *size, 1))}
    params = model.init(jax.random.PRNGKey(0), images)
    preds = model.apply(params, images)
    assert preds["sax"].shape == (2, *size, 4)
    assert np.isfinite(np.asarray(preds["sax"])).all()


def test_unet_rejects_multi_view():
    model = UNet(n_dims=2, in_chans=1, out_chans=2, chans=(4, 8))
    images = {"a": jnp.ones((1, 16, 16, 1)), "b": jnp.ones((1, 16, 16, 1))}
    with pytest.raises(ValueError):
        model.init(jax.random.PRNGKey(0), images)


@pytest.mark.parametrize("nd", [2, 3])
def test_resnet_forward(nd):
    size = (32, 32) if nd == 2 else (32, 32, 8)
    model = get_resnet("resnet10", out_chans=3)
    images = {"sax": jnp.ones((2, *size, 2))}
    params = model.init(jax.random.PRNGKey(0), images)
    logits = model.apply(params, images)
    assert logits.shape == (2, 3)


def test_resnet_bottleneck_and_train_mode():
    model = ResNet(out_chans=2, layers=(1, 1, 1, 1), layer_inplanes=(4, 8, 8, 8), bottleneck=True)
    images = {"sax": jnp.ones((2, 32, 32, 1))}
    variables = model.init(jax.random.PRNGKey(0), images)
    assert "batch_stats" in variables
    logits, updates = model.apply(variables, images, deterministic=False, mutable=["batch_stats"])
    assert logits.shape == (2, 2)
    assert "batch_stats" in updates


def test_resnet_train_step_updates_batch_stats():
    """Two supervised train steps must update params AND BatchNorm running
    stats (round-1 regression: batch_stats were never threaded through the
    train step; reference trains ResNet baselines first-class,
    classification/train.py:25-81)."""
    import numpy as np

    from cinema_tpu.tasks.classification import classification_loss_fn
    from cinema_tpu.train.optim import build_optimizer
    from cinema_tpu.train.state import make_supervised_train_step, make_train_state

    model = ResNet(out_chans=2, layers=(1, 1, 1, 1), layer_inplanes=(4, 4, 4, 4))
    rng = np.random.default_rng(0)
    batch = {
        "sax_image": jnp.asarray(rng.normal(size=(2, 32, 32, 2)).astype(np.float32)),
        "label": jnp.asarray([0, 1]),
    }

    def init_fn():
        return model.init(jax.random.PRNGKey(0), {"sax": batch["sax_image"]})

    tx = build_optimizer(
        jax.eval_shape(init_fn), lr=1e-2, min_lr=1e-6, warmup_steps=0, max_n_steps=10
    )
    state, _ = make_train_state(init_fn, tx)
    assert "batch_stats" in state.params
    stats0 = jax.tree_util.tree_map(lambda x: x.copy(), state.params["batch_stats"])
    step = make_supervised_train_step(model, tx, classification_loss_fn, donate=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert jnp.isfinite(metrics["loss"])
    assert int(state.step) == 2
    changed = jax.tree_util.tree_map(
        lambda a, b: bool(jnp.any(a != b)), stats0, state.params["batch_stats"]
    )
    assert any(jax.tree_util.tree_leaves(changed)), "running stats never updated"


def test_get_resnet_unknown():
    with pytest.raises(ValueError):
        get_resnet("resnet1000", out_chans=1)
