"""Full-model numerical parity: flax CineMA vs the plain-torch reference spec.

The flax params are exported through the checkpoint bridge into a torch
state_dict and loaded into tests/torch_ref.py's CineMA. Same weights, same
fixed masks, same inputs -> outputs must match to float32 tolerance. This is
the offline proxy for the published-checkpoint parity gate.
"""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # full-model tier; fast tier runs -m "not slow"

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cinema_tpu.bridge.torch_loader import params_to_torch_state_dict
from cinema_tpu.models.mae import CineMA as FlaxCineMA
from cinema_tpu.ops.masking import random_patch_mask

import torch_ref

SAX_SIZE = (32, 32, 4)
LAX_SIZE = (32, 32)
VIEWS = ("sax", "lax_2c")
ARCH = dict(
    image_size_dict={"sax": SAX_SIZE, "lax_2c": LAX_SIZE},
    in_chans_dict={"sax": 1, "lax_2c": 1},
    enc_patch_size_dict={"sax": (4, 4, 1), "lax_2c": (4, 4)},
    enc_scale_factor_dict={"sax": (2, 2, 1), "lax_2c": (2, 2)},
    enc_conv_chans=(8, 16),
    enc_conv_n_blocks=2,
    enc_embed_dim=32,
    enc_depth=2,
    enc_n_heads=2,
    dec_embed_dim=16,
    dec_depth=2,
    dec_n_heads=2,
)


@pytest.fixture(scope="module")
def models_and_weights():
    flax_model = FlaxCineMA(**ARCH)
    rng = np.random.default_rng(0)
    images_np = {
        "sax": rng.normal(size=(2, *SAX_SIZE, 1)).astype(np.float32),
        "lax_2c": rng.normal(size=(2, *LAX_SIZE, 1)).astype(np.float32),
    }
    images = {k: jnp.asarray(v) for k, v in images_np.items()}
    params = flax_model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}, images, 0.75
    )
    state_dict = params_to_torch_state_dict(params)

    torch_model = torch_ref.CineMA(**{k: dict(v) if isinstance(v, dict) else v for k, v in ARCH.items()})
    missing, unexpected = torch_model.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in state_dict.items()}, strict=False
    )
    # buffers (pos_embed) are not in the bridge export; nothing else may miss
    assert all("pos_embed" in k for k in missing), missing
    assert not unexpected, unexpected
    torch_model.eval()
    return flax_model, params, torch_model, images_np


def test_downsample_encoder_parity(models_and_weights):
    flax_model, params, torch_model, images_np = models_and_weights
    bound = flax_model.bind(params)
    _, flax_tokens = bound.enc_down_dict["sax"](jnp.asarray(images_np["sax"]), None)
    with torch.no_grad():
        _, torch_tokens = torch_model.enc_down_dict["sax"](
            torch.from_numpy(np.moveaxis(images_np["sax"], -1, 1))
        )
    np.testing.assert_allclose(
        np.asarray(flax_tokens), torch_tokens.numpy(), atol=2e-4, rtol=1e-4
    )


def test_full_mae_forward_parity(models_and_weights):
    flax_model, params, torch_model, images_np = models_and_weights
    # fixed shared masks
    # ViT grids: sax 32x32x4 / eff patch (16,16,1) -> (2,2,4)=16; lax -> (2,2)=4
    masks = {
        v: random_patch_mask(jax.random.PRNGKey(7 + i), 2, n, 0.5)
        for i, (v, n) in enumerate([("sax", 16), ("lax_2c", 4)])
    }
    images = {k: jnp.asarray(v) for k, v in images_np.items()}
    flax_loss, flax_preds, _, _ = flax_model.apply(params, images, 0.75, masks)

    torch_masks = {v: torch.from_numpy(np.asarray(m.bool_mask)) for v, m in masks.items()}
    torch_images = {v: torch.from_numpy(np.moveaxis(images_np[v], -1, 1)) for v in VIEWS}
    with torch.no_grad():
        torch_loss, torch_preds = torch_model(torch_images, torch_masks)

    np.testing.assert_allclose(float(flax_loss), float(torch_loss), rtol=2e-4)
    for v in VIEWS:
        np.testing.assert_allclose(
            np.asarray(flax_preds[v]), torch_preds[v].numpy(), atol=5e-4, rtol=1e-3
        )


def test_feature_forward_parity(models_and_weights):
    """No-mask feature path matches the torch encoder+fusion chain."""
    flax_model, params, torch_model, images_np = models_and_weights
    images = {k: jnp.asarray(v) for k, v in images_np.items()}
    flax_feats = flax_model.apply(params, images, method="feature_forward")

    with torch.no_grad():
        xs, ns, skips = [], [], []
        for v in VIEWS:
            skip, x = torch_model.enc_down_dict[v](
                torch.from_numpy(np.moveaxis(images_np[v], -1, 1))
            )
            skips.append(skip)
            ns.append(x.shape[1])
            xs.append(x)
        x = torch_model.encoder(torch.cat(xs, dim=1))
        parts = list(torch.split(x, [1, *ns], dim=1))
        for i, v in enumerate(VIEWS):
            parts[i + 1] = torch_model.enc_fusion_dict[v](skips[i], parts[i + 1], None)
    np.testing.assert_allclose(
        np.asarray(flax_feats["cls"]), parts[0].numpy(), atol=2e-4, rtol=1e-4
    )
    for i, v in enumerate(VIEWS):
        np.testing.assert_allclose(
            np.asarray(flax_feats[v]), parts[i + 1].numpy(), atol=2e-4, rtol=1e-4
        )
