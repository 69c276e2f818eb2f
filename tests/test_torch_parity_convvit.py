"""Full-model numerical parity: flax ConvViT vs the plain-torch spec.

Covers every head path users can load (reference convvit.py:335-613):
reduce in {patch, all, cls}, n_frames channel stacking, multi-view.
"""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # full-model tier; fast tier runs -m "not slow"

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cinema_tpu.bridge.torch_loader import params_to_torch_state_dict
from cinema_tpu.models.convvit import ConvViT as FlaxConvViT

import torch_ref

SAX_SIZE = (32, 32, 4)
LAX_SIZE = (32, 32)
ARCH = dict(
    in_chans_dict={"sax": 1, "lax_2c": 1},
    n_frames=2,  # ED+ES stacked as channels (reference classification)
    out_chans=3,
    enc_patch_size_dict={"sax": (4, 4, 1), "lax_2c": (4, 4)},
    enc_scale_factor_dict={"sax": (2, 2, 1), "lax_2c": (2, 2)},
    enc_conv_chans=(8, 16),
    enc_conv_n_blocks=1,
    enc_embed_dim=32,
    enc_depth=2,
    enc_n_heads=2,
)


@pytest.fixture(scope="module")
def convvit_pair():
    views = ("sax", "lax_2c")
    sizes = {"sax": SAX_SIZE, "lax_2c": LAX_SIZE}
    arch = {
        k: ({v: val[v] for v in views} if isinstance(val, dict) else val)
        for k, val in ARCH.items()
    }
    flax_model = FlaxConvViT(image_size_dict={v: sizes[v] for v in views}, **arch)

    rng = np.random.default_rng(0)
    images_np = {
        v: rng.normal(size=(2, *sizes[v], ARCH["n_frames"])).astype(np.float32)
        for v in views
    }
    images = {k: jnp.asarray(v) for k, v in images_np.items()}
    params = flax_model.init(jax.random.PRNGKey(0), images)
    state_dict = params_to_torch_state_dict(params)

    torch_model = torch_ref.ConvViT(image_size_dict={v: sizes[v] for v in views}, **arch)
    missing, unexpected = torch_model.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in state_dict.items()}, strict=False
    )
    assert all("pos_embed" in k for k in missing), missing
    assert not unexpected, unexpected
    torch_model.eval()
    return flax_model, params, torch_model, images_np


@pytest.mark.parametrize("reduce", ["patch", "all", "cls"])
def test_convvit_head_parity(convvit_pair, reduce):
    flax_model, params, torch_model, images_np = convvit_pair
    images = {k: jnp.asarray(v) for k, v in images_np.items()}
    got = flax_model.apply(params, images, reduce=reduce)
    with torch.no_grad():
        torch_in = {v: torch.from_numpy(np.moveaxis(x, -1, 1)) for v, x in images_np.items()}
        want = torch_model(torch_in, reduce=reduce).numpy()
    assert got.shape == (2, ARCH["out_chans"])
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)


def test_convvit_feature_parity(convvit_pair):
    flax_model, params, torch_model, images_np = convvit_pair
    images = {k: jnp.asarray(v) for k, v in images_np.items()}
    got = flax_model.apply(params, images, method="feature_forward")
    with torch.no_grad():
        torch_in = {v: torch.from_numpy(np.moveaxis(x, -1, 1)) for v, x in images_np.items()}
        want = torch_model.feature_forward(torch_in)
    for key in got:
        np.testing.assert_allclose(
            np.asarray(got[key]), want[key].numpy(), atol=2e-4, rtol=2e-4, err_msg=key
        )
