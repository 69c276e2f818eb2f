"""Full-model numerical parity: flax ConvUNetR vs the plain-torch spec.

Extends the CineMA parity gate (tests/test_torch_parity.py) to the
segmentation decoder: same weights (exported through the bridge), same
inputs -> logits must match to float32 tolerance.
"""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # full-model tier; fast tier runs -m "not slow"

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cinema_tpu.bridge.torch_loader import params_to_torch_state_dict
from cinema_tpu.models.convunetr import ConvUNetR as FlaxConvUNetR
from cinema_tpu.models.convunetr import check_conv_unetr_enc_dec_compatibility

import torch_ref

SAX_SIZE = (32, 32, 4)
LAX_SIZE = (32, 32)
ARCH = dict(
    in_chans_dict={"sax": 1, "lax_2c": 1},
    out_chans=4,
    enc_patch_size_dict={"sax": (4, 4, 1), "lax_2c": (4, 4)},
    enc_scale_factor_dict={"sax": (2, 2, 1), "lax_2c": (2, 2)},
    enc_conv_chans=(8, 16),
    enc_conv_n_blocks=1,
    enc_embed_dim=32,
    enc_depth=2,
    enc_n_heads=2,
    dec_chans=(4, 8, 16, 24, 32),
    dec_patch_size_dict={"sax": (2, 2, 1), "lax_2c": (2, 2)},
    dec_scale_factor_dict={"sax": (2, 2, 1), "lax_2c": (2, 2)},
)


@pytest.mark.parametrize("views", [("sax",), ("sax", "lax_2c")])
def test_convunetr_forward_parity(views):
    sizes = {"sax": SAX_SIZE, "lax_2c": LAX_SIZE}
    arch = {
        k: ({vv: v[vv] for vv in views} if isinstance(v, dict) else v) for k, v in ARCH.items()
    }
    flax_model = FlaxConvUNetR(image_size_dict={v: sizes[v] for v in views}, **arch)

    rng = np.random.default_rng(0)
    images_np = {v: rng.normal(size=(2, *sizes[v], 1)).astype(np.float32) for v in views}
    images = {k: jnp.asarray(v) for k, v in images_np.items()}
    params = flax_model.init(jax.random.PRNGKey(0), images)
    state_dict = params_to_torch_state_dict(params)

    n_wo_skip, n_down = check_conv_unetr_enc_dec_compatibility(
        arch["enc_patch_size_dict"][views[0]],
        arch["enc_scale_factor_dict"][views[0]],
        len(arch["enc_conv_chans"]),
        len(arch["dec_chans"]),
        arch["dec_patch_size_dict"][views[0]],
        arch["dec_scale_factor_dict"][views[0]],
    )
    torch_model = torch_ref.ConvUNetR(
        image_size_dict={v: sizes[v] for v in views},
        n_layers_wo_skip=n_wo_skip,
        n_downsample_layers=n_down,
        **arch,
    )
    missing, unexpected = torch_model.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in state_dict.items()}, strict=False
    )
    assert all("pos_embed" in k for k in missing), missing
    assert not unexpected, unexpected
    torch_model.eval()

    got = flax_model.apply(params, images)
    with torch.no_grad():
        nd = {v: len(sizes[v]) for v in views}
        torch_in = {
            v: torch.from_numpy(np.moveaxis(images_np[v], -1, 1)) for v in views
        }
        want = torch_model(torch_in)
    for v in views:
        want_v = np.moveaxis(want[v].numpy(), 1, -1)
        np.testing.assert_allclose(
            np.asarray(got[v]), want_v, atol=2e-4, rtol=2e-4, err_msg=v
        )
