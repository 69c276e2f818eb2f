"""Full-model numerical parity for the baseline models: UNet and ResNet.

Completes the parity matrix (CineMA, ConvUNetR, ConvViT live in their own
suites): every model class a user can run now has a torch numerical oracle
(reference segmentation/unet.py, resnet.py).
"""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # full-model tier; fast tier runs -m "not slow"

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cinema_tpu.bridge.torch_loader import params_to_torch_state_dict
from cinema_tpu.models.resnet import ResNet as FlaxResNet
from cinema_tpu.models.unet import UNet as FlaxUNet

import torch_ref


@pytest.mark.parametrize("nd,size", [(2, (24, 24)), (3, (16, 16, 6))])
def test_unet_forward_parity(nd, size):
    flax_model = FlaxUNet(n_dims=nd, in_chans=1, out_chans=4, chans=(4, 8, 16))
    rng = np.random.default_rng(0)
    image_np = rng.normal(size=(2, *size, 1)).astype(np.float32)
    images = {"sax": jnp.asarray(image_np)}
    params = flax_model.init(jax.random.PRNGKey(0), images)
    state_dict = params_to_torch_state_dict(params)

    torch_model = torch_ref.UNet(nd=nd, in_chans=1, out_chans=4, chans=(4, 8, 16))
    missing, unexpected = torch_model.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in state_dict.items()}, strict=False
    )
    assert not missing, missing
    assert not unexpected, unexpected
    torch_model.eval()

    got = flax_model.apply(params, images)["sax"]
    with torch.no_grad():
        want = torch_model({"sax": torch.from_numpy(np.moveaxis(image_np, -1, 1))})["sax"]
    want = np.moveaxis(want.numpy(), 1, -1)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)


def test_unet_odd_size_end_padding_parity():
    """Odd spatial size exercises the decoder's end-padding on upsample
    mismatch (reference unet.py:211-218)."""
    flax_model = FlaxUNet(n_dims=2, in_chans=1, out_chans=3, chans=(4, 8))
    rng = np.random.default_rng(1)
    image_np = rng.normal(size=(1, 18, 14, 1)).astype(np.float32)
    images = {"sax": jnp.asarray(image_np)}
    params = flax_model.init(jax.random.PRNGKey(0), images)
    torch_model = torch_ref.UNet(nd=2, in_chans=1, out_chans=3, chans=(4, 8))
    torch_model.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in params_to_torch_state_dict(params).items()},
        strict=False,
    )
    torch_model.eval()
    got = flax_model.apply(params, images)["sax"]
    with torch.no_grad():
        want = torch_model({"sax": torch.from_numpy(np.moveaxis(image_np, -1, 1))})["sax"]
    np.testing.assert_allclose(
        np.asarray(got), np.moveaxis(want.numpy(), 1, -1), atol=2e-4, rtol=2e-4
    )


@pytest.mark.parametrize("nd,size", [(2, (32, 32)), (3, (16, 16, 8))])
def test_resnet_forward_parity(nd, size):
    """ResNet stem/stride-2 padding is torch-EXPLICIT (symmetric), not XLA
    SAME — this is exactly the parity bug class this suite exists for."""
    flax_model = FlaxResNet(out_chans=3, layers=(1, 1), layer_inplanes=(8, 16))
    rng = np.random.default_rng(0)
    image_np = rng.normal(size=(2, *size, 1)).astype(np.float32)
    images = {"sax": jnp.asarray(image_np)}
    variables = flax_model.init(jax.random.PRNGKey(0), images)
    # non-trivial running stats: a few train-mode steps
    for i in range(3):
        x = {"sax": jnp.asarray(rng.normal(size=(2, *size, 1)), jnp.float32)}
        _, updates = flax_model.apply(
            variables, x, deterministic=False, mutable=["batch_stats"]
        )
        variables = {**variables, **updates}
    state_dict = params_to_torch_state_dict(variables)

    torch_model = torch_ref.ResNet(
        nd=nd, in_chans=1, out_chans=3, layers=(1, 1), layer_inplanes=(8, 16)
    )
    missing, unexpected = torch_model.load_state_dict(
        {k: torch.from_numpy(np.array(v)) for k, v in state_dict.items()}, strict=False
    )
    assert all("num_batches_tracked" in k for k in missing), missing
    assert not unexpected, unexpected
    torch_model.eval()

    got = flax_model.apply(variables, images)
    with torch.no_grad():
        want = torch_model({"sax": torch.from_numpy(np.moveaxis(image_np, -1, 1))}).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)
