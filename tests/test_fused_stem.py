"""Fused MaskedConvBlock kernel parity tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cinema_tpu.models.layers import MaskedConvBlock


@pytest.fixture(autouse=True)
def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def _setup(nd, chans=8, seed=0, with_mask=True):
    rng = np.random.default_rng(seed)
    spatial = (6, 5, 4) if nd == 3 else (7, 6)
    x = jnp.asarray(rng.normal(size=(2, *spatial, chans)).astype(np.float32))
    mask = (
        jnp.asarray((rng.random((2, *spatial)) > 0.5).astype(np.float32)) if with_mask else None
    )
    block = MaskedConvBlock()
    variables = block.init(jax.random.PRNGKey(0), x, mask)
    # perturb params away from init symmetry (biases zero at init)
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.05 * jnp.asarray(rng.normal(size=v.shape), v.dtype), variables
    )
    return x, mask, block, variables


@pytest.mark.parametrize("nd", [2, 3])
@pytest.mark.parametrize("with_mask", [True, False])
def test_fused_forward_matches_module(nd, with_mask):
    from cinema_tpu.ops.pallas.fused_stem import fused_masked_conv_block

    x, mask, block, variables = _setup(nd, with_mask=with_mask)
    want = block.apply(variables, x, mask)
    got = fused_masked_conv_block(x, mask, variables["params"], 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4)


def test_reference_composition_matches_module():
    from cinema_tpu.ops.pallas.fused_stem import reference_masked_conv_block

    x, mask, block, variables = _setup(3)
    want = block.apply(variables, x, mask)
    got = reference_masked_conv_block(x, mask, variables["params"], 1e-6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_fused_gradients_match_module():
    from cinema_tpu.ops.pallas.fused_stem import fused_masked_conv_block

    x, mask, block, variables = _setup(3)

    def loss_mod(params, xx):
        return jnp.sum(block.apply({"params": params}, xx, mask) ** 2)

    def loss_fused(params, xx):
        return jnp.sum(fused_masked_conv_block(xx, mask, params, 1e-6) ** 2)

    gm_p, gm_x = jax.grad(loss_mod, argnums=(0, 1))(variables["params"], x)
    gf_p, gf_x = jax.grad(loss_fused, argnums=(0, 1))(variables["params"], x)
    np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gm_x), atol=3e-4, rtol=3e-4)
    flat_f = {str(k): v for k, v in jax.tree_util.tree_flatten_with_path(gf_p)[0]}
    flat_m = {str(k): v for k, v in jax.tree_util.tree_flatten_with_path(gm_p)[0]}
    assert set(flat_f) == set(flat_m)
    for key in sorted(flat_f):
        np.testing.assert_allclose(
            np.asarray(flat_f[key]), np.asarray(flat_m[key]), atol=3e-4, rtol=3e-4, err_msg=key
        )


def test_fused_bf16_finite():
    from cinema_tpu.ops.pallas.fused_stem import fused_masked_conv_block

    x, mask, block, variables = _setup(3)
    out = fused_masked_conv_block(x.astype(jnp.bfloat16), mask, variables["params"], 1e-6)
    assert out.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
