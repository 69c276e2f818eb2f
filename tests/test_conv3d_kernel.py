"""Pallas K-folded conv3 kernel: parity with lax.conv (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from cinema_tpu.ops.pallas import conv3d


def _ref(x, w):
    return conv3d._xla_conv(x, w)


@pytest.mark.parametrize(
    "shape,cout",
    [
        ((2, 6, 8, 8, 16), 16),   # 3D, P=64
        ((1, 5, 16, 8, 32), 24),  # 3D, P=128, cin != cout
        ((2, 4, 16, 1, 16), 16),  # 3D with Z=1 (both z-neighbors padded)
        ((2, 7, 128, 16), 16),    # 2D, P=128
    ],
)
def test_conv3_matches_lax_conv(shape, cout):
    rng = np.random.default_rng(0)
    cin = shape[-1]
    nd = len(shape) - 2
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(*(3,) * nd, cin, cout)).astype(np.float32) * 0.2)
    with pltpu.force_tpu_interpret_mode():
        got = conv3d.conv3_same(x, w)
    want = _ref(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_conv3_gradients_match():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 4, 8, 8, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 16, 16)).astype(np.float32) * 0.2)

    def loss_pallas(x, w):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(conv3d.conv3_same(x, w) ** 2)

    def loss_ref(x, w):
        return jnp.sum(_ref(x, w) ** 2)

    gx, gw = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=1e-4, atol=1e-4)


def test_supported_gates():
    ok = conv3d.supported((8, 192, 192, 16, 32), (3, 3, 3), None, "SAME", 1)
    assert ok
    # strided, grouped, VALID, non-3 kernels, wrong chans, tiny P all fall back
    assert not conv3d.supported((8, 192, 192, 16, 32), (3, 3, 3), (2, 2, 2), "SAME", 1)
    assert not conv3d.supported((8, 192, 192, 16, 32), (3, 3, 3), None, "SAME", 32)
    assert not conv3d.supported((8, 192, 192, 16, 32), (3, 3, 3), None, "VALID", 1)
    assert not conv3d.supported((8, 192, 192, 16, 32), (5, 5, 5), None, "SAME", 1)
    assert not conv3d.supported((8, 192, 192, 16, 33), (3, 3, 3), None, "SAME", 1)
    assert not conv3d.supported((8, 192, 192, 16, 1), (3, 3, 3), None, "SAME", 1)
    assert not conv3d.supported((8, 192, 4, 8, 32), (3, 3, 3), None, "SAME", 1)  # P=32 < 128
    assert not conv3d.supported((8, 192, 192, 16, 256), (3, 3, 3), None, "SAME", 1)
    # f32 patch matrix would overflow the VMEM budget at the big shape
    assert not conv3d.supported((8, 192, 192, 16, 32), (3, 3, 3), None, "SAME", 1, jnp.float32)


def test_conv_layer_param_structure_unchanged():
    """The dispatch path must keep nn.Conv's param tree (checkpoint compat)."""
    from cinema_tpu.models.layers import Conv, _PallasConv3

    x = jnp.ones((1, 16, 16, 8, 16))
    conv = Conv(16, (3, 3, 3), padding="SAME")
    p_xla = conv.init(jax.random.PRNGKey(0), x)

    inner = _PallasConv3(features=16, kernel_size=(3, 3, 3), use_bias=True, fan_in=16 * 27, name="conv")
    with pltpu.force_tpu_interpret_mode():
        p_pallas = inner.init(jax.random.PRNGKey(0), x)
    a = jax.tree.map(lambda t: (t.shape, t.dtype), p_xla["params"]["conv"])
    b = jax.tree.map(lambda t: (t.shape, t.dtype), p_pallas["params"])
    assert a == b


def test_preact_conv3_matches_reference():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 5, 8, 8, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 16, 24)).astype(np.float32) * 0.2)
    scale = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1 + 1.0)
    bias = jnp.asarray(rng.normal(size=(16,)).astype(np.float32) * 0.1)
    with pltpu.force_tpu_interpret_mode():
        got = conv3d.preact_conv3_same(x, w, scale, bias)
    want = conv3d._ref_preact_conv(x, w, scale, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)

    # gradients via the reference composition
    def loss_pallas(x, w, s, b):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(conv3d.preact_conv3_same(x, w, s, b) ** 2)

    def loss_ref(x, w, s, b):
        return jnp.sum(conv3d._ref_preact_conv(x, w, s, b) ** 2)

    g = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(x, w, scale, bias)
    r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, scale, bias)
    for a, b_ in zip(g, r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4)
