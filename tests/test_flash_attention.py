"""Pallas flash attention parity tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _reference_attention(q, k, v):
    scale = q.shape[-1] ** -0.5
    scores = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32) * scale, k.astype(jnp.float32))
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))


@pytest.fixture(autouse=True)
def _interpret_mode():
    """Run pallas kernels in interpreter mode on CPU."""
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.mark.parametrize("n_q,n_k", [(64, 64), (100, 100), (257, 129), (64, 200)])
def test_flash_matches_reference(n_q, n_k):
    from cinema_tpu.ops.pallas.flash_attention import flash_attention

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, n_q, 2, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, n_k, 2, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, n_k, 2, 16)).astype(np.float32))
    got = flash_attention(q, k, v, 128)
    want = _reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flash_gradients_match_reference():
    from cinema_tpu.ops.pallas.flash_attention import flash_attention

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 40, 2, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 56, 2, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 56, 2, 16)).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, 128) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_flash_bf16_inputs():
    from cinema_tpu.ops.pallas.flash_attention import flash_attention

    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.normal(size=(1, 32, 2, 16)).astype(np.float32)).astype(jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, 32, 2, 16)).astype(np.float32)).astype(jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, 32, 2, 16)).astype(np.float32)).astype(jnp.bfloat16)
    out = flash_attention(q, k, v, 128)
    assert out.dtype == jnp.bfloat16
    want = _reference_attention(q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32))
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(want), atol=3e-2
    )


def test_attention_dispatch_pallas():
    from cinema_tpu.ops.attention import dot_product_attention

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(1, 24, 2, 16)).astype(np.float32))
    out = dot_product_attention(q, q, q, implementation="pallas")
    want = _reference_attention(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)
