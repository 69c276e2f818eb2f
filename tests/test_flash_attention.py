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


class TestPackedFlash:
    """Packed (B, T, E) flash attention must match the per-head reference."""

    def _packed_vs_reference(self, b, n_q, n_k, h, d, seed=0, dtype=np.float32):
        from cinema_tpu.ops.pallas.flash_attention import flash_attention_packed

        rng = np.random.default_rng(seed)
        e = h * d
        q = jnp.asarray(rng.normal(size=(b, n_q, e)).astype(dtype))
        k = jnp.asarray(rng.normal(size=(b, n_k, e)).astype(dtype))
        v = jnp.asarray(rng.normal(size=(b, n_k, e)).astype(dtype))
        got = flash_attention_packed(q, k, v, h)
        want = _reference_attention(
            q.reshape(b, n_q, h, d), k.reshape(b, n_k, h, d), v.reshape(b, n_k, h, d)
        ).reshape(b, n_q, e)
        return np.asarray(got), np.asarray(want)

    @pytest.mark.parametrize("n_q,n_k", [(64, 64), (100, 72), (257, 129)])
    def test_forward_matches(self, n_q, n_k):
        got, want = self._packed_vs_reference(2, n_q, n_k, 4, 32)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_head_groups_path(self):
        # embed 256 with 8 heads of 32 -> group split exercised when n_k large
        got, want = self._packed_vs_reference(1, 64, 640, 8, 32)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_gradients_match(self):
        from cinema_tpu.ops.pallas.flash_attention import flash_attention_packed

        rng = np.random.default_rng(1)
        b, n_q, n_k, h, d = 1, 40, 56, 4, 32
        e = h * d
        q = jnp.asarray(rng.normal(size=(b, n_q, e)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, n_k, e)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, n_k, e)).astype(np.float32))

        def loss_packed(q, k, v):
            return jnp.sum(flash_attention_packed(q, k, v, h) ** 2)

        def loss_ref(q, k, v):
            out = _reference_attention(
                q.reshape(b, n_q, h, d), k.reshape(b, n_k, h, d), v.reshape(b, n_k, h, d)
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g_packed = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g_packed, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-4)

    def test_bf16_inputs(self):
        got, want = self._packed_vs_reference(1, 64, 64, 2, 64, dtype=np.float32)
        from cinema_tpu.ops.pallas.flash_attention import flash_attention_packed

        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.normal(size=(1, 64, 128))).astype(jnp.bfloat16)
        out = flash_attention_packed(q, q, q, 2)
        assert out.dtype == jnp.bfloat16
        assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_attention_module_packed_path_matches_xla():
    """The in-model packed flash path must match the XLA path exactly
    (same weights, same inputs) — covers the kv column split."""
    from cinema_tpu.models.vit import Attention

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 40, 64)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(2, 24, 64)).astype(np.float32))

    attn_pallas = Attention(n_heads=4, attn_impl="pallas")
    attn_xla = Attention(n_heads=4, attn_impl="xla")
    params = attn_xla.init(jax.random.PRNGKey(0), x)

    for args in [(x,), (x, ctx)]:  # self- and cross-attention
        got = attn_pallas.apply(params, *args)
        want = attn_xla.apply(params, *args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


class TestLongTkPackedFlash:
    """Long-Tk packed attention (the serving/fine-tune encoder regime,
    T>=1536 padded) runs the same one-pass kernel: a streaming online-softmax
    variant was measured SLOWER on v5e (VPU-softmax bound; pruned 2026-08-19,
    docs/KERNEL_NOTES.md). These shapes keep the long-Tk path covered."""

    def test_long_tk_forward_matches(self):
        from cinema_tpu.ops.pallas import flash_attention as fa

        rng = np.random.default_rng(0)
        b, n_q, n_k, h, d = 1, 520, 1600, 4, 32
        e = h * d
        q = jnp.asarray(rng.normal(size=(b, n_q, e)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, n_k, e)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, n_k, e)).astype(np.float32))
        got = fa.flash_attention_packed(q, k, v, h)
        want = _reference_attention(
            q.reshape(b, n_q, h, d), k.reshape(b, n_k, h, d), v.reshape(b, n_k, h, d)
        ).reshape(b, n_q, e)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_long_tk_gradients_match(self):
        from cinema_tpu.ops.pallas.flash_attention import flash_attention_packed

        rng = np.random.default_rng(1)
        b, n_q, n_k, h, d = 1, 96, 1550, 2, 32
        e = h * d
        q = jnp.asarray(rng.normal(size=(b, n_q, e)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, n_k, e)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, n_k, e)).astype(np.float32))

        def loss_packed(q, k, v):
            return jnp.sum(flash_attention_packed(q, k, v, h) ** 2)

        def loss_ref(q, k, v):
            out = _reference_attention(
                q.reshape(b, n_q, h, d), k.reshape(b, n_k, h, d), v.reshape(b, n_k, h, d)
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g_packed = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g_packed, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-4)
