"""Parity and shape tests for primitive layers vs torch semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cinema_tpu.models.layers import (
    Conv,
    ConvMlp,
    ConvNormActBlock,
    ConvResBlock,
    ConvTranspose,
    Dense,
    GroupNorm,
    InstanceNorm,
    LayerNorm,
    MaskedConvBlock,
    gelu,
)

from helpers import t2j_conv_kernel, t2j_conv_transpose_kernel

ATOL = 1e-5


def test_gelu_exact_matches_torch():
    x = np.linspace(-4, 4, 101).astype(np.float32)
    got = np.asarray(gelu(jnp.asarray(x)))
    want = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_layernorm_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 8)).astype(np.float32)
    scale = rng.normal(size=(8,)).astype(np.float32)
    bias = rng.normal(size=(8,)).astype(np.float32)

    model = LayerNorm(epsilon=1e-5)
    params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
    got = np.asarray(model.apply(params, jnp.asarray(x)))

    tln = torch.nn.LayerNorm(8, eps=1e-5)
    with torch.no_grad():
        tln.weight.copy_(torch.from_numpy(scale))
        tln.bias.copy_(torch.from_numpy(bias))
    want = tln(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=ATOL)


@pytest.mark.parametrize("nd", [2, 3])
def test_instancenorm_matches_torch(nd):
    rng = np.random.default_rng(1)
    spatial = (6, 5) if nd == 2 else (6, 5, 4)
    x = rng.normal(size=(2, *spatial, 3)).astype(np.float32)
    got = np.asarray(InstanceNorm(epsilon=1e-6).apply({"params": {}}, jnp.asarray(x)))
    cls = torch.nn.InstanceNorm2d if nd == 2 else torch.nn.InstanceNorm3d
    tx = torch.from_numpy(np.moveaxis(x, -1, 1))
    want = np.moveaxis(cls(3, eps=1e-6)(tx).numpy(), 1, -1)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_groupnorm_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 6, 5, 8)).astype(np.float32)
    scale = rng.normal(size=(8,)).astype(np.float32)
    bias = rng.normal(size=(8,)).astype(np.float32)
    model = GroupNorm(num_groups=4, epsilon=1e-6)
    params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    tgn = torch.nn.GroupNorm(4, 8, eps=1e-6)
    with torch.no_grad():
        tgn.weight.copy_(torch.from_numpy(scale))
        tgn.bias.copy_(torch.from_numpy(bias))
    want = np.moveaxis(tgn(torch.from_numpy(np.moveaxis(x, -1, 1))).detach().numpy(), 1, -1)
    np.testing.assert_allclose(got, want, atol=ATOL)


@pytest.mark.parametrize("nd", [2, 3])
@pytest.mark.parametrize("stride,padding", [(1, "SAME"), (2, "VALID")])
def test_conv_matches_torch(nd, stride, padding):
    rng = np.random.default_rng(3)
    spatial = (8, 8) if nd == 2 else (8, 8, 6)
    in_c, out_c, k = 3, 5, 3
    x = rng.normal(size=(2, *spatial, in_c)).astype(np.float32)

    tconv_cls = torch.nn.Conv2d if nd == 2 else torch.nn.Conv3d
    tpad = "same" if padding == "SAME" else 0
    tconv = tconv_cls(in_c, out_c, kernel_size=k, stride=stride, padding=tpad)
    want = np.moveaxis(tconv(torch.from_numpy(np.moveaxis(x, -1, 1))).detach().numpy(), 1, -1)

    model = Conv(out_c, (k,) * nd, strides=(stride,) * nd, padding=padding)
    params = {
        "params": {
            "conv": {
                "kernel": jnp.asarray(t2j_conv_kernel(tconv.weight.detach().numpy())),
                "bias": jnp.asarray(tconv.bias.detach().numpy()),
            }
        }
    }
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_depthwise_conv_matches_torch():
    rng = np.random.default_rng(4)
    c = 4
    x = rng.normal(size=(2, 8, 8, c)).astype(np.float32)
    tconv = torch.nn.Conv2d(c, c, kernel_size=5, padding="same", groups=c)
    want = np.moveaxis(tconv(torch.from_numpy(np.moveaxis(x, -1, 1))).detach().numpy(), 1, -1)
    model = Conv(c, (5, 5), padding="SAME", feature_group_count=c)
    params = {
        "params": {
            "conv": {
                "kernel": jnp.asarray(t2j_conv_kernel(tconv.weight.detach().numpy())),
                "bias": jnp.asarray(tconv.bias.detach().numpy()),
            }
        }
    }
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("nd", [2, 3])
def test_conv_transpose_matches_torch(nd):
    rng = np.random.default_rng(5)
    spatial = (4, 4) if nd == 2 else (4, 4, 3)
    in_c, out_c = 4, 3
    k = (2, 2) if nd == 2 else (2, 2, 1)
    x = rng.normal(size=(2, *spatial, in_c)).astype(np.float32)
    tcls = torch.nn.ConvTranspose2d if nd == 2 else torch.nn.ConvTranspose3d
    tconv = tcls(in_c, out_c, kernel_size=k, stride=k)
    want = np.moveaxis(tconv(torch.from_numpy(np.moveaxis(x, -1, 1))).detach().numpy(), 1, -1)
    model = ConvTranspose(out_c, k, strides=k)
    params = {
        "params": {
            "conv": {
                "kernel": jnp.asarray(t2j_conv_transpose_kernel(tconv.weight.detach().numpy())),
                "bias": jnp.asarray(tconv.bias.detach().numpy()),
            }
        }
    }
    got = np.asarray(model.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("nd", [2, 3])
@pytest.mark.parametrize("norm", ["layer", "instance", "group"])
def test_conv_norm_act_block_shapes(nd, norm):
    spatial = (8, 8) if nd == 2 else (8, 8, 4)
    x = jnp.ones((2, *spatial, 3))
    model = ConvNormActBlock(out_chans=6, kernel_size=(2,) * nd, strides=(2,) * nd, padding="VALID", norm=norm)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, *(s // 2 for s in spatial), 6)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("in_c,out_c", [(4, 4), (4, 6)])
def test_conv_res_block(in_c, out_c):
    x = jnp.ones((2, 6, 6, in_c))
    model = ConvResBlock(out_chans=out_c)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 6, 6, out_c)
    has_shortcut = "shortcut" in params["params"]
    assert has_shortcut == (in_c != out_c)


@pytest.mark.parametrize("nd", [2, 3])
def test_masked_conv_block(nd):
    spatial = (6, 6) if nd == 2 else (6, 6, 4)
    x = jnp.ones((2, *spatial, 4))
    mask = jnp.ones((2, *spatial), dtype=bool)
    model = MaskedConvBlock()
    params = model.init(jax.random.PRNGKey(0), x, mask)
    out = model.apply(params, x, mask)
    assert out.shape == x.shape
    out_nomask = model.apply(params, x, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_nomask), atol=1e-6)
    # zero mask kills the conv path contribution difference
    zero = model.apply(params, x, jnp.zeros_like(mask))
    assert not np.allclose(np.asarray(zero), np.asarray(out))


def test_conv_mlp_shapes():
    x = jnp.ones((2, 6, 6, 4))
    model = ConvMlp(hidden_features=16)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == x.shape


def test_dense_param_naming():
    model = Dense(8)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 4)))
    assert "linear" in params["params"]
    assert params["params"]["linear"]["kernel"].shape == (4, 8)


@pytest.mark.parametrize(
    "z,kernel,expected_g",
    [
        (16, 3, 4),  # the serving decoder shape: g=4 beats the Z/3 band
        (8, 3, 8),  # band redundancy 8/3 < g=4: dispatch correctly stays full-Z
        (8, 1, 4),  # 1x1x1 block-diag: partial always wins when lanes fill
    ],
)
def test_gfold_partial_matches_dense(z, kernel, expected_g, monkeypatch):
    """The partial z-fold (g = 128/C groups, batch >= 8) must match the
    dense 3D conv, values and grads — the serving fast path since round 5."""
    from cinema_tpu.models.layers import Conv, partial_fold_group

    c = 32
    assert partial_fold_group(z, c, c, kernel, batch=8) == expected_g
    assert partial_fold_group(z, c, c, kernel, batch=2) == z  # batch-gated
    conv = Conv(c, (kernel,) * 3, padding="SAME")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 6, 6, z, c)).astype(np.float32))

    monkeypatch.setenv("CINEMA_TPU_ZFOLD", "0")
    params = conv.init(jax.random.PRNGKey(0), x)

    def loss(p, v):
        return jnp.sum(jnp.square(conv.apply(p, v)))

    dense_out = conv.apply(params, x)
    dense_g = jax.grad(loss)(params, x)

    monkeypatch.setenv("CINEMA_TPU_ZFOLD", "1")
    gfold_out = conv.apply(params, x)
    gfold_g = jax.grad(loss)(params, x)

    np.testing.assert_allclose(np.asarray(gfold_out), np.asarray(dense_out), rtol=1e-4, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3),
        gfold_g,
        dense_g,
    )


@pytest.mark.parametrize("batch", [2, 8])
def test_gfold_transpose_matches_dense(batch, monkeypatch):
    """z-identity ConvTranspose on the folded layout: the partial (g-group)
    block-diagonal at batch >= 8 and the full-Z one below must both equal
    the dense 5D transpose, values and grads."""
    from cinema_tpu.models.layers import ConvTranspose

    z, ci, co = 8, 64, 32
    tr = ConvTranspose(co, (2, 2, 1), strides=(2, 2, 1))
    rng = np.random.default_rng(1)
    x5 = jnp.asarray(rng.normal(size=(batch, 5, 5, z, ci)).astype(np.float32))
    params = tr.init(jax.random.PRNGKey(0), x5)

    dense_out = tr.apply(params, x5)

    x2 = x5.reshape(batch, 5, 5, z * ci)

    def folded(p, v):
        return tr.apply(p, v, folded_z=z)

    fold_out = folded(params, x2)
    np.testing.assert_allclose(
        np.asarray(fold_out).reshape(batch, 10, 10, z, co),
        np.asarray(dense_out),
        rtol=1e-4,
        atol=1e-4,
    )

    def loss_dense(p):
        return jnp.sum(jnp.square(tr.apply(p, x5)))

    def loss_fold(p):
        return jnp.sum(jnp.square(folded(p, x2)))

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3),
        jax.grad(loss_fold)(params),
        jax.grad(loss_dense)(params),
    )


@pytest.mark.parametrize("z,kernel", [(8, 3), (16, 3), (8, 1)])
def test_zfold_band_matches_dense(z, kernel, monkeypatch):
    """The full-Z banded fold must match the dense 3D conv, values and
    grads. (A segmented variant was pruned 2026-08-19 after losing its
    on-device A/B — docs/KERNEL_NOTES.md.)"""
    from cinema_tpu.models.layers import Conv

    c = 32
    conv = Conv(c, (kernel,) * 3, padding="SAME")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, z, c)).astype(np.float32))

    monkeypatch.setenv("CINEMA_TPU_ZFOLD", "0")
    params = conv.init(jax.random.PRNGKey(0), x)

    def loss(p, v):
        return jnp.sum(jnp.square(conv.apply(p, v)))

    dense_out = conv.apply(params, x)
    dense_g = jax.grad(loss)(params, x)

    monkeypatch.setenv("CINEMA_TPU_ZFOLD", "1")
    band_out = conv.apply(params, x)
    band_g = jax.grad(loss)(params, x)

    np.testing.assert_allclose(np.asarray(band_out), np.asarray(dense_out), rtol=1e-4, atol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3),
        band_g,
        dense_g,
    )
