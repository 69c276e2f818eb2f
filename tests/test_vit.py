"""Tests for the ViT core: attention parity vs torch SDPA, block/encoder shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cinema_tpu.models.vit import (
    Attention,
    Block,
    PatchEmbed,
    ViTDecoder,
    ViTEncoder,
    get_vit_config,
)



def _torch_sdpa_reference(x_q, x_k, wq, bq, wkv, bkv, wp, bp, n_heads):
    """Torch spec of the reference Attention forward (vit.py:482-522)."""
    q = torch.nn.functional.linear(x_q, wq, bq)
    kv = torch.nn.functional.linear(x_k, wkv, bkv)
    b, nq, dim = q.shape
    nk = x_k.shape[1]
    hd = dim // n_heads
    q = q.reshape(b, nq, n_heads, hd).permute(0, 2, 1, 3)
    kv = kv.reshape(b, nk, 2, n_heads, hd).permute(2, 0, 3, 1, 4)
    k, v = kv[0], kv[1]
    o = torch.nn.functional.scaled_dot_product_attention(q, k, v)
    o = o.transpose(1, 2).reshape(b, nq, dim)
    return torch.nn.functional.linear(o, wp, bp)


@pytest.mark.parametrize("cross", [False, True])
def test_attention_matches_torch(cross):
    rng = np.random.default_rng(0)
    dim, n_heads = 16, 4
    xq = rng.normal(size=(2, 7, dim)).astype(np.float32)
    xk = rng.normal(size=(2, 5, dim)).astype(np.float32) if cross else xq

    model = Attention(n_heads=n_heads, qkv_bias=True)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(xq), jnp.asarray(xk) if cross else None)
    p = params["params"]

    wq = torch.from_numpy(np.asarray(p["q"]["linear"]["kernel"]).T.copy())
    bq = torch.from_numpy(np.asarray(p["q"]["linear"]["bias"]).copy())
    wkv = torch.from_numpy(np.asarray(p["kv"]["linear"]["kernel"]).T.copy())
    bkv = torch.from_numpy(np.asarray(p["kv"]["linear"]["bias"]).copy())
    wp = torch.from_numpy(np.asarray(p["proj"]["linear"]["kernel"]).T.copy())
    bp = torch.from_numpy(np.asarray(p["proj"]["linear"]["bias"]).copy())

    want = _torch_sdpa_reference(
        torch.from_numpy(xq), torch.from_numpy(xk), wq, bq, wkv, bkv, wp, bp, n_heads
    ).numpy()
    got = np.asarray(model.apply(params, jnp.asarray(xq), jnp.asarray(xk) if cross else None))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_attention_rotary_shapes():
    model = Attention(n_heads=2, rotary=True)
    x = jnp.ones((2, 6, 8))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == x.shape
    with pytest.raises(ValueError):
        model.apply(params, x, jnp.ones((2, 4, 8)))


@pytest.mark.parametrize("mlp_type", ["mlp", "swiglu"])
def test_block_shapes(mlp_type):
    model = Block(n_heads=2, mlp_type=mlp_type)
    x = jnp.ones((2, 6, 16))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_block_drop_path_stochastic():
    model = Block(n_heads=2, drop_path=0.5)
    # random input: an all-ones input normalises to zero and the block
    # reduces to the identity (biases init to zero), hiding drop-path
    x = jnp.asarray(np.random.default_rng(0).normal(size=(64, 4, 16)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    out_det = model.apply(params, x, None, True)
    out_a = model.apply(params, x, None, False, rngs={"dropout": jax.random.PRNGKey(1)})
    out_b = model.apply(params, x, None, False, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))
    assert np.isfinite(np.asarray(out_det)).all()
    # deterministic pass is unaffected by rngs
    out_det2 = model.apply(params, x, None, True, rngs={"dropout": jax.random.PRNGKey(3)})
    np.testing.assert_array_equal(np.asarray(out_det), np.asarray(out_det2))


@pytest.mark.parametrize("remat", [False, True])
def test_encoder_forward(remat):
    cfg = get_vit_config("tiny")
    model = ViTEncoder(
        embed_dim=cfg["enc_embed_dim"],
        depth=2,
        n_heads=cfg["enc_n_heads"],
        remat=remat,
    )
    x = jnp.ones((2, 10, cfg["enc_embed_dim"]))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 11, cfg["enc_embed_dim"])


def test_encoder_remat_same_output_and_grads():
    cfg = dict(embed_dim=16, depth=2, n_heads=2)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 6, 16)).astype(np.float32))
    m0 = ViTEncoder(**cfg, remat=False)
    m1 = ViTEncoder(**cfg, remat=True)
    params = m0.init(jax.random.PRNGKey(0), x)

    def loss0(p):
        return jnp.sum(m0.apply(p, x) ** 2)

    def loss1(p):
        return jnp.sum(m1.apply(p, x) ** 2)

    np.testing.assert_allclose(loss0(params), loss1(params), rtol=1e-6)
    g0 = jax.grad(loss0)(params)
    g1 = jax.grad(loss1)(params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6), g0, g1)


def test_encoder_feature_forward():
    model = ViTEncoder(embed_dim=16, depth=3, n_heads=2)
    x = jnp.ones((2, 6, 16))
    params = model.init(jax.random.PRNGKey(0), x)
    feats = model.apply(params, x, method="feature_forward")
    assert feats.shape == (2, 7, 16, 3)


@pytest.mark.parametrize("cross", [False, True])
def test_decoder_forward(cross):
    model = ViTDecoder(embed_dim=16, depth=2, n_heads=2)
    n_masked = 5
    if cross:
        x_q = jnp.ones((2, 1 + n_masked, 16))
        x_k = jnp.ones((2, 4, 16))
    else:
        x_q = jnp.ones((2, 1 + 4 + n_masked, 16))
        x_k = None
    params = model.init(jax.random.PRNGKey(0), x_q, x_k, n_masked)
    out = model.apply(params, x_q, x_k, n_masked)
    assert out.shape == (2, n_masked, 16)


@pytest.mark.parametrize(
    "image_size,patch_size",
    [((16, 16), (4, 4)), ((16, 16, 4), (4, 4, 1))],
)
def test_patch_embed(image_size, patch_size):
    model = PatchEmbed(image_size=image_size, patch_size=patch_size, embed_dim=16)
    x = jnp.ones((2, *image_size, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, model.n_patches, 16)
    with pytest.raises(ValueError):
        model.apply(params, jnp.ones((2, *(s + 1 for s in image_size), 1)))


def test_get_vit_config():
    assert get_vit_config("base")["enc_embed_dim"] == 768
    with pytest.raises(ValueError):
        get_vit_config("massive")


def test_scan_blocks_matches_unrolled():
    """nn.scan over Blocks (compile-time lever): same math as the unrolled
    loop, and the bridge unstacks scanned params to the same torch keys."""
    import numpy as np

    from cinema_tpu.bridge.torch_loader import params_to_torch_state_dict
    from cinema_tpu.models.vit import ViTEncoder

    depth = 3
    kwargs = dict(embed_dim=16, depth=depth, n_heads=2)
    plain = ViTEncoder(**kwargs)
    scanned = ViTEncoder(**kwargs, scan_blocks=True)

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 16)), jnp.float32)
    p_plain = plain.init(jax.random.PRNGKey(0), x)

    # restack the unrolled per-block subtrees into the scanned layout
    enc = dict(p_plain["params"])
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *[enc.pop(f"blocks_{i}") for i in range(depth)]
    )
    enc["blocks"] = {"block": stacked}
    p_scan = {"params": enc}

    got = scanned.apply(p_scan, x)
    want = plain.apply(p_plain, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    # feature_forward parity (per-layer stacking path)
    got_f = scanned.apply(p_scan, x, method="feature_forward")
    want_f = plain.apply(p_plain, x, method="feature_forward")
    np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f), atol=1e-6)

    # bridge export: identical torch keys and values
    sd_plain = params_to_torch_state_dict(p_plain)
    sd_scan = params_to_torch_state_dict(p_scan)
    assert set(sd_plain) == set(sd_scan)
    for k in sd_plain:
        np.testing.assert_allclose(sd_plain[k], sd_scan[k], atol=0, err_msg=k)

    # bridge import: the unrolled torch state_dict re-stacks into the
    # scanned template (inverse of _unstack_scanned), strict accounting
    from cinema_tpu.bridge.torch_loader import load_torch_state_dict

    template = jax.tree.map(jnp.zeros_like, p_scan)
    loaded, missing, unused = load_torch_state_dict(template, sd_plain, strict=True)
    assert not missing and not unused
    got_loaded = scanned.apply(loaded, x)
    np.testing.assert_allclose(np.asarray(got_loaded), np.asarray(want), atol=1e-6)
