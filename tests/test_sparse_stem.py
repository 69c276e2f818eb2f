"""Sparse visible-cell stem: exactness vs the dense masked path.

The sparse path (ops/sparse_cells.py + DownsampleEncoder._sparse_forward)
must produce EXACTLY the dense computation's visible-token values: the only
cross-cell op is the depthwise conv, whose input the dense path zeroes at
masked positions (mask multiply) and the sparse path zeroes by scatter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cinema_tpu.models.convvit import DownsampleEncoder, MultiScaleFusion
from cinema_tpu.models.mae import CineMA
from cinema_tpu.ops.masking import gather_tokens, random_patch_mask
from cinema_tpu.ops.sparse_cells import (
    CellDenseCtx,
    cells_to_image,
    gather_cells,
    image_to_cells,
    scatter_cells,
)


@pytest.mark.parametrize("grid", [(3, 2), (2, 3, 2)])
def test_cells_round_trip(grid):
    rng = np.random.default_rng(0)
    cell = (4, 2, 3)[: len(grid)]
    spatial = tuple(g * c for g, c in zip(grid, cell))
    x = jnp.asarray(rng.normal(size=(2, *spatial, 5)).astype(np.float32))
    cells = image_to_cells(x, grid)
    assert cells.shape == (2, int(np.prod(grid)), *cell, 5)
    np.testing.assert_array_equal(cells_to_image(cells, grid), x)

    # cell-major order matches patchify token order: cell i of a ramp image
    ramp = jnp.arange(int(np.prod(spatial))).reshape(1, *spatial, 1).astype(jnp.float32)
    c0 = image_to_cells(ramp, grid)[0, 0, ..., 0]
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(ramp[0, ..., 0][tuple(slice(0, c) for c in cell)]))


def test_scatter_gather_cells():
    rng = np.random.default_rng(1)
    cells = jnp.asarray(rng.normal(size=(2, 6, 2, 2, 3)).astype(np.float32))
    keep_ids = jnp.asarray([[0, 2, 5], [1, 3, 4]], dtype=jnp.int32)
    vis = gather_cells(cells, keep_ids)
    assert vis.shape == (2, 3, 2, 2, 3)
    dense = scatter_cells(vis, keep_ids, 6)
    # visible cells restored, masked cells zero
    np.testing.assert_array_equal(np.asarray(gather_cells(dense, keep_ids)), np.asarray(vis))
    assert float(jnp.abs(dense[0, 1]).sum()) == 0.0
    assert float(jnp.abs(dense[1, 0]).sum()) == 0.0

    ctx = CellDenseCtx(grid_size=(2, 3), keep_ids=keep_ids)
    flat = vis.reshape(6, 2, 2, 3)
    img = ctx.densify(flat)
    assert img.shape == (2, 4, 6, 3)
    np.testing.assert_array_equal(np.asarray(ctx.sparsify(img)), np.asarray(flat))


@pytest.mark.parametrize(
    "image_size,patch,scale",
    [((32, 32), (4, 4), (2, 2)), ((32, 32, 4), (4, 4, 1), (2, 2, 1))],
)
def test_downsample_encoder_sparse_matches_dense(image_size, patch, scale):
    rng = np.random.default_rng(2)
    kw = dict(
        image_size=image_size, patch_size=patch, scale_factor=scale,
        conv_chans=(8, 16), conv_n_blocks=2, embed_dim=24,
    )
    dense_enc = DownsampleEncoder(**kw, sparse_masking=False)
    sparse_enc = DownsampleEncoder(**kw, sparse_masking=True)

    img = jnp.asarray(rng.normal(size=(2, *image_size, 1)).astype(np.float32))
    n_patches = dense_enc.n_patches
    mask = random_patch_mask(jax.random.PRNGKey(0), 2, n_patches, 0.75)
    params = dense_enc.init(jax.random.PRNGKey(1), img, mask)

    dense_skips, dense_tokens = dense_enc.apply(params, img, mask)
    sparse_skips, sparse_tokens = sparse_enc.apply(params, img, mask)

    # sparse tokens == dense tokens gathered at keep_ids
    np.testing.assert_allclose(
        np.asarray(sparse_tokens),
        np.asarray(gather_tokens(dense_tokens, mask.keep_ids)),
        rtol=1e-5, atol=1e-5,
    )

    # sparse skips == dense skips' visible cells
    grid = dense_enc.grid_size
    for lvl, (d_skip, s_skip) in enumerate(zip(dense_skips, sparse_skips)):
        d_cells = gather_cells(image_to_cells(d_skip, grid), mask.keep_ids)
        np.testing.assert_allclose(
            np.asarray(s_skip), np.asarray(d_cells), rtol=1e-5, atol=1e-5,
            err_msg=f"skip level {lvl}",
        )

    # fusion over sparse skips == fusion over dense skips with mask gather
    fus = MultiScaleFusion(
        image_size=image_size, patch_size=patch, scale_factor=scale,
        conv_chans=(8, 16), embed_dim=24,
    )
    tokens = jnp.asarray(rng.normal(size=(2, mask.n_keep, 24)).astype(np.float32))
    fparams = fus.init(jax.random.PRNGKey(2), dense_skips, tokens, mask)
    out_dense = fus.apply(fparams, dense_skips, tokens, mask)
    out_sparse = fus.apply(fparams, sparse_skips, tokens, mask)
    np.testing.assert_allclose(np.asarray(out_sparse), np.asarray(out_dense), rtol=1e-5, atol=1e-5)


def _tiny_mae(sparse):
    views = {"sax": (16, 16, 4), "lax_2c": (16, 16)}
    return CineMA(
        image_size_dict=views,
        in_chans_dict={v: 1 for v in views},
        enc_patch_size_dict={v: (2, 2, 1)[: len(s)] for v, s in views.items()},
        enc_scale_factor_dict={v: (2, 2, 1)[: len(s)] for v, s in views.items()},
        enc_conv_chans=(8, 16),
        enc_conv_n_blocks=1,
        enc_embed_dim=16,
        enc_depth=1,
        enc_n_heads=2,
        dec_embed_dim=16,
        dec_depth=1,
        dec_n_heads=2,
        sparse_masking=sparse,
    )


@pytest.mark.slow  # full-model tier; fast tier runs -m "not slow"
def test_cinema_sparse_matches_dense_end_to_end():
    rng = np.random.default_rng(3)
    dense_model = _tiny_mae(False)
    sparse_model = _tiny_mae(True)
    images = {
        "sax": jnp.asarray(rng.normal(size=(2, 16, 16, 4, 1)).astype(np.float32)),
        "lax_2c": jnp.asarray(rng.normal(size=(2, 16, 16, 1)).astype(np.float32)),
    }
    params = dense_model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}, images, 0.75
    )
    mask_dict = {
        "sax": random_patch_mask(jax.random.PRNGKey(2), 2, 16, 0.75),
        "lax_2c": random_patch_mask(jax.random.PRNGKey(3), 2, 4, 0.5),
    }
    loss_d, preds_d, _, metrics_d = dense_model.apply(params, images, 0.75, mask_dict)
    loss_s, preds_s, _, metrics_s = sparse_model.apply(params, images, 0.75, mask_dict)
    np.testing.assert_allclose(float(loss_s), float(loss_d), rtol=1e-5)
    for v in preds_d:
        np.testing.assert_allclose(np.asarray(preds_s[v]), np.asarray(preds_d[v]), rtol=1e-4, atol=1e-5)

    # gradients agree too (the train-step surface)
    def loss_fn(model):
        def f(p):
            return model.apply(p, images, 0.75, mask_dict)[0]
        return f

    g_d = jax.grad(loss_fn(dense_model))(params)
    g_s = jax.grad(loss_fn(sparse_model))(params)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_d), jax.tree_util.tree_leaves_with_path(g_s)
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(kp),
        )


def test_sparse_param_structure_identical():
    # the flag must not change the checkpoint surface
    rng = np.random.default_rng(4)
    images = {
        "sax": jnp.asarray(rng.normal(size=(1, 16, 16, 4, 1)).astype(np.float32)),
        "lax_2c": jnp.asarray(rng.normal(size=(1, 16, 16, 1)).astype(np.float32)),
    }
    rngs = {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}
    shapes = []
    for sparse in (False, True):
        p = jax.eval_shape(lambda s=sparse: _tiny_mae(s).init(rngs, images, 0.75))
        shapes.append(jax.tree.map(lambda x: (x.shape, x.dtype), p))
    assert shapes[0] == shapes[1]


def test_sparse_ratio_zero_matches_dense():
    """full_patch_mask (ratio 0): every cell visible — the sparse path must
    still equal the dense one (scatter becomes a permutation identity)."""
    from cinema_tpu.ops.masking import full_patch_mask

    rng = np.random.default_rng(5)
    kw = dict(
        image_size=(16, 16, 4), patch_size=(2, 2, 1), scale_factor=(2, 2, 1),
        conv_chans=(4, 8), conv_n_blocks=1, embed_dim=12,
    )
    dense_enc = DownsampleEncoder(**kw, sparse_masking=False)
    sparse_enc = DownsampleEncoder(**kw, sparse_masking=True)
    img = jnp.asarray(rng.normal(size=(2, 16, 16, 4, 1)).astype(np.float32))
    mask = full_patch_mask(2, dense_enc.n_patches)
    params = dense_enc.init(jax.random.PRNGKey(0), img, mask)
    _, dense_tokens = dense_enc.apply(params, img, mask)
    _, sparse_tokens = sparse_enc.apply(params, img, mask)
    np.testing.assert_allclose(
        np.asarray(sparse_tokens), np.asarray(dense_tokens), rtol=1e-5, atol=1e-5
    )
