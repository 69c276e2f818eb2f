"""Multi-device tests: mesh, TP shardings, distributed MAE train step.

Runs on the 8-virtual-device CPU mesh from conftest.
"""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # full-model tier; fast tier runs -m "not slow"

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from cinema_tpu.models.mae import CineMA
from cinema_tpu.parallel.mesh import batch_shardings, make_mesh, param_shardings
from cinema_tpu.train.optim import build_optimizer
from cinema_tpu.train.state import make_mae_train_step, make_train_state

SAX_SIZE = (32, 32, 4)
LAX_SIZE = (32, 32)


def _tiny_mae(views=("sax", "lax_2c"), embed=16):
    sizes = {"sax": SAX_SIZE, "lax_2c": LAX_SIZE}
    nd = {v: len(sizes[v]) for v in views}
    return CineMA(
        image_size_dict={v: sizes[v] for v in views},
        in_chans_dict={v: 1 for v in views},
        enc_patch_size_dict={v: (4, 4, 1)[: nd[v]] for v in views},
        enc_scale_factor_dict={v: (2, 2, 1)[: nd[v]] for v in views},
        enc_conv_chans=(8, 16),
        enc_conv_n_blocks=1,
        enc_embed_dim=embed,
        enc_depth=2,
        enc_n_heads=2,
        dec_embed_dim=embed,
        dec_depth=1,
        dec_n_heads=2,
    )


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh = make_mesh(n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(n_data=8, n_model=2)


def test_param_shardings_tp_rules():
    mesh = make_mesh(n_model=2)
    model = _tiny_mae()
    images = {"sax": jnp.ones((1, *SAX_SIZE, 1)), "lax_2c": jnp.ones((1, *LAX_SIZE, 1))}
    abstract = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}, images, 0.75)
    )
    sh = param_shardings(abstract, mesh)
    blocks = sh["params"]["encoder"]["blocks_0"]
    assert blocks["attn"]["q"]["linear"]["kernel"].spec == P(None, "model")
    assert blocks["attn"]["proj"]["linear"]["kernel"].spec == P("model", None)
    assert blocks["mlp"]["fc1"]["linear"]["kernel"].spec == P(None, "model")
    assert blocks["mlp"]["fc2"]["linear"]["kernel"].spec == P("model", None)
    # conv stems replicated
    assert sh["params"]["enc_down_dict_sax"]["patch_embed"]["proj"]["linear"]["kernel"].spec == P()
    # norms replicated
    assert blocks["norm1"]["scale"].spec == P()


def test_indivisible_dims_fall_back_to_replication():
    mesh = make_mesh(n_model=8)  # embed 16 / heads 2: fc1 hidden 64 % 8 == 0; kv 32 % 8 == 0
    model = _tiny_mae(embed=12)  # 12 % 8 != 0 -> everything replicated
    images = {"sax": jnp.ones((1, *SAX_SIZE, 1)), "lax_2c": jnp.ones((1, *LAX_SIZE, 1))}
    abstract = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}, images, 0.75)
    )
    sh = param_shardings(abstract, mesh)
    assert sh["params"]["encoder"]["blocks_0"]["attn"]["q"]["linear"]["kernel"].spec == P()


@pytest.mark.parametrize("n_model", [2])
def test_distributed_mae_train_step(n_model):
    """Full dp+tp train step on the 8-device CPU mesh. The pure-dp (n_model=1)
    variant is covered by test_fsdp_shards_large_params_and_matches_replicated,
    whose fsdp=False branch compiles and runs the identical replicated step on
    the same mesh/model/batch shapes."""
    mesh = make_mesh(n_model=n_model)
    model = _tiny_mae()
    batch = {
        "sax": jnp.ones((8, *SAX_SIZE, 1)),
        "lax_2c": jnp.ones((8, *LAX_SIZE, 1)),
    }

    def init_fn():
        return model.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
            jax.tree.map(lambda x: x[:1], batch),
            0.75,
        )

    tx = build_optimizer(jax.eval_shape(init_fn), lr=1e-3, warmup_steps=0, max_n_steps=10)
    state, shardings = make_train_state(init_fn, tx, mesh)
    assert shardings is not None

    batch = jax.device_put(batch, batch_shardings(batch, mesh))
    step = make_mae_train_step(model, tx, 0.75, mesh=mesh, state_shardings=shardings)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert int(new_state.step) == 1
    assert int(new_state.n_samples) == 8
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    # params actually changed
    fresh = jax.jit(init_fn)()
    diff = sum(
        float(jnp.sum(jnp.abs(a - b)))
        for a, b in zip(jax.tree_util.tree_leaves(new_state.params), jax.tree_util.tree_leaves(fresh))
    )
    assert diff > 0


def test_single_device_train_step_and_nan_skip():
    model = _tiny_mae(views=("sax",))
    batch = {"sax": jnp.ones((2, *SAX_SIZE, 1))}

    def init_fn():
        return model.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}, batch, 0.75
        )

    tx = build_optimizer(jax.eval_shape(init_fn), lr=1e-3, warmup_steps=0, max_n_steps=10)
    state, _ = make_train_state(init_fn, tx)
    step = make_mae_train_step(model, tx, 0.75, donate=False)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert float(metrics["skipped_nan"]) == 0.0

    # poison the batch with NaN -> loss NaN -> params unchanged
    bad = {"sax": jnp.full((2, *SAX_SIZE, 1), jnp.nan)}
    kept_state, metrics = step(state, bad, jax.random.PRNGKey(0))
    assert float(metrics["skipped_nan"]) == 1.0
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        kept_state.params,
        state.params,
    )


def test_fsdp_shards_large_params_and_matches_replicated(monkeypatch):
    """FSDP (ZeRO-3-style data-axis param sharding) must distribute large
    params/moments across devices AND produce the same loss/updates as the
    replicated run — GSPMD inserts the all-gathers/reduce-scatters."""
    import cinema_tpu.parallel.mesh as mesh_mod

    # tiny test model: drop the min-size gate so its params shard too
    monkeypatch.setattr(mesh_mod, "_FSDP_MIN_SIZE", 128)
    _FSDP_MIN_SIZE = 128

    mesh = make_mesh(n_model=1)
    model = _tiny_mae()
    batch = {
        "sax": jnp.ones((8, *SAX_SIZE, 1)),
        "lax_2c": jnp.ones((8, *LAX_SIZE, 1)),
    }

    def init_fn():
        return model.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
            jax.tree.map(lambda x: x[:1], batch),
            0.75,
        )

    tx = build_optimizer(jax.eval_shape(init_fn), lr=1e-3, warmup_steps=0, max_n_steps=10)

    results = {}
    for fsdp in (False, True):
        state, shardings = make_train_state(init_fn, tx, mesh, fsdp=fsdp)
        sharded_batch = jax.device_put(batch, batch_shardings(batch, mesh))
        step = make_mae_train_step(model, tx, 0.75, mesh=mesh, state_shardings=shardings)
        new_state, metrics = step(state, sharded_batch, jax.random.PRNGKey(0))
        results[fsdp] = (new_state, float(metrics["loss"]))

        if fsdp:
            # every big param must actually live sharded over 'data'
            n_sharded = 0
            for leaf in jax.tree_util.tree_leaves(new_state.params):
                if leaf.size >= _FSDP_MIN_SIZE and any(
                    d % 8 == 0 and d > 0 for d in leaf.shape
                ):
                    local = leaf.addressable_shards[0].data.size
                    assert local < leaf.size, f"{leaf.shape} not sharded"
                    n_sharded += 1
            assert n_sharded > 0

    np.testing.assert_allclose(results[True][1], results[False][1], rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(results[True][0].params),
        jax.tree_util.tree_leaves(results[False][0].params),
    ):
        # reduce-scatter/all-gather reassociation vs the replicated psum:
        # tiny absolute noise on near-zero params is expected
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_distributed_supervised_seg_train_step():
    """ACDC-style ConvUNetR fine-tune step on a 4x2 (data x model) mesh —
    the mesh-wired analog of the reference's single-GPU run_train
    (cinema/train.py:171-351)."""
    from cinema_tpu.models.convunetr import ConvUNetR
    from cinema_tpu.tasks.segmentation import segmentation_loss_fn
    from cinema_tpu.train.state import make_supervised_train_step

    mesh = make_mesh(n_model=2)
    model = ConvUNetR(
        image_size_dict={"sax": SAX_SIZE},
        in_chans_dict={"sax": 1},
        out_chans=4,
        enc_patch_size_dict={"sax": (4, 4, 1)},
        enc_scale_factor_dict={"sax": (2, 2, 1)},
        enc_conv_chans=(8, 16),
        enc_conv_n_blocks=1,
        enc_embed_dim=16,
        enc_depth=2,
        enc_n_heads=2,
        dec_chans=(4, 8, 16, 16),
        dec_patch_size_dict={"sax": (4, 4, 1)},
        dec_scale_factor_dict={"sax": (2, 2, 1)},
    )
    rng = np.random.default_rng(0)
    batch = {
        "sax_image": jnp.asarray(rng.normal(size=(8, *SAX_SIZE, 1)), jnp.float32),
        "sax_label": jnp.asarray(rng.integers(0, 4, size=(8, *SAX_SIZE)), jnp.int32),
    }

    def init_fn():
        return model.init(jax.random.PRNGKey(0), {"sax": batch["sax_image"][:1]})

    tx = build_optimizer(jax.eval_shape(init_fn), lr=1e-3, warmup_steps=0, max_n_steps=10)
    state, shardings = make_train_state(init_fn, tx, mesh, fsdp=True)
    step = make_supervised_train_step(
        model, tx, segmentation_loss_fn, mesh=mesh, state_shardings=shardings, donate=False
    )
    sharded = jax.device_put(batch, batch_shardings(batch, mesh))
    new_state, metrics = step(state, sharded, jax.random.PRNGKey(0))
    assert int(new_state.step) == 1
    assert int(new_state.n_samples) == 8
    assert np.isfinite(float(metrics["loss"]))
    # matches the single-device step numerically
    state1, _ = make_train_state(init_fn, tx)
    step1 = make_supervised_train_step(model, tx, segmentation_loss_fn, donate=False)
    ref_state, ref_metrics = step1(state1, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(new_state.params),
        jax.tree_util.tree_leaves(ref_state.params),
    ):
        # reduce-scatter/all-gather reassociation vs the single-device psum:
        # tiny absolute noise through the Adam rescale is expected
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_run_train_uses_mesh(tmp_path, monkeypatch):
    """run_train shards its train step over the ('data','model') mesh: the
    picked data width obeys batch divisibility (pick_n_data) and the loop
    runs on >1 device end-to-end (tested via the ACDC task smoke elsewhere;
    here: the width logic)."""
    from cinema_tpu.train.loop import pick_n_data

    assert pick_n_data(8, 32, 4, 1000) == 8
    assert pick_n_data(8, 32, 4, 8) == 2      # dataset caps local batch
    assert pick_n_data(8, 6, 1, 1000) == 6    # divisibility: 6 % (1*n) == 0
    assert pick_n_data(8, 7, 1, 1000) == 7
    assert pick_n_data(8, 4, 4, 1000) == 1
    assert pick_n_data(1, 32, 4, 1000) == 1
