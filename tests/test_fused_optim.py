"""Fused AdamW == the generic optax chain (clip -> adam -> wd -> scales -> lr)
plus the tree-wide NaN guard, step for step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cinema_tpu.train.optim import build_optimizer


def _params():
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 4)
    return {
        "dense": {
            "kernel": jax.random.normal(ks[0], (8, 16)),
            "bias": jax.random.normal(ks[1], (16,)),
        },
        "blocks_0": {"w": jax.random.normal(ks[2], (16, 16))},
        "head": {"kernel": jax.random.normal(ks[3], (16, 4))},
    }


def _grads(seed):
    params = _params()
    ks = jax.random.split(jax.random.PRNGKey(seed), len(jax.tree_util.tree_leaves(params)))
    leaves, tdef = jax.tree_util.tree_flatten(params)
    return jax.tree_util.tree_unflatten(
        tdef, [jax.random.normal(k, leaf.shape) * 3 for k, leaf in zip(ks, leaves)]
    )


@pytest.mark.parametrize("layer_decay", [None, 0.75])
@pytest.mark.parametrize("clip_grad", [None, 0.5])
def test_fused_matches_chain(layer_decay, clip_grad):
    params = _params()
    kwargs = dict(
        lr=1e-2,
        min_lr=1e-4,
        warmup_steps=2,
        max_n_steps=10,
        weight_decay=0.05,
        clip_grad=clip_grad,
        layer_decay=layer_decay,
        n_blocks=1,
    )
    chain = build_optimizer(params, **kwargs)
    fused = build_optimizer(params, fused=True, **kwargs)

    p_chain, p_fused = params, params
    s_chain, s_fused = chain.init(params), fused.init(params)
    ok = jnp.asarray(True)
    for step in range(4):
        g = _grads(step)
        updates, s_chain = chain.update(g, s_chain, p_chain)
        p_chain = optax.apply_updates(p_chain, updates)
        p_fused, s_fused, gnorm = fused.update_with_guard(g, s_fused, p_fused, ok)
        np.testing.assert_allclose(
            float(gnorm), float(optax.global_norm(g)), rtol=1e-6
        )
    for a, b in zip(jax.tree_util.tree_leaves(p_chain), jax.tree_util.tree_leaves(p_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-7)


def test_fused_guard_skips_exactly():
    """ok=False leaves params, moments AND count bit-identical, then the
    next real step behaves as if the skipped one never happened."""
    params = _params()
    kwargs = dict(lr=1e-2, warmup_steps=0, max_n_steps=10, weight_decay=0.05, clip_grad=1.0)
    fused = build_optimizer(params, fused=True, **kwargs)
    chain = build_optimizer(params, **kwargs)

    s_fused = fused.init(params)
    nan_grads = jax.tree_util.tree_map(lambda p: jnp.full(p.shape, jnp.nan), params)
    p1, s1, _ = fused.update_with_guard(nan_grads, s_fused, params, jnp.asarray(False))
    for a, b in zip(jax.tree_util.tree_leaves((p1, s1)), jax.tree_util.tree_leaves((params, s_fused))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a real step after the skip == the chain's first step
    g = _grads(7)
    p2, s2, _ = fused.update_with_guard(g, s1, p1, jnp.asarray(True))
    updates, _ = chain.update(g, chain.init(params), params)
    p_ref = optax.apply_updates(params, updates)
    for a, b in zip(jax.tree_util.tree_leaves(p2), jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-7)
    assert int(s2.count) == 1


def test_fused_freeze_mask_zeroes_updates():
    params = _params()
    freeze = jax.tree_util.tree_map(lambda _: False, params)
    freeze["head"]["kernel"] = True
    fused = build_optimizer(
        params, lr=1e-2, warmup_steps=0, max_n_steps=10, weight_decay=0.05,
        freeze_mask=freeze, fused=True,
    )
    p1, _, _ = fused.update_with_guard(_grads(3), fused.init(params), params, jnp.asarray(True))
    np.testing.assert_array_equal(
        np.asarray(p1["head"]["kernel"]), np.asarray(params["head"]["kernel"])
    )
    assert not np.allclose(np.asarray(p1["dense"]["kernel"]), np.asarray(params["dense"]["kernel"]))


@pytest.mark.parametrize("clip_grad", [None, 0.5])
def test_accumulation_matches_fused_trajectory(clip_grad):
    """K microbatches through optax.MultiSteps(chain) == one fused-AdamW step
    on the mean gradient. This pins the path split in build_optimizer
    (train/optim.py): any ``accum_steps > 1`` config (e.g. the reference's
    flagship batch-64 recipe on < 4 chips) silently takes the MultiSteps
    chain instead of the fused optimizer — the two must walk the same
    trajectory given the same data."""
    params = _params()
    k_micro = 4
    kwargs = dict(
        lr=1e-2,
        min_lr=1e-4,
        warmup_steps=2,
        max_n_steps=10,
        weight_decay=0.05,
        clip_grad=clip_grad,
        layer_decay=0.75,
        n_blocks=1,
    )
    accum = build_optimizer(params, accum_steps=k_micro, fused=True, **kwargs)
    fused = build_optimizer(params, fused=True, **kwargs)
    # accum_steps > 1 bypasses the fused form: MultiSteps wraps the chain
    assert hasattr(fused, "update_with_guard")
    assert not hasattr(accum, "update_with_guard")

    p_accum, s_accum = params, accum.init(params)
    p_fused, s_fused = params, fused.init(params)
    for step in range(3):
        micro = [_grads(step * k_micro + i) for i in range(k_micro)]
        for g in micro:
            updates, s_accum = accum.update(g, s_accum, p_accum)
            p_accum = optax.apply_updates(p_accum, updates)
        # the jitted steps' per-microbatch loss is a batch mean, so the
        # full-batch gradient is the mean of the microbatch gradients —
        # exactly what MultiSteps accumulates
        mean_g = jax.tree_util.tree_map(lambda *gs: sum(gs) / k_micro, *micro)
        p_fused, s_fused, _ = fused.update_with_guard(
            mean_g, s_fused, p_fused, jnp.asarray(True)
        )
    for a, b in zip(jax.tree_util.tree_leaves(p_accum), jax.tree_util.tree_leaves(p_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-7)


def test_train_step_uses_fused_and_matches_chain():
    """The MAE train step produces the same params with either optimizer form."""
    from flax import linen as nn

    from cinema_tpu.train.state import TrainState, make_mae_train_step

    class _M(nn.Module):
        @nn.compact
        def __call__(self, images, mask_ratio, deterministic=True):
            x = images["sax"]
            h = nn.Dense(4)(x.reshape(x.shape[0], -1))
            loss = jnp.mean(h**2)
            return loss, {}, {}, {"loss": loss}

    model = _M()
    batch = {"sax": jnp.ones((2, 4, 4, 1))}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}, batch, 0.75
    )
    kwargs = dict(lr=1e-2, warmup_steps=0, max_n_steps=10, weight_decay=0.05, clip_grad=1.0)
    results = []
    for fused in (False, True):
        tx = build_optimizer(variables, fused=fused, **kwargs)
        state = TrainState.create(variables, tx)
        step = make_mae_train_step(model, tx, 0.75, donate=False)
        for _ in range(3):
            state, metrics = step(state, batch, jax.random.PRNGKey(0))
        results.append((jax.device_get(state.params), float(metrics["grad_norm"])))
    (p_a, n_a), (p_b, n_b) = results
    np.testing.assert_allclose(n_a, n_b, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_a), jax.tree_util.tree_leaves(p_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-7)
