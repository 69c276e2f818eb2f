"""Train state and jitted distributed train steps.

One jitted, donated train step replaces the reference's python-side epoch
loop body (autocast + GradScaler + clip + step, reference train.py:85-168):
under SPMD the gradient all-reduce over the 'data' mesh axis is emitted by
XLA, and NaN-loss skipping (reference train.py:138-140) is a jnp.where on
the updates — no host round-trip.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from cinema_tpu.parallel.mesh import param_shardings


def train_apply(
    model: Any,
    variables: Any,
    image_dict: Dict[str, jnp.ndarray],
    rng: jax.Array,
    **kwargs: Any,
) -> Tuple[Any, Dict[str, Any]]:
    """Forward in train mode, threading mutable collections.

    ``variables`` is the full flax variable dict ({'params': ...} plus e.g.
    'batch_stats' for BatchNorm models like the ResNet baselines, reference
    cinema/resnet.py:175-315). Returns (output, updated_collections) where
    the second element is {} for purely-functional models, so loss fns can
    report it unconditionally.
    """
    mutable = [k for k in variables if k != "params"]
    if mutable:
        out, new_state = model.apply(
            variables, image_dict, deterministic=False,
            rngs={"dropout": rng}, mutable=mutable, **kwargs,
        )
        return out, dict(new_state)
    out = model.apply(
        variables, image_dict, deterministic=False, rngs={"dropout": rng}, **kwargs
    )
    return out, {}


class TrainState(struct.PyTreeNode):
    """Model params + optimizer state + step counter."""

    step: jnp.ndarray
    params: Any
    opt_state: Any
    n_samples: jnp.ndarray

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            n_samples=jnp.zeros((), jnp.int32),
        )


def make_train_state(
    init_fn: Callable[[], Any],
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    fsdp: bool = False,
) -> Tuple[TrainState, Any]:
    """Create a TrainState with jitted init (fast on TPU) and optional sharding.

    Shardings for the WHOLE state (params + Adam moments) come from one
    path-based rule — the moments' tree paths end with the same param path
    suffixes, so the TP rules apply uniformly.

    Args:
        init_fn: zero-arg function returning the param tree.
        tx: optax transformation.
        mesh: if given, state gets TP shardings over the 'model' axis.
        fsdp: additionally shard replicated large params + optimizer state
            over the 'data' axis (ZeRO-3-style; see parallel/mesh.py).

    Returns:
        (state, state_shardings or None).
    """

    def init_state() -> TrainState:
        return TrainState.create(init_fn(), tx)

    if mesh is None:
        return jax.jit(init_state)(), None

    abstract = jax.eval_shape(init_state)
    state_shardings = param_shardings(abstract, mesh, fsdp=fsdp)
    state = jax.jit(init_state, out_shardings=state_shardings)()
    return state, state_shardings


def make_mae_train_step(
    model: Any,
    tx: optax.GradientTransformation,
    enc_mask_ratio: float,
    mesh: Optional[Mesh] = None,
    state_shardings: Optional[Any] = None,
    donate: bool = True,
) -> Callable[[TrainState, Dict[str, jnp.ndarray], jax.Array], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jitted MAE pretrain step.

    The step: forward (bf16 compute), grads, NaN-skip, optax update.
    Under a mesh, batches shard over 'data' and XLA reduces grads over ICI.
    """

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            loss, _preds, _masks, metrics = model.apply(
                params, batch, enc_mask_ratio, rngs={"mask": rng}, deterministic=False
            )
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        ok = jnp.isfinite(loss)
        metrics = dict(metrics)
        if hasattr(tx, "update_with_guard"):
            # fused AdamW: clip + moments + decay + NaN guard in one pass
            # per leaf (train/fused_optim.py) — no tree-wide selects, no
            # second global-norm pass for the metric
            new_params, new_opt_state, gnorm = tx.update_with_guard(
                grads, state.opt_state, state.params, ok
            )
            metrics["grad_norm"] = gnorm
        else:
            updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)

            # NaN-loss skip (reference train.py:138-140): keep old state
            new_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old), new_params, state.params
            )
            new_opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old), new_opt_state, state.opt_state
            )
            metrics["grad_norm"] = optax.global_norm(grads)
        batch_size = next(iter(batch.values())).shape[0]
        metrics["skipped_nan"] = (~ok).astype(jnp.float32)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            n_samples=state.n_samples + batch_size,
        )
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    return jax.jit(
        step_fn,
        in_shardings=(state_shardings, None, None),
        out_shardings=(state_shardings, None),
        donate_argnums=(0,) if donate else (),
    )


def make_supervised_train_step(
    model: Any,
    tx: optax.GradientTransformation,
    loss_fn: Callable[..., Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]],
    mesh: Optional[Mesh] = None,
    state_shardings: Optional[Any] = None,
    donate: bool = True,
) -> Callable:
    """Generic supervised train step.

    ``loss_fn(model, variables, batch, rng) -> (loss, (metrics, model_state))``
    where ``model_state`` holds updated non-param collections (BatchNorm
    running stats) or {}. Those collections ride inside ``state.params`` (the
    full variable dict); their loss gradient is identically zero (train-mode
    BatchNorm uses batch statistics) and the forward-pass updates overwrite
    them after the optimizer step, so optimizer state over those leaves is
    inert.
    """

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)

        def wrapped(params):
            return loss_fn(model, params, batch, rng)

        (loss, (metrics, model_state)), grads = jax.value_and_grad(wrapped, has_aux=True)(
            state.params
        )
        ok = jnp.isfinite(loss)
        metrics = dict(metrics)
        if hasattr(tx, "update_with_guard"):
            new_params, new_opt_state, gnorm = tx.update_with_guard(
                grads, state.opt_state, state.params, ok
            )
            metrics["grad_norm"] = gnorm
            if model_state:
                # non-param collections (BatchNorm stats) also revert on a
                # guarded step, matching the generic path's tree-wide select
                old = {k: state.params[k] for k in model_state}
                reverted = jax.tree_util.tree_map(
                    lambda new, o: jnp.where(ok, new, o), dict(model_state), old
                )
                new_params = {**new_params, **reverted}
        else:
            updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            if model_state:
                new_params = {**new_params, **model_state}
            new_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old), new_params, state.params
            )
            new_opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old), new_opt_state, state.opt_state
            )
            metrics["grad_norm"] = optax.global_norm(grads)
        first = next(iter(batch.values()))
        metrics["skipped_nan"] = (~ok).astype(jnp.float32)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            n_samples=state.n_samples + first.shape[0],
        )
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())
    return jax.jit(
        step_fn,
        in_shardings=(state_shardings, None, None),
        out_shardings=(state_shardings, None),
        donate_argnums=(0,) if donate else (),
    )
