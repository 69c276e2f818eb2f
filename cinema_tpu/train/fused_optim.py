"""Single-pass fused AdamW with the NaN-step guard folded in.

The generic optax chain (clip -> adam -> weight decay -> scale trees -> lr)
plus the step's tree-wide ``jnp.where(ok, new, old)`` NaN guard costs ~14
ms/step of f32 state traffic on a ViT-base MAE step (v5e profile, round 3):
the chain materializes intermediate update trees between stages, the guard
re-reads params + both moments, and the clip's global norm is computed
twice (once for clipping, once for the grad_norm metric).

This transformation computes, per leaf, in ONE fused expression (one HBM
read of grad/param/mu/nu, one write of param/mu/nu — the roofline for any
AdamW step):

    g'  = where(ok, g * min(1, clip/||g||), 0)      # clip + NaN sanitize
    mu' = mu + (1-b1) * (g'  - okf * mu)            # == b1*mu+(1-b1)*g if ok else mu
    nu' = nu + (1-b2) * (g'^2 - okf * nu)
    p'  = p - okf * lr_t * scale_leaf * (mu_hat/(sqrt(nu_hat)+eps) + wd*p)

``okf`` in {0,1} makes the no-step branch exact: moments and params are
bit-identical to the skipped step (reference train.py:138-140 semantics),
and the step count only advances on real updates so Adam bias correction
and the LR schedule see the same history as the reference.

The state layout mirrors ``optax.scale_by_adam`` (count/mu/nu) so the
path-suffix sharding rules and orbax checkpointing apply to NEW checkpoints
unchanged. Checkpoints written with the optax chain (pre round 4, or any
``accum_steps > 1`` config — see ``build_optimizer``) hold the chain's
state tuple instead and fail orbax structure matching against
``FusedAdamWState``; ``train/loop.py`` detects this on resume and falls
back to the chain optimizer for that run (identical update semantics,
pinned by tests/test_fused_optim.py).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


class FusedAdamWState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


class FusedAdamW(NamedTuple):
    """AdamW folded into one per-leaf pass; exposes optax-style ``init`` plus
    ``update_with_guard`` (the train steps detect this attribute and skip
    their tree-wide NaN-guard selects)."""

    init: Callable[[Any], FusedAdamWState]
    update_with_guard: Callable[..., Tuple[Any, FusedAdamWState, jnp.ndarray]]


def fused_adamw(
    schedule: Callable[[jnp.ndarray], jnp.ndarray],
    b1: float = 0.9,
    b2: float = 0.95,
    eps: float = 1e-8,
    weight_decay: float = 0.05,
    wd_mask: Optional[Any] = None,
    clip_grad: Optional[float] = None,
    scale_tree: Optional[Any] = None,
) -> FusedAdamW:
    """Build the fused transformation.

    Args:
        schedule: step -> learning rate.
        b1/b2/eps: Adam parameters.
        weight_decay: decoupled decay; applied where ``wd_mask`` is True.
        wd_mask: boolean tree (None = all leaves with ndim > 1 at init).
        clip_grad: global-norm clip (None/<=0 disables).
        scale_tree: static per-leaf LR scale (layer decay x freeze), or None.

    Returns:
        FusedAdamW with ``init(params)`` and
        ``update_with_guard(grads, state, params, ok) ->
        (new_params, new_state, grad_norm)``.
    """

    def init(params: Any) -> FusedAdamWState:
        return FusedAdamWState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update_with_guard(
        grads: Any, state: FusedAdamWState, params: Any, ok: jnp.ndarray
    ) -> Tuple[Any, FusedAdamWState, jnp.ndarray]:
        okf = ok.astype(jnp.float32)
        gnorm = optax.global_norm(grads)
        # one norm pass serves both the clip and the grad_norm metric; the
        # NaN sanitize rides the same scalar multiply
        cscale = okf
        if clip_grad is not None and clip_grad > 0:
            cscale = cscale * jnp.minimum(1.0, clip_grad / jnp.maximum(gnorm, 1e-12))
        # count/LR semantics match the optax chain exactly: the LR schedule
        # is evaluated at the PRE-increment count (optax.scale_by_schedule)
        # and Adam bias correction at the post-increment count
        # (optax.scale_by_adam); a guarded step leaves count untouched.
        count = state.count + ok.astype(state.count.dtype)
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1**jnp.maximum(c, 1.0)
        bc2 = 1.0 - b2**jnp.maximum(c, 1.0)
        lr_t = jnp.asarray(schedule(state.count), jnp.float32)

        mask = wd_mask
        if mask is None:
            mask = jax.tree_util.tree_map(lambda p: p.ndim > 1, params)
        scales = scale_tree
        if scales is None:
            scales = jax.tree_util.tree_map(lambda _: 1.0, params)

        def leaf(p, g, mu, nu, use_wd, s):
            g = g.astype(jnp.float32)
            # where(ok, ...) sanitizes NaN grads that 0 * NaN would keep
            gc = jnp.where(ok, g * cscale, 0.0)
            new_mu = mu + (1.0 - b1) * (gc - okf * mu)
            new_nu = nu + (1.0 - b2) * (jnp.square(gc) - okf * nu)
            update = (new_mu / bc1) / (jnp.sqrt(new_nu / bc2) + eps)
            if use_wd and weight_decay:
                update = update + weight_decay * p
            new_p = p - (okf * lr_t * s) * update
            return new_p.astype(p.dtype), new_mu, new_nu

        leaves_p, tdef = jax.tree_util.tree_flatten(params)
        leaves_g = tdef.flatten_up_to(grads)
        leaves_mu = tdef.flatten_up_to(state.mu)
        leaves_nu = tdef.flatten_up_to(state.nu)
        leaves_wd = tdef.flatten_up_to(mask)
        leaves_s = tdef.flatten_up_to(scales)
        out = [
            leaf(p, g, mu, nu, w, s)
            for p, g, mu, nu, w, s in zip(
                leaves_p, leaves_g, leaves_mu, leaves_nu, leaves_wd, leaves_s
            )
        ]
        new_params = jax.tree_util.tree_unflatten(tdef, [o[0] for o in out])
        new_mu = jax.tree_util.tree_unflatten(tdef, [o[1] for o in out])
        new_nu = jax.tree_util.tree_unflatten(tdef, [o[2] for o in out])
        return new_params, FusedAdamWState(count, new_mu, new_nu), gnorm

    return FusedAdamW(init=init, update_with_guard=update_with_guard)
