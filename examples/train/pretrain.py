"""Self-contained MAE pretraining tutorial.

TPU counterpart of the reference's minimalist torch loop (reference
cinema/examples/train/pretrain.py: glob 4D SAX NIfTIs, random frame per
item, masked-autoencoder loss, AMP epoch loop). The raw JAX loop the
`ukb_mae_pretrain` task automates is written out inline: frame-seek
dataset -> ONE jitted, donated MAE train step (mask sampling on device,
grads + AdamW update + NaN-skip) -> checkpoint.

Run on a directory of studies (`<pid>/<pid>_sax_t.nii.gz` 4D volumes, see
`ukb_dicom_preprocess` / `examples/cine_cmr.py`):
    python examples/train/pretrain.py --data_dir /path/to/processed
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))  # repo root, for non-installed use

import argparse
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from cinema_tpu.config import apply_overrides, load_config
from cinema_tpu.data.datasets import BatchLoader, UKBCineDataset
from cinema_tpu.data.transforms import get_pretrain_transforms
from cinema_tpu.factory import get_mae_model
from cinema_tpu.tasks.pretrain import scan_manifest
from cinema_tpu.train.checkpoint import save_params_safetensors
from cinema_tpu.train.optim import build_optimizer

CONFIG = Path(__file__).parents[2] / "cinema_tpu" / "configs" / "mae.yaml"


def make_train_step(model, tx, mask_ratio: float):
    """Jitted MAE step: on-device random masking, masked-patch MSE, grads,
    AdamW update, NaN-skip — the body `ukb_mae_pretrain` runs under SPMD."""

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, rng):
        def loss_fn(p):
            loss, _preds, _masks, metrics = model.apply(
                p, batch, mask_ratio, rngs={"mask": rng}, deterministic=False
            )
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        ok = jnp.isfinite(loss)
        keep = lambda new, old: jnp.where(ok, new, old)  # noqa: E731
        return (
            jax.tree_util.tree_map(keep, new_params, params),
            jax.tree_util.tree_map(keep, new_opt_state, opt_state),
            metrics,
        )

    return step


def run(config, n_epochs: int) -> None:
    views = list(config.model.views)
    data_dir = Path(config.data.dir).expanduser()
    pids = scan_manifest(data_dir, views)
    if not pids:
        raise ValueError(f"No studies with views {views} found under {data_dir}.")
    print(f"found {len(pids)} studies")

    dataset = UKBCineDataset(
        data_dir, pids, views=views, transform=get_pretrain_transforms(config), seed=0
    )
    batch_size = int(config.train.batch_size_per_device)
    loader = BatchLoader(dataset, batch_size, shuffle=True, drop_last=True, seed=0)
    steps_per_epoch = max(1, len(dataset) // batch_size)

    model = get_mae_model(config, dtype=jnp.bfloat16)
    example = {
        v: jnp.zeros((1, *model.image_size_dict[v], model.in_chans_dict[v]), jnp.float32)
        for v in views
    }
    params = jax.jit(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
            example,
            float(config.train.enc_mask_ratio),
        )
    )()
    tx = build_optimizer(
        jax.eval_shape(lambda: params),
        lr=float(config.train.lr),
        min_lr=float(config.train.min_lr),
        warmup_steps=int(config.train.n_warmup_epochs) * steps_per_epoch,
        max_n_steps=n_epochs * steps_per_epoch,
        weight_decay=float(config.train.weight_decay),
        clip_grad=float(config.train.clip_grad),
    )
    opt_state = jax.jit(tx.init)(params)
    step = make_train_step(model, tx, float(config.train.enc_mask_ratio))

    out_dir = Path(config.logging.dir).expanduser()
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = jax.random.PRNGKey(0)
    for epoch in range(n_epochs):
        losses = []
        for batch in loader:
            rng, step_rng = jax.random.split(rng)
            device_batch = {v: jnp.asarray(batch[v]) for v in views}
            params, opt_state, metrics = step(params, opt_state, device_batch, step_rng)
            losses.append(metrics["loss"])
        print(f"epoch {epoch}: train loss {np.mean(jax.device_get(losses)):.4f}")
        save_params_safetensors(params, out_dir / "last.safetensors")
    print(f"saved {out_dir / 'last.safetensors'}")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", required=True, type=Path)
    parser.add_argument("--n_epochs", type=int, default=10)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()
    config = apply_overrides(load_config(CONFIG), [f"data.dir={args.data_dir}", *args.overrides])
    run(config, args.n_epochs)


if __name__ == "__main__":
    main()
