"""Self-contained ejection-fraction regression fine-tune tutorial.

TPU counterpart of the reference's minimalist torch loop (reference
cinema/examples/train/regression.py): ED+ES frames stacked as 2 channels
into a ConvViT with a 1-unit head, MSE on z-normalised targets, MAE-based
early stopping. The raw JAX loop the `run_train` harness automates is
written out inline: ONE jitted, donated train step, per-epoch eval with
patch-mean forwards, early stopping, safetensors export.

Run on processed ACDC data (see `acdc_preprocess`):
    python examples/train/regression.py --data_dir ~/.cache/cinema_datasets/acdc/processed
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
import pandas as pd

from cinema_tpu.config import apply_overrides, load_config
from cinema_tpu.data.datasets import BatchLoader, EDESRegressionDataset
from cinema_tpu.data.transforms import get_segmentation_transforms
from cinema_tpu.losses import regression_loss
from cinema_tpu.tasks.regression import get_regression_model, regression_forward
from cinema_tpu.train.checkpoint import save_params_safetensors
from cinema_tpu.train.optim import build_optimizer

CONFIG = Path(__file__).parents[2] / "cinema_tpu" / "configs" / "regression" / "acdc.yaml"


def get_datasets(config):
    data_dir = Path(config.data.dir).expanduser()
    reg_col = config.data.regression_column
    meta_df = pd.read_csv(data_dir / "train_metadata.csv")
    val_pids = meta_df.sample(n=min(10, len(meta_df) // 3), random_state=0)["pid"].tolist()
    train_tf, val_tf = get_segmentation_transforms(config)
    make = lambda df, tf: EDESRegressionDataset(  # noqa: E731
        data_dir=data_dir / "train", meta_df=df.reset_index(drop=True), reg_col=reg_col,
        reg_mean=float(config.data[reg_col]["mean"]), reg_std=float(config.data[reg_col]["std"]),
        views="sax", transform=tf,
    )
    return (
        make(meta_df[~meta_df["pid"].isin(val_pids)], train_tf),
        make(meta_df[meta_df["pid"].isin(val_pids)], val_tf),
    )


def make_train_step(model, tx):
    """Jitted training step: MSE -> grads -> AdamW update -> NaN-skip."""

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, rng):
        def loss_fn(p):
            preds = model.apply(
                p, {"sax": batch["sax_image"]}, deterministic=False, rngs={"dropout": rng}
            )
            return regression_loss(preds[:, 0], batch["label"])

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
    train_ds, val_ds = get_datasets(config)
    batch_size = int(config.train.batch_size_per_device)
    train_loader = BatchLoader(train_ds, batch_size, shuffle=True, drop_last=True, seed=0)
    val_loader = BatchLoader(val_ds, 1)
    steps_per_epoch = max(1, len(train_ds) // batch_size)

    model = get_regression_model(config, dtype=jnp.bfloat16)
    # ED+ES are stacked as channels: init with n_frames*in_chans channels
    example = {
        v: jnp.zeros(
            (1, *model.image_size_dict[v], model.n_frames * model.in_chans_dict[v]),
            jnp.float32,
        )
        for v in model.views
    }
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(0), example))()
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
    train_step = make_train_step(model, tx)
    patch_size = {"sax": tuple(config.data.sax.patch_size)}
    eval_forward = jax.jit(
        lambda p, images: regression_forward(
            lambda pp, imgs: model.apply(pp, imgs), p, images, patch_size
        )
    )

    reg_col = config.data.regression_column
    reg_std = float(config.data[reg_col]["std"])
    out_dir = Path(config.logging.dir).expanduser()
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = jax.random.PRNGKey(0)
    best, patience_left = np.inf, int(config.train.early_stopping.patience)
    for epoch in range(n_epochs):
        losses = []
        for batch in train_loader:
            rng, step_rng = jax.random.split(rng)
            device_batch = {
                "sax_image": jnp.asarray(batch["sax_image"]),
                "label": jnp.asarray(batch["label"].astype(np.float32)),
            }
            params, opt_state, metrics = train_step(params, opt_state, device_batch, step_rng)
            losses.append(metrics["loss"])
        print(f"epoch {epoch}: train loss {np.mean(jax.device_get(losses)):.4f}")

        if (epoch + 1) % int(config.train.eval_interval) and epoch + 1 != n_epochs:
            continue
        errs = []
        for batch in val_loader:
            preds = eval_forward(params, {"sax": jnp.asarray(batch["sax_image"])})
            errs.append(abs(float(np.asarray(preds).reshape(-1)[0]) - float(batch["label"][0])))
        mae = float(np.mean(errs)) * reg_std  # denormalised MAE
        print(f"epoch {epoch}: val MAE {mae:.4f} ({reg_col} units)")
        if mae < best - float(config.train.early_stopping.min_delta):
            best, patience_left = mae, int(config.train.early_stopping.patience)
            save_params_safetensors(params, out_dir / "best.safetensors")
            print(f"  saved {out_dir / 'best.safetensors'}")
        else:
            patience_left -= 1
            if patience_left <= 0:
                print("early stop")
                break


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
