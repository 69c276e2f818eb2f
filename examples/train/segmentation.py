"""Self-contained SAX segmentation fine-tune tutorial.

The reference ships a minimalist torch loop for this (reference
cinema/examples/train/segmentation.py: Dataset + AMP/GradScaler epoch loop +
dice eval + safetensors export). This is the same tutorial for the TPU
stack, showing the raw JAX loop the `run_train` harness automates:

    datasets/loader -> ONE jitted, donated train step (grads + AdamW update
    + NaN-skip, all on device) -> per-epoch Dice eval -> early stopping ->
    safetensors export.

Library pieces (models, losses, transforms) are imported; everything the
harness would do — the train state, the step, the epoch loop, eval, early
stopping, checkpointing — is written out inline so it can be copied and
edited freely.

Run on processed ACDC data (see `acdc_preprocess`); pass --mae_ckpt to
start from pretrained MAE weights (safetensors, as published), matching
the reference tutorial's `ConvUNetR.from_pretrained` transfer:
    python examples/train/segmentation.py --data_dir ~/.cache/cinema_datasets/acdc/processed
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
from cinema_tpu.data.datasets import BatchLoader, EDESSegmentationDataset
from cinema_tpu.data.transforms import get_segmentation_transforms
from cinema_tpu.factory import get_segmentation_model, init_params
from cinema_tpu.inference import sliding_window_forward
from cinema_tpu.losses import segmentation_loss
from cinema_tpu.metrics import dice_score, hausdorff_distance_95, one_hot
from cinema_tpu.train.checkpoint import save_params_safetensors
from cinema_tpu.train.optim import build_optimizer

CONFIG = Path(__file__).parents[2] / "cinema_tpu" / "configs" / "segmentation" / "acdc.yaml"


def get_datasets(config):
    """Stratified split: 2 validation patients per pathology (reference ACDC recipe)."""
    data_dir = Path(config.data.dir).expanduser()
    meta_df = pd.read_csv(data_dir / "train_metadata.csv")
    val_pids = meta_df.groupby("pathology").sample(n=2, random_state=0)["pid"].tolist()
    train_tf, val_tf = get_segmentation_transforms(config)
    make = lambda df, tf: EDESSegmentationDataset(  # noqa: E731
        data_dir=data_dir / "train", meta_df=df.reset_index(drop=True), views="sax", transform=tf
    )
    return (
        make(meta_df[~meta_df["pid"].isin(val_pids)], train_tf),
        make(meta_df[meta_df["pid"].isin(val_pids)], val_tf),
    )


def make_train_step(model, tx):
    """The jitted training step: loss -> grads -> AdamW update -> NaN-skip.

    `donate_argnums=(0, 1)` lets XLA update params/optimizer state in place
    (no HBM copy per step); the NaN guard keeps the old state when a batch
    produces a non-finite loss (the reference skips such steps host-side).
    """

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch, rng):
        def loss_fn(p):
            logits = model.apply(
                p, {"sax": batch["sax_image"]}, deterministic=False, rngs={"dropout": rng}
            )["sax"]
            return segmentation_loss(logits, batch["sax_label"])

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


def make_eval_step(model, patch_size, n_classes):
    """Sliding-window eval: argmax labels -> per-class Dice.

    Studies whose z extends past the training patch are covered by
    overlapping patches batched into ONE forward (the reference loops them
    serially at batch 1, and its tutorial forwards the whole off-size volume
    — which a static-shape TPU model does not do). One compilation per
    distinct padded study shape."""

    @jax.jit
    def step(params, image, label):
        logits = sliding_window_forward(
            lambda imgs: model.apply(params, imgs), {"sax": image}, {"sax": patch_size}, "softmax"
        )["sax"]
        pred = jnp.argmax(logits, axis=-1)
        return dice_score(one_hot(pred, n_classes), one_hot(label, n_classes)), pred

    return step


def run(config, n_epochs: int) -> None:
    train_ds, val_ds = get_datasets(config)
    batch_size = int(config.train.batch_size_per_device)
    train_loader = BatchLoader(train_ds, batch_size, shuffle=True, drop_last=True, seed=0)
    val_loader = BatchLoader(val_ds, 1)
    steps_per_epoch = max(1, len(train_ds) // batch_size)

    model = get_segmentation_model(config, dtype=jnp.bfloat16)
    params = init_params(model)
    if config.model.ckpt_path:
        # MAE -> ConvUNetR transfer with the reference's key surgery
        # (drop decoder/mask keys, channel inflation, strict accounting)
        from cinema_tpu.bridge.torch_loader import load_pretrain_weights
        from cinema_tpu.factory import load_safetensors

        state_dict = load_safetensors(Path(config.model.ckpt_path).expanduser())
        params, loaded = load_pretrain_weights(params, "sax", state_dict)
        print(f"loaded {len(loaded)} pretrained tensors")
    tx = build_optimizer(
        jax.eval_shape(lambda: params),
        lr=float(config.train.lr),
        min_lr=float(config.train.min_lr),
        warmup_steps=int(config.train.n_warmup_epochs) * steps_per_epoch,
        max_n_steps=n_epochs * steps_per_epoch,
        weight_decay=float(config.train.weight_decay),
        clip_grad=float(config.train.clip_grad),
        layer_decay=float(config.train.layer_decay),
        n_blocks=model.enc_depth,
    )
    opt_state = jax.jit(tx.init)(params)
    train_step = make_train_step(model, tx)
    eval_step = make_eval_step(
        model, tuple(config.data.sax.patch_size), int(config.model.out_chans)
    )

    out_dir = Path(config.logging.dir).expanduser()
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = jax.random.PRNGKey(0)
    best, patience_left = -np.inf, int(config.train.early_stopping.patience)
    for epoch in range(n_epochs):
        losses = []
        for batch in train_loader:
            rng, step_rng = jax.random.split(rng)
            device_batch = {
                "sax_image": jnp.asarray(batch["sax_image"]),
                "sax_label": jnp.asarray(batch["sax_label"].astype(np.int32)),
            }
            params, opt_state, metrics = train_step(params, opt_state, device_batch, step_rng)
            losses.append(metrics["loss"])
        print(f"epoch {epoch}: train loss {np.mean(jax.device_get(losses)):.4f}")

        if (epoch + 1) % int(config.train.eval_interval) and epoch + 1 != n_epochs:
            continue
        dices, hds = [], []
        n_classes = int(config.model.out_chans)
        spacing = tuple(config.data.sax.spacing)
        for batch in val_loader:
            label = jnp.asarray(batch["sax_label"].astype(np.int32))
            d, pred = eval_step(params, jnp.asarray(batch["sax_image"]), label)
            dices.append(np.nanmean(jax.device_get(d)[:, 1:]))  # foreground classes
            hd = hausdorff_distance_95(  # host-side, like MONAI's
                np.asarray(one_hot(pred, n_classes)),
                np.asarray(one_hot(label, n_classes)),
                spacing=spacing,
            )  # (batch, n_classes - 1): foreground classes only
            hds.append(np.nanmean(hd))
        mean_dice = float(np.mean(dices))
        print(
            f"epoch {epoch}: val mean foreground dice {mean_dice:.4f}, "
            f"HD95 {np.nanmean(hds):.2f} mm"
        )
        if mean_dice > best + float(config.train.early_stopping.min_delta):
            best, patience_left = mean_dice, int(config.train.early_stopping.patience)
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
    parser.add_argument("--mae_ckpt", type=Path, default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args()
    overrides = [f"data.dir={args.data_dir}", *args.overrides]
    if args.mae_ckpt:
        overrides.append(f"model.ckpt_path={args.mae_ckpt}")
    config = apply_overrides(load_config(CONFIG), overrides)
    run(config, args.n_epochs)


if __name__ == "__main__":
    main()
