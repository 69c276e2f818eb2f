"""Generic fine-tune training loop (reference: cinema/train.py:171-351).

The reference's python epoch loop (autocast, GradScaler, per-step LR
mutation, NaN skip) collapses into one jitted donated train step; this file
keeps only host-side orchestration: data loading, eval intervals, early
stopping, checkpoint retention, and metric logging (CSV/JSONL replaces
wandb, which is unavailable here).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import numpy as np

from cinema_tpu.config import Config, save_config
from cinema_tpu.data.datasets import BatchLoader, device_prefetch
from cinema_tpu.log import get_logger, init_run_dir
from cinema_tpu.parallel.mesh import batch_shardings, make_mesh
from cinema_tpu.parallel.multihost import local_data_shard_count, make_global_batch
from cinema_tpu.train.checkpoint import (
    CheckpointRetention,
    load_checkpoint,
    save_checkpoint,
    save_params_safetensors,
)
from cinema_tpu.train.optim import EarlyStopping, build_optimizer, get_n_accum_steps
from cinema_tpu.train.state import make_supervised_train_step, make_train_state

logger = get_logger(__name__)


def pick_n_data(
    n_devices: int, batch_size: int, batch_size_per_device: int, n_samples: int
) -> int:
    """Largest data-parallel width that keeps the global batch divisible.

    The reference's DDP world size is fixed by visible GPUs and the config
    must match (cinema/optim.py:122-143); here the mesh adapts instead: the
    'data' axis is the largest n <= n_devices with
    ``batch_size % (batch_size_per_device * n) == 0`` and a local batch that
    the dataset can fill (so tiny smoke datasets still train).
    """
    cap = min(n_devices, max(batch_size // batch_size_per_device, 1))
    cap = min(cap, max(n_samples // batch_size_per_device, 1))
    for n in range(cap, 0, -1):
        if batch_size % (batch_size_per_device * n) == 0:
            return n
    return 1


class MetricsLogger:
    """Append-only JSONL metrics log (wandb replacement)."""

    def __init__(self, out_dir: Path) -> None:
        self.path = Path(out_dir) / "metrics.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, metrics: Dict[str, Any]) -> None:
        record = {
            k: (float(v) if isinstance(v, (int, float, np.floating, np.integer)) or hasattr(v, "item") else v)
            for k, v in metrics.items()
        }
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")


def maybe_reduce_batch_size(config: Config, n: int) -> Config:
    """Halve the batch size until it fits the dataset (reference train.py:26-46)."""
    batch_size = config.train.batch_size
    if n >= batch_size:
        return config
    while n < batch_size:
        batch_size //= 2
    if batch_size == 0:
        raise ValueError(f"Dataset size is too small {n}.")
    logger.warning(f"Using batch size {batch_size} instead.")
    config = Config(config)
    config.train.batch_size = batch_size
    config.train.batch_size_per_device = min(config.train.batch_size_per_device, batch_size)
    return config


def maybe_subset_dataset(config: Config, train_meta_df, val_meta_df, group_col: str = ""):
    """max_n_samples cap + proportion subsampling (reference train.py:49-82)."""
    if config.data.max_n_samples > 0:
        train_ratio = min(config.data.max_n_samples / len(train_meta_df), 1.0)
        val_ratio = min(config.data.max_n_samples / len(val_meta_df), 1.0)
        if group_col:
            train_meta_df = train_meta_df.groupby(group_col).sample(frac=train_ratio, random_state=0)
            val_meta_df = val_meta_df.groupby(group_col).sample(frac=val_ratio, random_state=0)
        else:
            train_meta_df = train_meta_df.sample(frac=train_ratio, random_state=0, ignore_index=True)
            val_meta_df = val_meta_df.sample(frac=val_ratio, random_state=0, ignore_index=True)
    if config.data.proportion < 1:
        train_meta_df = train_meta_df.sample(
            n=int(config.data.proportion * len(train_meta_df)), random_state=config.seed, ignore_index=True
        )
    return train_meta_df, val_meta_df


def run_train(
    config: Config,
    load_dataset: Callable[[Config], Tuple[Any, Any]],
    get_model_fn: Callable[[Config], Any],
    loss_fn: Callable[..., Tuple[Any, Dict[str, Any]]],
    eval_dataloader_fn: Callable[..., Dict[str, float]],
    init_images_fn: Optional[Callable[[Config], Dict[str, Any]]] = None,
    load_pretrained_fn: Optional[Callable[[Any, Config], Tuple[Any, Any]]] = None,
    out_dir: Optional[Path] = None,
) -> Path:
    """Fine-tune driver (reference run_train, train.py:171-351).

    Args:
        config: task config (reference YAML schema).
        load_dataset: config -> (train_dataset, val_dataset).
        get_model_fn: config -> flax model.
        loss_fn: (model, params, batch, rng) -> (loss, metrics); jitted inside
            the train step.
        eval_dataloader_fn: (model, params, val_loader, config) -> metrics.
        init_images_fn: config -> example image dict for init (inferred from
            the first batch when None).
        load_pretrained_fn: (params, config) -> (params, freeze_mask), applied
            when config.model.ckpt_path is set.
        out_dir: run directory; defaults to config.logging.dir / timestamp.

    Returns:
        the run directory.
    """
    from cinema_tpu.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    rng = jax.random.PRNGKey(config.seed)
    train_dataset, val_dataset = load_dataset(config)
    for ds in (train_dataset, val_dataset):
        if hasattr(ds, "seed"):
            ds.seed = config.seed  # reproducible per-item augmentations
    config = maybe_reduce_batch_size(config, len(train_dataset))

    # SPMD mesh (reference fine-tuning is single-GPU, cinema/train.py:171;
    # here the loop shards over a ('data','model') mesh like pretraining)
    mesh_cfg = config.get("mesh", {})
    n_model = int(mesh_cfg.get("n_model", 1))
    n_data = mesh_cfg.get("n_data")
    if n_data is None:
        n_data = pick_n_data(
            len(jax.devices()) // n_model,
            config.train.batch_size,
            config.train.batch_size_per_device,
            len(train_dataset),
        )
    mesh = make_mesh(n_data=int(n_data), n_model=n_model)
    # per-PROCESS loader batch: only the data-rows this host owns
    local_batch = config.train.batch_size_per_device * local_data_shard_count(mesh)
    if mesh.shape["data"] * mesh.shape["model"] > 1:
        logger.info(f"mesh: data={mesh.shape['data']} model={mesh.shape['model']}")

    train_loader = BatchLoader(
        train_dataset,
        batch_size=local_batch,
        shuffle=True,
        drop_last=True,
        n_workers=config.train.get("n_workers", 4),
        seed=config.seed,
        process_shard=True,  # no-op single-process; strided shard per host
    )
    val_loader = BatchLoader(
        val_dataset, batch_size=1, shuffle=False, drop_last=False,
        n_workers=config.train.get("n_workers", 4),
    )

    n_accum_steps = get_n_accum_steps(
        batch_size=config.train.batch_size,
        batch_size_per_device=config.train.batch_size_per_device,
        world_size=mesh.shape["data"],
    )
    steps_per_epoch = max(len(train_loader) // n_accum_steps, 1)

    model = get_model_fn(config)

    # init params from the first batch's shapes (or an explicit example)
    first_batch = next(iter(BatchLoader(train_dataset, batch_size=1, n_workers=1)))
    views = [config.model.views] if isinstance(config.model.views, str) else list(config.model.views)
    if init_images_fn is not None:
        example_images = init_images_fn(config)
    else:
        import jax.numpy as jnp

        example_images = {v: jnp.asarray(first_batch[f"{v}_image"]) for v in views}

    def init_fn():
        return model.init(jax.random.PRNGKey(config.seed), example_images)

    params_template = jax.eval_shape(init_fn)
    freeze_mask = None
    pretrained = config.model.get("ckpt_path") is not None and load_pretrained_fn is not None

    def make_tx(freeze, fused=True):
        return build_optimizer(
            params_template,
            lr=config.train.lr,
            min_lr=config.train.min_lr,
            warmup_steps=config.train.n_warmup_epochs * steps_per_epoch,
            max_n_steps=config.train.n_epochs * steps_per_epoch,
            betas=tuple(config.train.betas),
            weight_decay=config.train.weight_decay,
            clip_grad=config.train.clip_grad if config.train.clip_grad > 0 else None,
            layer_decay=config.train.get("layer_decay") if pretrained else None,
            n_blocks=getattr(model, "enc_depth", 0),
            freeze_mask=freeze,
            accum_steps=n_accum_steps,
            fused=fused,
        )

    tx = make_tx(None)
    fsdp = bool(mesh_cfg.get("fsdp", False))
    state, state_shardings = make_train_state(init_fn, tx, mesh, fsdp=fsdp)
    frozen = False
    if pretrained:
        new_params, freeze_mask = load_pretrained_fn(state.params, config)
        # restore the mesh placement (loaded params are host/uncommitted)
        new_params = jax.device_put(new_params, state_shardings.params)
        state = state.replace(params=new_params)
        if config.model.get("freeze_pretrained") and freeze_mask is not None:
            # rebuild optimizer with the freeze mask applied
            frozen = True
            tx = make_tx(freeze_mask)
            abstract_opt = jax.eval_shape(tx.init, state.params)
            from cinema_tpu.parallel.mesh import param_shardings

            opt_shardings = param_shardings(abstract_opt, mesh, fsdp=fsdp)
            state = state.replace(
                opt_state=jax.jit(tx.init, out_shardings=opt_shardings)(state.params)
            )
            state_shardings = state_shardings.replace(opt_state=opt_shardings)

    # run dir + run.json (tags + flattened config — the reference's wandb
    # run record, log.py:45-76/train.py:243-257)
    # resume an interrupted fine-tune (beyond the reference, whose run_train
    # cannot resume — cinema/train.py:171-351): the full train state restores
    # sharded onto the current mesh; early-stopping best/patience restore
    # from the checkpoint's meta sidecar so the saved best stays monotone
    early_stop = EarlyStopping(
        min_delta=config.train.early_stopping.min_delta,
        patience=config.train.early_stopping.patience,
    )
    start_epoch = 0
    resumed_meta = False
    if config.train.get("resume_path"):
        resume = Path(config.train.resume_path)
        if not resume.exists():
            # don't let the layout fallback below mislabel a missing path
            raise FileNotFoundError(f"train.resume_path {resume} does not exist.")
        try:
            state = load_checkpoint(resume, state, shardings=state_shardings)
        except (ValueError, KeyError, TypeError) as e:
            # checkpoints written before the fused AdamW (round 4) hold the
            # optax chain's opt_state tuple, which fails orbax structure
            # matching against FusedAdamWState — fall back to the chain
            # optimizer for this run (same update semantics, see
            # train/fused_optim.py; only the state layout differs). Orbax
            # reports the mismatch as ValueError/KeyError/TypeError; IO-level
            # failures (truncated/corrupt checkpoints) propagate unchanged.
            logger.warning(
                f"Checkpoint {resume} does not match the fused-AdamW state "
                f"layout ({type(e).__name__}: {str(e)[:200]}); retrying with "
                "the optax chain optimizer."
            )
            tx = make_tx(freeze_mask if frozen else None, fused=False)
            state, state_shardings = make_train_state(init_fn, tx, mesh, fsdp=fsdp)
            state = load_checkpoint(resume, state, shardings=state_shardings)
        start_epoch = int(state.step) // steps_per_epoch
        meta_path = resume.parent / f"{resume.name}.meta.json"
        if meta_path.exists():
            early_stop.load_state_dict(json.loads(meta_path.read_text()))
            resumed_meta = True
        logger.info(
            f"Resumed from {resume} at epoch {start_epoch}"
            + (f" (best={early_stop.best_metric:.4f})" if resumed_meta else "")
            + "."
        )

    step_fn = make_supervised_train_step(
        model, tx, loss_fn, mesh=mesh, state_shardings=state_shardings, donate=True
    )

    out_dir = init_run_dir(config, out_dir=out_dir)
    save_config(config, out_dir / "config.yaml")
    metrics_logger = MetricsLogger(out_dir)

    retention = CheckpointRetention(config.train.max_n_ckpts)
    saved_any = False
    first_step = True

    import jax.numpy as jnp

    for epoch in range(start_epoch, config.train.n_epochs):
        epoch_metrics: Dict[str, list] = {}

        def put(batch):
            # single-process: device_put; multi-host: global array assembled
            # from each process's local rows (parallel/multihost.py)
            arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
            return make_global_batch(arrays, batch_shardings(arrays, mesh))

        for device_batch in device_prefetch(iter(train_loader), put, depth=2):
            if first_step:
                # AOT executable cache: relaunches/sweeps of the same config
                # load the serialized step instead of recompiling (minutes)
                from cinema_tpu.aot_cache import aot_or_jit

                step_fn = aot_or_jit(step_fn, state, device_batch, rng)
                first_step = False
            state, metrics = step_fn(state, device_batch, rng)
            for k, v in metrics.items():
                epoch_metrics.setdefault(k, []).append(v)
        logged = {f"train_{k}": float(np.mean([float(x) for x in v])) for k, v in epoch_metrics.items()}
        logged.update({"epoch": epoch, "n_samples": int(state.n_samples)})
        metrics_logger.log(logged)

        if (epoch + 1) % config.train.eval_interval != 0:
            continue

        val_metrics = eval_dataloader_fn(model, state.params, val_loader, config)
        val_metrics = {f"val_{k}": v for k, v in val_metrics.items()}
        val_metrics["epoch"] = epoch
        metrics_logger.log(val_metrics)
        logger.info(f"epoch {epoch}: " + ", ".join(f"{k}={v:.4f}" for k, v in val_metrics.items() if isinstance(v, float)))

        early_metric = val_metrics[config.train.early_stopping.metric]
        if config.train.early_stopping.mode == "max":
            early_metric = -early_metric
        early_stop.update(early_metric)

        # the first eval of a FRESH run always checkpoints (the reference's
        # epoch-0 save, cinema/train.py:335-342) — otherwise a run whose
        # eval metric is NaN at every epoch would never save anything
        # (NaN < inf - delta is False, so has_improved never fires)
        if early_stop.has_improved or not (saved_any or resumed_meta):
            saved_any = True
            path = save_checkpoint(out_dir, state, epoch)
            # meta sidecar: early-stopping state for monotone saved-best
            # across a resume (the reference cannot resume fine-tunes at all)
            (path.parent / f"{path.name}.meta.json").write_text(
                json.dumps({**early_stop.state_dict(), "epoch": epoch})
            )
            save_params_safetensors(state.params, out_dir / f"model_{epoch}.safetensors")
            retention.add(path, epoch)
            logger.info(f"Saved checkpoint of epoch {epoch} at {path}.")
        if early_stop.should_stop:
            logger.info("Met early stopping criteria, breaking.")
            break
    return out_dir
