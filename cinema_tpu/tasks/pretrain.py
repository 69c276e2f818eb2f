"""UKB MAE pretraining entry point (reference: cinema/mae/pretrain.py).

TPU-native: single-process SPMD over a ('data','model') mesh replaces
mp.spawn + DDP/NCCL (reference pretrain.py:434-448); mask sampling, the
masked forward, grads, and the AdamW update are one jitted donated step;
gradient reduction is emitted by XLA over ICI. Per-host input pipelines
stream one random cine frame per study via NIfTI frame-seek reads.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from cinema_tpu.config import Config
from cinema_tpu.data.datasets import BatchLoader, UKBCineDataset, device_prefetch
from cinema_tpu.data.transforms import get_pretrain_transforms
from cinema_tpu.factory import get_mae_model
from cinema_tpu.log import get_logger, init_run_dir
from cinema_tpu.parallel.mesh import batch_shardings, make_mesh
from cinema_tpu.parallel.multihost import (
    local_data_shard_count,
    make_global_batch,
    maybe_initialize_distributed,
    shard_manifest,
)
from cinema_tpu.tasks.cli import task_main
from cinema_tpu.train.checkpoint import (
    CheckpointRetention,
    load_checkpoint,
    save_checkpoint,
    save_params_safetensors,
)
from cinema_tpu.train.loop import MetricsLogger
from cinema_tpu.train.optim import build_optimizer, get_n_accum_steps
from cinema_tpu.train.state import make_mae_train_step, make_train_state

logger = get_logger(__name__)

DEFAULT_CONFIG = Path(__file__).parents[1] / "configs" / "mae.yaml"


def scan_manifest(data_dir: Path, views: List[str], rescan: bool = False) -> List[str]:
    """Find study dirs containing all views' 4D NIfTIs, with a JSON cache
    (reference pretrain.py:49-85 caches its 70k-study scan to
    manifest_paths.json; rescanning the tree per launch is minutes at UKB
    scale). The cache keys on the view set; it is invalidated when its first
    entry no longer resolves (moved data, the reference's existence check)
    OR when data_dir's subdirectory count changed (studies added/removed
    after the cache was written — one cheap listdir, no per-study stat)."""
    import json

    from cinema_tpu.data.datasets import find_view_file

    import os

    cache_path = data_dir / f"manifest_pids_{'_'.join(sorted(views))}.json"
    # scandir reads is_dir from dirent d_type: no per-entry stat() calls
    # (iterdir().is_dir() would issue ~70k stats per launch at UKB scale)
    with os.scandir(data_dir) as it:
        n_dir_entries = sum(1 for e in it if e.is_dir())
    if not rescan and cache_path.exists():
        try:
            cached = json.load(open(cache_path, encoding="utf-8"))
        except (json.JSONDecodeError, OSError):
            cached = None
        # legacy list-format caches carry no entry count: stale, rescan once
        pids = cached.get("pids") if isinstance(cached, dict) else None
        cached_entries = cached.get("n_dir_entries", -1) if isinstance(cached, dict) else -1
        if (
            pids
            and cached_entries == n_dir_entries
            and find_view_file(data_dir / pids[0], pids[0], views[0]) is not None
        ):
            logger.info(f"Loaded {len(pids)} studies from cache {cache_path}.")
            return pids
        logger.warning(f"Manifest cache {cache_path} is stale, rescanning.")

    pids = []
    for pid_dir in sorted(data_dir.iterdir()):
        if not pid_dir.is_dir():
            continue
        pid = pid_dir.name
        if all(find_view_file(pid_dir, pid, v) is not None for v in views):
            pids.append(pid)
    if pids:
        try:
            with open(cache_path, "w", encoding="utf-8") as f:
                json.dump({"pids": pids, "n_dir_entries": n_dir_entries}, f)
        except OSError:  # read-only data dir: scanning still works
            logger.warning(f"Could not write manifest cache {cache_path}.")
    return pids


def run(config: Config) -> None:
    # multi-host init MUST precede any backend-touching call (including the
    # compile cache's platform probe): jax.distributed.initialize raises
    # once backends exist (see parallel/multihost.py)
    maybe_initialize_distributed(bool(config.get("mesh", {}).get("multiprocess", False)))
    from cinema_tpu.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    views = list(config.model.views)
    data_dir = Path(config.data.dir).expanduser()
    pids = scan_manifest(data_dir, views, rescan=bool(config.data.get("rescan", False)))
    if config.data.max_n_samples > 0:
        pids = pids[: config.data.max_n_samples]
    if not pids:
        raise ValueError(f"No studies with views {views} found under {data_dir}.")
    logger.info(f"Found {len(pids)} studies.")

    n_model = int(config.get("mesh", {}).get("n_model", 1))
    mesh = make_mesh(n_model=n_model)
    world = mesh.shape["data"] * mesh.shape["model"]
    n_accum = get_n_accum_steps(
        config.train.batch_size, config.train.batch_size_per_device, mesh.shape["data"]
    )
    # per-host input pipeline: this process loads only the rows of the
    # global batch its local devices own (reference DistributedSampler,
    # pretrain.py:327-330)
    pids = shard_manifest(pids, shuffle_seed=config.seed)
    local_batch = config.train.batch_size_per_device * local_data_shard_count(mesh)

    transform = get_pretrain_transforms(config)
    dataset = UKBCineDataset(data_dir, pids, views=views, transform=transform, seed=config.seed)
    # zlib frame-seek inflate + scipy zoom are CPU-bound and partly
    # GIL-bound: on a many-core TPU host, process workers are the only way
    # the loader can match the step rate (~0.2-0.6 s/item single-core,
    # measured by bench.py input_pipeline_throughput). Thread workers stay
    # the default only on small boxes (tests, 1-core sandboxes).
    import os as _os

    use_processes = config.train.get("use_process_workers")
    if use_processes is None:
        use_processes = (_os.cpu_count() or 1) > 4
    loader = BatchLoader(
        dataset,
        batch_size=local_batch,
        shuffle=True,
        drop_last=True,
        n_workers=config.train.get("n_workers_per_device", 8),
        seed=config.seed,
        use_processes=bool(use_processes),
    )
    steps_per_epoch = max(len(loader) // n_accum, 1)

    model = get_mae_model(config, dtype=jnp.bfloat16)
    example = {
        v: jnp.zeros((1, *model.image_size_dict[v], model.in_chans_dict[v]), jnp.float32)
        for v in views
    }

    def init_fn():
        return model.init(
            {"params": jax.random.PRNGKey(config.seed), "mask": jax.random.PRNGKey(1)},
            example,
            config.train.enc_mask_ratio,
        )

    tx = build_optimizer(
        jax.eval_shape(init_fn),
        lr=config.train.lr,
        min_lr=config.train.min_lr,
        warmup_steps=config.train.n_warmup_epochs * steps_per_epoch,
        max_n_steps=config.train.n_epochs * steps_per_epoch,
        betas=tuple(config.train.betas),
        weight_decay=config.train.weight_decay,
        clip_grad=config.train.clip_grad,
        accum_steps=n_accum,
        fused=True,
    )
    state, shardings = make_train_state(
        init_fn, tx, mesh, fsdp=bool(config.get("mesh", {}).get("fsdp", False))
    )
    step_fn = make_mae_train_step(
        model, tx, config.train.enc_mask_ratio, mesh=mesh, state_shardings=shardings
    )

    tags = ["ukb_mae_pretrain"] + (["multi_view"] if len(views) > 1 else [])
    out_dir = init_run_dir(config, tags=tags)  # run.json: tags + flat config
    metrics_logger = MetricsLogger(out_dir)
    retention = CheckpointRetention(config.train.max_n_ckpts, pin_every=100)

    start_epoch = 0
    if config.train.get("ckpt_path"):
        ckpt = Path(config.train.ckpt_path)
        # sharded restore: reads straight into the mesh placement (works
        # multi-host and across topology changes; device_get of a global
        # state would fail on non-addressable arrays)
        state = load_checkpoint(ckpt, state, shardings=shardings)
        start_epoch = int(state.step) // steps_per_epoch
        logger.info(f"Resumed from {ckpt} at epoch {start_epoch}.")

    rng = jax.random.PRNGKey(config.seed)
    first_step = True
    for epoch in range(start_epoch, config.train.n_epochs):
        t0 = time.perf_counter()
        losses = []
        shardings = batch_shardings({v: None for v in views}, mesh)

        def put(batch):
            # single-process: device_put; multi-host: global array assembled
            # from each process's local rows (parallel/multihost.py)
            return make_global_batch({v: batch[v] for v in views}, shardings)

        # two-deep host->HBM prefetch overlaps input transfer with the step
        for device_batch in device_prefetch(iter(loader), put, depth=2):
            if first_step:
                # AOT executable cache: relaunches of the same program load
                # the serialized step instead of recompiling (minutes);
                # multi-process runs fall through to plain jit inside
                from cinema_tpu.aot_cache import aot_or_jit

                step_fn = aot_or_jit(step_fn, state, device_batch, rng)
                first_step = False
            state, metrics = step_fn(state, device_batch, rng)
            losses.append(metrics["loss"])
        epoch_loss = float(np.mean([float(x) for x in losses])) if losses else float("nan")
        dt = time.perf_counter() - t0
        clips_per_sec = len(loader) * local_batch / dt / world
        metrics_logger.log(
            {
                "epoch": epoch,
                "loss": epoch_loss,
                "clips_per_sec_per_chip": clips_per_sec,
                "n_samples": int(jax.device_get(state.n_samples)),
            }
        )
        logger.info(f"epoch {epoch}: loss={epoch_loss:.4f} {clips_per_sec:.1f} clips/s/chip")

        path = save_checkpoint(out_dir, state, epoch)
        save_params_safetensors(state.params, out_dir / "cinema.safetensors")
        retention.add(path, epoch)


def main() -> None:
    task_main(DEFAULT_CONFIG, run)


if __name__ == "__main__":
    main()
