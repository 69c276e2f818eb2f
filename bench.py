"""Benchmark: MAE pretrain throughput (cine clips/sec/chip) on real TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The measured step is the full jitted CineMA ViT-base pretrain update
(4 views, UKB geometry: SAX 192x192x16 + 3x LAX 256x256, mask 0.75, bf16
compute, AdamW) — the reference's flagship workload (cinema/mae/pretrain.py,
batch 16/device on NVIDIA GPUs). No reference throughput number exists
(BASELINE.md), so vs_baseline is measured against the reference recipe's
per-device batch-16 step on one A100 estimated from its config; until an
A100 A/B number exists we report vs_baseline relative to BASELINE_CLIPS_PER_SEC
below (our round-1 TPU v5e measurement, so later rounds show relative gains).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# round-1 measurement on TPU v5e (one chip); later rounds compare against this
BASELINE_CLIPS_PER_SEC = 21.7

BATCH = 16  # reference per-device batch (cinema/mae/config.yaml:45)
N_WARMUP = 2
N_STEPS = 10


def main() -> None:
    import os
    import sys

    from __graft_entry__ import VIEW_SIZES_FULL, _build_mae
    from cinema_tpu.train.optim import build_optimizer
    from cinema_tpu.train.state import make_mae_train_step, make_train_state

    profile_dir = None
    if "--profile" in sys.argv:
        profile_dir = os.environ.get("CINEMA_PROFILE_DIR", "/tmp/cinema_profile")

    model = _build_mae(VIEW_SIZES_FULL, "base", jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = {
        v: jnp.asarray(rng.normal(size=(BATCH, *s, 1)).astype(np.float32))
        for v, s in VIEW_SIZES_FULL.items()
    }

    def init_fn():
        return model.init(
            {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
            jax.tree.map(lambda x: x[:1], batch),
            0.75,
        )

    tx = build_optimizer(
        jax.eval_shape(init_fn),
        lr=1e-3,
        min_lr=1e-6,
        warmup_steps=10,
        max_n_steps=800,
        weight_decay=0.05,
        clip_grad=5.0,
    )
    state, _ = make_train_state(init_fn, tx)
    step = make_mae_train_step(model, tx, 0.75, donate=True)

    key = jax.random.PRNGKey(0)
    for _ in range(N_WARMUP):
        state, metrics = step(state, batch, key)
    float(metrics["loss"])  # device_get sync: block_until_ready is unreliable
    # over the experimental axon relay (returned before execution finished)

    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        state, metrics = step(state, batch, key)
    float(metrics["loss"])
    t1 = time.perf_counter()
    if profile_dir:
        jax.profiler.stop_trace()

    clips_per_sec = BATCH * N_STEPS / (t1 - t0)
    print(
        json.dumps(
            {
                "metric": "mae_pretrain_throughput",
                "value": round(clips_per_sec, 3),
                "unit": "clips/sec/chip",
                "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
