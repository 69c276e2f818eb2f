"""Benchmarks on the real TPU chip. Prints one JSON line per metric; the
LAST line is the driver's primary metric (MAE pretrain throughput).

Metrics:
1. mae_pretrain_throughput — full jitted CineMA ViT-base pretrain update
   (4 views, UKB geometry: SAX 192x192x16 + 3x LAX 256x256, mask 0.75, bf16,
   AdamW), the reference's flagship workload (cinema/mae/pretrain.py, batch
   16/device). Reports achieved TFLOP/s and MFU from XLA's cost analysis.
2. seg_sliding_window_latency — ConvUNetR-base ACDC SAX study eval: ED+ES
   frames with a z-overflowing volume so the sliding-window path runs
   (reference hot loop segmentation/train.py:204-210 is serial batch-1; ours
   batches all patches in one forward).
3. seg_serving_throughput — the 50-frame cine serving path (reference
   examples/inference/segmentation_sax.py:110-164 loops frames; ours runs
   one batched forward).

``vs_baseline`` semantics: no reference numbers exist (BASELINE.md), so the
pretrain metric compares ROUND-OVER-ROUND against the pinned round-1
measurement (21.7 clips/s/chip, first working build) — i.e. cumulative
speedup of this framework, not an A/B against the reference.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# round-1 first measurement on TPU v5e (one chip); vs_baseline = cumulative gain
BASELINE_CLIPS_PER_SEC = 21.7
# TPU v5e peak bf16 matmul throughput per chip
V5E_PEAK_FLOPS = 197e12

BATCH = 16  # reference per-device batch (cinema/mae/config.yaml:45)
N_WARMUP = 2
N_STEPS = 10


def _sync(x) -> float:
    # device_get sync: block_until_ready is unreliable over the axon relay
    return float(np.asarray(jax.device_get(x)).reshape(-1)[0])


def _flops_of(compiled) -> float:
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def bench_pretrain(profile_dir=None) -> float:
    from __graft_entry__ import VIEW_SIZES_FULL, _build_mae
    from cinema_tpu.train.optim import build_optimizer
    from cinema_tpu.train.state import make_mae_train_step, make_train_state

    import os

    # CINEMA_BENCH_SCAN=1 builds the nn.scan-blocks variant (compile-time
    # comparison; the compile_s output line is the measurement)
    model = _build_mae(
        VIEW_SIZES_FULL, "base", jnp.bfloat16,
        scan_blocks=os.environ.get("CINEMA_BENCH_SCAN", "0") == "1",
    )
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
    flops_per_step = 0.0
    compile_s = 0.0
    try:
        t0 = time.perf_counter()
        compiled = step.lower(state, batch, key).compile()
        compile_s = time.perf_counter() - t0
        flops_per_step = _flops_of(compiled)
        if profile_dir:
            # TPU-compiled HLO: tools/profile_breakdown.py joins its
            # metadata op_names onto the trace for per-component ms/step
            import pathlib

            pathlib.Path(profile_dir).mkdir(parents=True, exist_ok=True)
            with open(f"{profile_dir}/step.hlo.txt", "w") as f:
                f.write(compiled.as_text())
    except Exception:
        pass

    for _ in range(N_WARMUP):
        state, metrics = step(state, batch, key)
    _sync(metrics["loss"])

    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        state, metrics = step(state, batch, key)
    _sync(metrics["loss"])
    t1 = time.perf_counter()
    if profile_dir:
        jax.profiler.stop_trace()

    dt = (t1 - t0) / N_STEPS
    clips_per_sec = BATCH / dt
    tflops = flops_per_step / dt / 1e12 if flops_per_step else 0.0
    mfu = flops_per_step / dt / V5E_PEAK_FLOPS if flops_per_step else 0.0
    return {
        "metric": "mae_pretrain_throughput",
        "value": round(clips_per_sec, 3),
        "unit": "clips/sec/chip",
        "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC, 3),
        "baseline_note": "round-over-round vs round-1 first build (21.7); no reference number exists",
        "step_ms": round(dt * 1000, 1),
        "achieved_tflops": round(tflops, 1),
        "mfu": round(mfu, 4),
        "compile_s": round(compile_s, 1),
    }


def _build_convunetr(dtype):
    from pathlib import Path

    from cinema_tpu.config import load_config
    from cinema_tpu.factory import get_convunetr_model, init_params

    config = load_config(Path(__file__).parent / "cinema_tpu" / "configs" / "segmentation" / "acdc.yaml")
    model = get_convunetr_model(config, dtype=dtype, remat=False)
    params = init_params(model)
    return config, model, params


def bench_seg_latency() -> dict:
    """Sliding-window study eval: one ED or ES frame, z 24 > patch 16 =>
    2 overlapping z-patches batched into ONE forward (the reference loops
    them serially at batch 1, segmentation/train.py:204-210)."""
    from cinema_tpu.inference import sliding_window_forward

    config, model, params = _build_convunetr(jnp.bfloat16)
    patch_size = tuple(config.data.sax.patch_size)  # (192, 192, 16)
    image = jnp.asarray(
        np.random.default_rng(0).random((1, 192, 192, 24, 1), dtype=np.float32)
    )

    def run(p, img):
        probs = sliding_window_forward(
            lambda imgs: model.apply(p, imgs), {"sax": img}, {"sax": patch_size}, "softmax"
        )["sax"]
        return jnp.argmax(probs, axis=-1)

    fn = jax.jit(run)
    _sync(fn(params, image)[0, 0, 0, 0])  # compile
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        _sync(fn(params, image)[0, 0, 0, 0])
        times.append(time.perf_counter() - t0)
    times.sort()
    p50 = times[len(times) // 2]
    return {
        "metric": "seg_sliding_window_latency",
        "value": round(p50 * 1000, 2),
        "unit": "ms p50 per frame (192x192x24 SAX, 2 z-patches)",
        "p95_ms": round(times[int(len(times) * 0.95) - 1] * 1000, 2),
        "frames_per_sec": round(1.0 / p50, 2),
    }


# serving lever configs for the in-bench A/B (see README "Serving
# decomposition"): segmented z-fold convs and streaming flash attention are
# numerics-proven equal to the defaults (tests/test_layers.py,
# tests/test_flash_attention.py); which is FASTER is hardware-dependent, so
# the bench times each and keeps the best. Env vars are read at trace time —
# a fresh jit per config re-reads them.
_SERVING_CONFIGS = (
    ("base", {"CINEMA_TPU_ZFOLD_SEG": "0", "CINEMA_TPU_FLASH_STREAM": "0"}),
    ("zseg4", {"CINEMA_TPU_ZFOLD_SEG": "4", "CINEMA_TPU_FLASH_STREAM": "0"}),
    ("stream", {"CINEMA_TPU_ZFOLD_SEG": "0", "CINEMA_TPU_FLASH_STREAM": "1"}),
    ("zseg4+stream", {"CINEMA_TPU_ZFOLD_SEG": "4", "CINEMA_TPU_FLASH_STREAM": "1"}),
)


def bench_serving() -> dict:
    """50-frame cine segmentation, frames chunked to bound activation memory.

    chunk=8: bf16 tiles have 16 sublanes and the decoder's finest tensors
    put batch in sublanes — chunk 10 pads to 16 (measured 23.6 frames/s)
    while 8 (and 16) reach ~31 frames/s on v5e. The tail chunk reuses the
    same compiled shape by padding to 8.

    Self-tuning: unless the lever env vars are pinned by the caller, every
    ``_SERVING_CONFIGS`` variant is compiled + timed and the fastest wins;
    the winning env stays set so downstream benches inherit it."""
    import os

    from cinema_tpu.inference import video_forward

    config, model, params = _build_convunetr(jnp.bfloat16)
    chunk = 8
    video = jnp.asarray(
        np.random.default_rng(0).random((50, 192, 192, 16, 1), dtype=np.float32)
    )

    pinned = "CINEMA_TPU_ZFOLD_SEG" in os.environ or "CINEMA_TPU_FLASH_STREAM" in os.environ
    configs = (("pinned", {}),) if pinned else _SERVING_CONFIGS

    def time_config(env) -> float:
        if not pinned:
            os.environ.update(env)

        def run(p, v):  # fresh function per config: env is read at trace time
            return video_forward(
                lambda frames: model.apply(
                    p, {"sax": frames}, method=model.predict_labels
                )["sax"],
                v,
                chunk,
            )

        fn = jax.jit(run)
        _sync(fn(params, video)[0, 0, 0, 0])  # compile
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            _sync(fn(params, video)[0, 0, 0, 0])
            times.append(time.perf_counter() - t0)
        return sorted(times)[len(times) // 2]

    timings = {}
    for name, env in configs:
        try:
            timings[name] = time_config(env)
        except Exception:  # a lever variant must never sink the benchmark
            continue
    best = min(timings, key=timings.get)
    if not pinned:  # downstream benches (seg latency) inherit the winner
        os.environ.update(dict(configs)[best])
    dt = timings[best]
    return {
        "metric": "seg_serving_throughput",
        "value": round(50 / dt, 1),
        "unit": "frames/sec/chip (50-frame cine, 192x192x16)",
        "p50_ms_per_study": round(dt * 1000, 1),
        "config": best,
        "config_frames_per_sec": {k: round(50 / v, 1) for k, v in timings.items()},
    }


def main() -> None:
    import os
    import sys

    profile_dir = None
    if "--profile" in sys.argv:
        profile_dir = os.environ.get("CINEMA_PROFILE_DIR", "/tmp/cinema_profile")

    results = []
    if "--pretrain-only" not in sys.argv:
        # serving first: its lever autotune leaves the winning env config
        # set, and the sliding-window latency bench inherits it
        try:
            results.append(bench_serving())
        except Exception as e:  # secondary metrics must not break the driver line
            print(json.dumps({"metric": "seg_serving_throughput", "error": str(e)[:200]}))
        try:
            results.append(bench_seg_latency())
        except Exception as e:
            print(json.dumps({"metric": "seg_sliding_window_latency", "error": str(e)[:200]}))
    for r in results:
        print(json.dumps(r), flush=True)
    print(json.dumps(bench_pretrain(profile_dir)), flush=True)


if __name__ == "__main__":
    main()
