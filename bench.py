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


def _build_pretrain_step():
    """The benched workload: (state, batch, step_fn, key) — shared by
    bench_pretrain and the --warm-probe subprocess so both lower the SAME
    program (the AOT cache keys on the lowered StableHLO; any divergence
    makes the warm probe permanently miss)."""
    import os

    from __graft_entry__ import VIEW_SIZES_FULL, _build_mae
    from cinema_tpu.train.optim import build_optimizer
    from cinema_tpu.train.state import make_mae_train_step, make_train_state

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
        fused=True,
    )
    state, _ = make_train_state(init_fn, tx)
    step = make_mae_train_step(model, tx, 0.75, donate=True)
    return state, batch, step, jax.random.PRNGKey(0)


def bench_pretrain(profile_dir=None) -> float:
    state, batch, step, key = _build_pretrain_step()
    flops_per_step = 0.0
    compile_s = 0.0
    compile_s_warm = 0.0
    aot = {}
    try:
        from cinema_tpu.aot_cache import cached_compile

        t0 = time.perf_counter()
        # AOT executable cache: a fresh process with the same program loads
        # the serialized executable instead of recompiling (the ONLY warm
        # path on the axon relay, whose per-session fingerprint defeats the
        # XLA persistent cache — docs/KERNEL_NOTES.md)
        compiled = cached_compile(step, state, batch, key, _stats=aot)
        compile_s = time.perf_counter() - t0
        try:
            # cost analysis / HLO text may be unavailable on a deserialized
            # executable: cache flops in a sidecar next to the .aot entry
            import pathlib

            from cinema_tpu.aot_cache import _cache_dir

            sidecar = (_cache_dir() or pathlib.Path("/tmp")) / f"{aot.get('key')}.flops"
            flops_per_step = _flops_of(compiled)
            if flops_per_step:
                sidecar.parent.mkdir(parents=True, exist_ok=True)
                sidecar.write_text(str(flops_per_step))
            elif sidecar.exists():
                flops_per_step = float(sidecar.read_text())
            if profile_dir:
                # TPU-compiled HLO: tools/profile_breakdown.py joins its
                # metadata op_names onto the trace for per-component ms/step
                pathlib.Path(profile_dir).mkdir(parents=True, exist_ok=True)
                with open(f"{profile_dir}/step.hlo.txt", "w") as f:
                    f.write(compiled.as_text())
        except Exception:
            pass
    except Exception:
        compiled = None

    run_step = compiled if compiled is not None else step
    for _ in range(N_WARMUP):
        state, metrics = run_step(state, batch, key)
    _sync(metrics["loss"])

    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        state, metrics = run_step(state, batch, key)
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
        "compile_s_warm": round(compile_s_warm, 1),
        "aot_cache": "hit" if aot.get("hit") else ("miss" if aot else "off"),
    }


def warm_probe() -> None:
    """Fresh-process warm start: trace + AOT-cache load + ONE step.

    Run as ``python bench.py --warm-probe`` in a process whose predecessor
    populated the AOT cache; prints one JSON line. This is what
    ``compile_s_warm`` reports — an honest fresh-process number, not an
    in-process re-lower (round-4 flattered that; VERDICT Weak #4).
    """
    from cinema_tpu.aot_cache import cached_compile

    t_start = time.perf_counter()
    state, batch, step, key = _build_pretrain_step()
    stats = {}
    t0 = time.perf_counter()
    compiled = cached_compile(step, state, batch, key, _stats=stats)
    lower_load_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, metrics = compiled(state, batch, key)
    _sync(metrics["loss"])
    print(json.dumps({
        "aot_hit": bool(stats.get("hit")),
        "lower_load_s": round(lower_load_s, 1),
        "first_step_s": round(time.perf_counter() - t0, 2),
        "build_to_first_step_s": round(time.perf_counter() - t_start, 1),
    }), flush=True)


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

    # the single-dispatch p50 above includes one host<->device round trip
    # (~25-30 ms over the axon relay tunnel — nothing a real deployment
    # pays); measure that floor explicitly and also a steady-state
    # amortized latency with N frames chained in ONE dispatch, each
    # perturbed so nothing hoists
    tiny = jax.jit(lambda s: s + 1.0)
    _sync(tiny(jnp.float32(0)))
    floors = []
    for _ in range(10):
        t0 = time.perf_counter()
        _sync(tiny(jnp.float32(0)))
        floors.append(time.perf_counter() - t0)
    floor = sorted(floors)[len(floors) // 2]

    n_chain = 5

    @jax.jit
    def run_chain(p, img):
        def body(i, acc):
            labels = run(p, img + (i * 1e-6).astype(img.dtype))
            return acc + labels[0, 0, 0, 0].astype(jnp.int32)

        return jax.lax.fori_loop(0, n_chain, body, jnp.int32(0))

    _sync(run_chain(params, image))
    chained = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(run_chain(params, image))
        chained.append(time.perf_counter() - t0)
    amortized = sorted(chained)[len(chained) // 2] / n_chain

    return {
        "metric": "seg_sliding_window_latency",
        "value": round(p50 * 1000, 2),
        "unit": "ms p50 per frame (192x192x24 SAX, 2 z-patches)",
        "p95_ms": round(times[int(len(times) * 0.95) - 1] * 1000, 2),
        "frames_per_sec": round(1.0 / p50, 2),
        "dispatch_floor_ms": round(floor * 1000, 2),
        "amortized_ms_per_frame": round(amortized * 1000, 2),
    }


def bench_serving() -> dict:
    """50-frame cine segmentation, frames chunked to bound activation memory.

    Self-tuning over the frame-chunk size: bf16 tiles have 16 sublanes and
    the decoder's finest tensors put batch in sublanes — chunk 10 pads to 16
    (measured 23.6 frames/s round 2) while 8 and 16 tile exactly; which of
    those wins is hardware-dependent, so both are timed and the best is
    reported. (The round-3 gated levers — segmented z-fold, streaming flash
    — lost their on-device A/B and were pruned 2026-08-19; the adjudication
    log is in docs/KERNEL_NOTES.md.)"""
    from cinema_tpu.inference import video_forward

    config, model, params = _build_convunetr(jnp.bfloat16)
    video = jnp.asarray(
        np.random.default_rng(0).random((50, 192, 192, 16, 1), dtype=np.float32)
    )

    def time_chunk(chunk: int) -> float:
        def run(p, v):
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
    for chunk in (8, 16):
        try:
            timings[chunk] = time_chunk(chunk)
        except Exception:  # a variant must never sink the benchmark
            continue
    best = min(timings, key=timings.get)
    dt = timings[best]
    return {
        "metric": "seg_serving_throughput",
        "value": round(50 / dt, 1),
        "unit": "frames/sec/chip (50-frame cine, 192x192x16)",
        "p50_ms_per_study": round(dt * 1000, 1),
        "config": f"chunk{best}",
        "config_frames_per_sec": {f"chunk{k}": round(50 / v, 1) for k, v in timings.items()},
    }


def bench_input_pipeline(step_clips_per_sec: float) -> dict:
    """Host input-pipeline headroom at the pretrain shape.

    Builds a synthetic UKB-like study set (full-geometry 4-view 50-frame
    uint8 NIfTI gz; one real study + symlinked clones, cached in /tmp),
    then measures the real loader (UKBCineDataset frame-seek reads +
    pretrain RandZoom/ScaleIntensity/Pad transforms, BatchLoader batch 16,
    8 workers). Reports throughput as a multiple of the measured train-step
    rate — the loader must stay >= 1x to keep the chip busy (reference
    analog: torch DataLoader num_workers, mae/pretrain.py:331-338).
    """
    import os
    import shutil
    import tempfile
    from pathlib import Path

    from cinema_tpu.config import load_config
    from cinema_tpu.data.datasets import BatchLoader, UKBCineDataset
    from cinema_tpu.data.nifti import save_nifti
    from cinema_tpu.data.transforms import get_pretrain_transforms

    n_studies = 16
    views = {"sax": (192, 192, 16, 50), "lax_2c": (256, 256, 1, 50),
             "lax_3c": (256, 256, 1, 50), "lax_4c": (256, 256, 1, 50)}
    base = Path(tempfile.gettempdir()) / "cinema_loader_bench_v2"
    src = base / "study00"
    legacy = base / "legacy" / "study00"
    if not all((src / f"study00_{v}_t.nii.gz").exists() for v in views):
        shutil.rmtree(base, ignore_errors=True)
        src.mkdir(parents=True)
        legacy.mkdir(parents=True)
        rng = np.random.default_rng(0)
        for v, shape in views.items():
            # smooth field + noise: gz ratio ~2x, like clipped uint8 MRI
            low = rng.integers(0, 200, size=(16, 16, shape[2], shape[3]))
            up = (shape[0] + 15) // 16
            data = np.kron(low, np.ones((up, up, 1, 1)))[: shape[0], : shape[1]]
            data = (data + rng.integers(0, 40, size=shape)).astype(np.uint8)
            # frame-indexed: what ukb_dicom/cinema_reindex_nifti write now
            save_nifti(src / f"study00_{v}_t.nii.gz", data, spacing=(1, 1, 10, 1),
                       frame_indexed=True)
            save_nifti(legacy / f"study00_{v}_t.nii.gz", data, spacing=(1, 1, 10, 1))
    pids = ["study00"]
    for i in range(1, n_studies):
        pid = f"study{i:02d}"
        d = base / pid
        if not d.exists():
            d.mkdir()
            for v in views:
                (d / f"{pid}_{v}_t.nii.gz").symlink_to(src / f"study00_{v}_t.nii.gz")
        pids.append(pid)

    config = load_config(Path(__file__).parent / "cinema_tpu" / "configs" / "mae.yaml")
    transform = get_pretrain_transforms(config)
    dataset = UKBCineDataset(base, pids, transform=transform, seed=0)

    # per-item decomposition (single worker): frame read vs transform;
    # frame-INDEXED files (the preprocess default since round 5) inflate one
    # gzip member per read instead of the whole stream prefix
    raw_ds = UKBCineDataset(base, pids, transform=None, seed=0)
    t0 = time.perf_counter()
    for i in range(12):
        raw_ds[i % n_studies]
    read_s = (time.perf_counter() - t0) / 12
    legacy_ds = UKBCineDataset(base / "legacy", ["study00"], transform=None, seed=0)
    t0 = time.perf_counter()
    for i in range(6):
        legacy_ds[0]
    read_legacy_s = (time.perf_counter() - t0) / 6
    t0 = time.perf_counter()
    for i in range(6):
        dataset[i]
    item_s = (time.perf_counter() - t0) / 6

    n_workers = min(8, os.cpu_count() or 1)

    def measure(use_processes: bool) -> float:
        loader = BatchLoader(
            dataset, batch_size=BATCH, shuffle=True, drop_last=True,
            n_workers=n_workers, seed=0, use_processes=use_processes,
        )
        for _ in iter(loader):  # warm (open files, spawn pool)
            pass
        n_epochs, n_items = 4, 0
        t0 = time.perf_counter()
        for _ in range(n_epochs):
            for batch in iter(loader):
                n_items += batch["sax"].shape[0]
        return n_items / (time.perf_counter() - t0)

    threads = measure(use_processes=False)
    result = {
        "metric": "input_pipeline_throughput",
        "value": round(threads, 1),
        "unit": f"studies/sec/host (4-view frame-seek + augmentation, {n_workers} workers, {os.cpu_count()} cores)",
        "vs_step_rate": round(threads / step_clips_per_sec, 2) if step_clips_per_sec else None,
        "mode": "threads",
        "ms_per_item_read": round(read_s * 1000, 1),
        "ms_per_item_read_legacy_gz": round(read_legacy_s * 1000, 1),
        "ms_per_item_transform": round((item_s - read_s) * 1000, 1),
        # zlib inflate is the bound and scales with worker cores (process
        # workers, tasks/pretrain.py defaults them on for multi-core hosts):
        # cores needed to match the chip's step rate
        "cores_for_step_rate": round(step_clips_per_sec * item_s, 1) if step_clips_per_sec else None,
    }
    if step_clips_per_sec and threads < 2 * step_clips_per_sec and (os.cpu_count() or 1) > 2:
        try:
            procs = measure(use_processes=True)
            result["processes_studies_per_sec"] = round(procs, 1)
            if procs > threads:
                result["value"] = round(procs, 1)
                result["mode"] = "processes"
                result["vs_step_rate"] = round(procs / step_clips_per_sec, 2)
        except Exception as e:  # spawn pools can be env-fragile
            result["processes_error"] = str(e)[:120]
    return result


def main() -> None:
    import os
    import sys

    from cinema_tpu.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    if "--warm-probe" in sys.argv:
        warm_probe()
        return

    profile_dir = None
    if "--profile" in sys.argv:
        profile_dir = os.environ.get("CINEMA_PROFILE_DIR", "/tmp/cinema_profile")

    results = []
    if "--pretrain-only" not in sys.argv:
        try:
            results.append(bench_serving())
        except Exception as e:  # secondary metrics must not break the driver line
            print(json.dumps({"metric": "seg_serving_throughput", "error": str(e)[:200]}))
        try:
            results.append(bench_seg_latency())
        except Exception as e:
            print(json.dumps({"metric": "seg_sliding_window_latency", "error": str(e)[:200]}))
    pretrain = bench_pretrain(profile_dir)
    # compile_s_warm: a FRESH subprocess that loads the AOT cache this
    # process just populated — trace + load + first step, no XLA compile
    if "--no-warm-probe" not in sys.argv:
        try:
            import subprocess

            res = subprocess.run(
                [sys.executable, __file__, "--warm-probe"],
                capture_output=True, text=True, timeout=1800, check=True,
            )
            probe = json.loads(res.stdout.strip().splitlines()[-1])
            pretrain["compile_s_warm"] = probe["lower_load_s"]
            pretrain["warm_probe"] = probe
        except Exception as e:
            pretrain["warm_probe_error"] = str(e)[:200]
    if "--pretrain-only" not in sys.argv:
        try:
            results.append(bench_input_pipeline(pretrain["value"]))
        except Exception as e:
            print(json.dumps({"metric": "input_pipeline_throughput", "error": str(e)[:200]}))
    for r in results:
        print(json.dumps(r), flush=True)
    # the driver parses the LAST line: keep the primary metric there
    print(json.dumps(pretrain), flush=True)


if __name__ == "__main__":
    main()
