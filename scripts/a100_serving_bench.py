#!/usr/bin/env python
"""GPU-side serving benchmark for the ">= 5x A100 per v5e chip" target
(hardware-gated: this sandbox has no GPU — run on any A100 box with the
reference `cinema` package installed).

Measures the SAME workload as `bench.py`'s ``seg_serving_throughput``
(50-frame cine, SAX 192x192x16, ConvUNetR-base, 4-class argmax labels) on
the reference implementation, two ways:

  serial   — the reference's own serving loop verbatim: a python loop over
             frames at batch 1 with per-frame CPU->GPU transfer and argmax
             (``/root/reference/cinema/examples/inference/segmentation_sax.py:110-164``).
             This is what a reference user actually runs.
  batched  — a best-case torch variant (whole cine chunked into one batched
             forward per chunk, everything resident on device), so the
             comparison can also be made implementation-charitable.

Usage (on the GPU machine):
    python scripts/a100_serving_bench.py [--checkpoint path.safetensors]
        [--chunk 8] [--n-frames 50] [--dtype bf16]

Prints one JSON line per mode:
    {"metric": "a100_seg_serving_throughput", "mode": "serial", "value": ...,
     "unit": "frames/sec/gpu", ...}

Compare against BENCH_r05.json's ``seg_serving_throughput`` (frames/s/chip
on one TPU v5e). No checkpoint is needed for throughput (random init);
pass --checkpoint for a published-weights run.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_model(checkpoint: str | None):
    """Reference ConvUNetR-base at the ACDC SAX geometry."""
    try:
        from cinema.segmentation.convunetr import ConvUNetR
    except ImportError as e:  # pragma: no cover - GPU box only
        sys.exit(f"reference `cinema` package required on the GPU box: {e}")

    if checkpoint:
        model = ConvUNetR.from_finetuned(
            repo_id="mathpluscode/CineMA",
            model_filename=checkpoint,
            config_filename="finetuned/segmentation/acdc_sax/config.yaml",
        )
    else:
        # geometry from the reference ACDC config (ConvUNetR-base;
        # /root/reference/cinema/segmentation/acdc/config.yaml:47-65 and
        # convunetr.py:216-242)
        model = ConvUNetR(
            image_size_dict={"sax": (192, 192, 16)},
            in_chans_dict={"sax": 1},
            out_chans=4,
            enc_patch_size_dict={"sax": (4, 4, 1)},
            enc_scale_factor_dict={"sax": (2, 2, 1)},
            enc_conv_chans=[64, 128],
            enc_conv_n_blocks=2,
            enc_embed_dim=768,
            enc_depth=12,
            enc_n_heads=12,
            dec_chans=(32, 64, 128, 256, 512),
            dec_patch_size_dict={"sax": (2, 2, 1)},
            dec_scale_factor_dict={"sax": (2, 2, 1)},
        )
    model.eval()
    return model


def main() -> None:
    import numpy as np
    import torch

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--chunk", type=int, default=8)
    parser.add_argument("--n-frames", type=int, default=50)
    parser.add_argument("--n-reps", type=int, default=5)
    parser.add_argument("--dtype", choices=["bf16", "f32"], default="bf16")
    args = parser.parse_args()

    if not torch.cuda.is_available():
        print(json.dumps({"metric": "a100_seg_serving_throughput",
                          "error": "no CUDA device"}))
        sys.exit(1)
    device = torch.device("cuda")
    amp_dtype = torch.bfloat16 if args.dtype == "bf16" else torch.float32
    gpu_name = torch.cuda.get_device_name(0)

    model = build_model(args.checkpoint).to(device)
    video = np.random.default_rng(0).random(
        (args.n_frames, 1, 192, 192, 16), dtype=np.float32
    )

    def serial() -> np.ndarray:
        # the reference loop: batch-1, per-frame host->device transfer,
        # autocast forward, argmax, result back on device until the end
        labels = []
        for t in range(args.n_frames):
            batch = {"sax": torch.from_numpy(video[t : t + 1]).to(
                device=device, dtype=torch.float32)}
            with torch.no_grad(), torch.autocast("cuda", dtype=amp_dtype):
                logits = model(batch)["sax"]
            labels.append(torch.argmax(logits, dim=1)[0])
        out = torch.stack(labels, dim=-1)
        torch.cuda.synchronize()
        return out.cpu().numpy()

    video_dev = torch.from_numpy(video).to(device)

    def batched() -> np.ndarray:
        labels = []
        for s in range(0, args.n_frames, args.chunk):
            with torch.no_grad(), torch.autocast("cuda", dtype=amp_dtype):
                logits = model({"sax": video_dev[s : s + args.chunk]})["sax"]
            labels.append(torch.argmax(logits, dim=1))
        out = torch.cat(labels, dim=0)
        torch.cuda.synchronize()
        return out.cpu().numpy()

    for mode, fn in (("serial", serial), ("batched", batched)):
        fn()  # warm-up (cudnn autotune, allocator)
        times = []
        for _ in range(args.n_reps):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        print(json.dumps({
            "metric": "a100_seg_serving_throughput",
            "mode": mode,
            "value": round(args.n_frames / dt, 1),
            "unit": "frames/sec/gpu",
            "p50_ms_per_study": round(dt * 1000, 1),
            "gpu": gpu_name,
            "dtype": args.dtype,
            "chunk": args.chunk if mode == "batched" else 1,
            "checkpoint": args.checkpoint or "random-init",
        }), flush=True)


if __name__ == "__main__":
    main()
