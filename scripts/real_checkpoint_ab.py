#!/usr/bin/env python
"""Unattended A/B against the PUBLISHED CineMA checkpoints (network-gated).

The standing acceptance gate (BASELINE.json: parity +-0.5%): everything in
this repo is parity-by-construction (603/603-key bridge manifest, <=2e-4
full-model agreement vs a self-authored torch oracle), but nothing has yet
loaded the *published* HuggingFace safetensors because this sandbox has no
egress. This script runs the whole A/B the moment egress exists:

    python scripts/real_checkpoint_ab.py [--out results/real_ab] \
        [--acdc-dir /path/to/preprocessed_acdc]

Steps (each reports PASS / FAIL / SKIP into <out>/report.json):
  1. download  - hf_hub_download of the pretrained MAE
                 (``pretrained/cinema.safetensors`` + config.yaml, reference
                 mae.py:614-642) and the fine-tuned ACDC SAX ConvUNetR seed 0
                 (``finetuned/segmentation/acdc_sax/acdc_sax_0.safetensors``,
                 reference examples/inference/segmentation_sax.py:117-121).
                 Local paths can be substituted via --local-* flags.
  2. bridge    - strict key-accounted load into the JAX models (any missing /
                 unexpected / mis-shaped key fails).
  3. forward   - deterministic forward fingerprints on seeded inputs and on
                 the reference's sample ACDC ED frame; saved as .npz so a
                 torch-side run of the same script can diff elementwise.
  4. torch A/B - if the reference ``cinema`` package imports (torch + monai
                 available), run the SAME inputs through the torch models and
                 gate max|delta| <= 2e-3 (bf16-free f32 forward).
  5. eval      - if --acdc-dir points at a preprocessed ACDC tree, run the
                 acdc_seg_eval route with the published checkpoint and record
                 mean Dice; gate |Dice - expected| <= 0.005 when an expected
                 value is present in BASELINE.json["published"].

Exit code 0 iff no step FAILed (SKIPs allowed: the torch A/B and eval are
environment-gated).
"""

from __future__ import annotations

import argparse
import json
import sys
import traceback
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

HF_REPO = "mathpluscode/CineMA"
MAE_FILES = ("pretrained/cinema.safetensors", "pretrained/config.yaml")
SEG_FILES = (
    "finetuned/segmentation/acdc_sax/acdc_sax_0.safetensors",
    "finetuned/segmentation/acdc_sax/config.yaml",
)
SAMPLE_ED = Path("/root/reference/cinema/examples/data/acdc/sax_ed.nii.gz")
FWD_TOL = 2e-3  # f32 forward, conv/matmul reassociation across backends


def _result(report: dict, step: str, status: str, **info) -> None:
    report["steps"][step] = {"status": status, **info}
    print(f"[{status}] {step}: {json.dumps(info)[:300]}")


def step_download(args, report) -> dict | None:
    paths = {}
    try:
        if args.local_mae:
            paths["mae_model"], paths["mae_config"] = map(Path, args.local_mae)
            paths["seg_model"], paths["seg_config"] = map(Path, args.local_seg)
        else:
            from huggingface_hub import hf_hub_download

            paths["mae_model"] = Path(hf_hub_download(HF_REPO, MAE_FILES[0]))
            paths["mae_config"] = Path(hf_hub_download(HF_REPO, MAE_FILES[1]))
            paths["seg_model"] = Path(hf_hub_download(HF_REPO, SEG_FILES[0]))
            paths["seg_config"] = Path(hf_hub_download(HF_REPO, SEG_FILES[1]))
        _result(report, "download", "PASS", paths={k: str(v) for k, v in paths.items()})
        return paths
    except Exception as e:  # noqa: BLE001 - report and stop
        _result(report, "download", "FAIL", error=f"{type(e).__name__}: {e}")
        return None


def step_bridge(paths, report):
    try:
        import jax

        from cinema_tpu.factory import from_finetuned, mae_from_pretrained

        mae_model, mae_params = mae_from_pretrained(paths["mae_model"], paths["mae_config"])
        seg_model, seg_params = from_finetuned(
            "convunetr", paths["seg_model"], paths["seg_config"]
        )
        n_mae = sum(x.size for x in jax.tree_util.tree_leaves(mae_params))
        n_seg = sum(x.size for x in jax.tree_util.tree_leaves(seg_params))
        _result(report, "bridge", "PASS", mae_params=int(n_mae), seg_params=int(n_seg))
        return mae_model, mae_params, seg_model, seg_params
    except Exception as e:  # noqa: BLE001
        traceback.print_exc()
        _result(report, "bridge", "FAIL", error=f"{type(e).__name__}: {e}")
        return None


def _seeded_inputs(mae_model) -> dict:
    rng = np.random.default_rng(0)
    return {
        v: rng.random(
            (1, *mae_model.image_size_dict[v], mae_model.in_chans_dict[v]), dtype=np.float32
        )
        for v in mae_model.views
    }


def step_forward(models, out_dir: Path, report):
    mae_model, mae_params, seg_model, seg_params = models
    try:
        import jax.numpy as jnp

        record = {}
        image_dict = _seeded_inputs(mae_model)
        feats = mae_model.apply(
            mae_params,
            {k: jnp.asarray(v) for k, v in image_dict.items()},
            method=mae_model.feature_forward,
        )
        for k, v in feats.items():
            record[f"mae_feature_{k}"] = np.asarray(v, np.float32)

        if SAMPLE_ED.exists():
            from cinema_tpu.data.nifti import load_nifti

            vol, _ = load_nifti(SAMPLE_ED)
            x = vol.astype(np.float32)
            x = (x - x.min()) / max(x.max() - x.min(), 1e-8)  # ScaleIntensity
            pads = [(0, max(t - s, 0)) for s, t in zip(x.shape, (192, 192, 16))]
            x = np.pad(x, pads)[None, ..., None]  # SpatialPad end + batch/chan
            logits = seg_model.apply(seg_params, {"sax": jnp.asarray(x)})["sax"]
            record["seg_logits_sax_ed"] = np.asarray(logits, np.float32)
            record["seg_input_sax_ed"] = x
        record["mae_input_sax"] = image_dict["sax"]

        out_dir.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(out_dir / "jax_forward_fingerprints.npz", **record)
        stats = {
            k: {"mean": float(v.mean()), "std": float(v.std()), "shape": list(v.shape)}
            for k, v in record.items()
        }
        _result(report, "forward", "PASS", fingerprints=stats)
        return record
    except Exception as e:  # noqa: BLE001
        traceback.print_exc()
        _result(report, "forward", "FAIL", error=f"{type(e).__name__}: {e}")
        return None


def step_torch_ab(paths, record, report):
    try:
        import torch  # noqa: F401
        from cinema.mae.mae import CineMA  # the REFERENCE package
        from cinema.segmentation.convunetr import ConvUNetR
    except Exception as e:  # noqa: BLE001
        _result(report, "torch_ab", "SKIP", reason=f"reference package unavailable: {e}")
        return True
    try:
        import torch

        mae = CineMA.from_pretrained()
        mae.eval()
        image_dict = {
            k.replace("mae_input_", ""): torch.from_numpy(
                np.moveaxis(record[k], -1, 1)  # NHW(D)C -> NCHW(D)
            )
            for k in record
            if k.startswith("mae_input_")
        }
        with torch.no_grad():
            feats = mae.feature_forward(image_dict)
        deltas = {}
        for k, v in feats.items():
            ours = record.get(f"mae_feature_{k}")
            if ours is None:
                continue
            theirs = v.numpy()
            if theirs.shape != ours.shape:  # (B, L, E) conventions match; guard anyway
                theirs = theirs.reshape(ours.shape)
            deltas[f"mae_{k}"] = float(np.abs(theirs - ours).max())

        seg = ConvUNetR.from_finetuned(
            repo_id=HF_REPO, model_filename=SEG_FILES[0], config_filename=SEG_FILES[1]
        )
        seg.eval()
        if "seg_logits_sax_ed" in record:
            x = torch.from_numpy(np.moveaxis(record["seg_input_sax_ed"], -1, 1))
            with torch.no_grad():
                logits = seg({"sax": x})["sax"].numpy()
            deltas["seg_logits"] = float(
                np.abs(np.moveaxis(logits, 1, -1) - record["seg_logits_sax_ed"]).max()
            )
        ok = all(d <= FWD_TOL for d in deltas.values())
        _result(report, "torch_ab", "PASS" if ok else "FAIL", max_abs_delta=deltas, tol=FWD_TOL)
        return ok
    except Exception as e:  # noqa: BLE001
        traceback.print_exc()
        _result(report, "torch_ab", "FAIL", error=f"{type(e).__name__}: {e}")
        return False


def step_eval(args, paths, report):
    if not args.acdc_dir:
        _result(report, "eval", "SKIP", reason="--acdc-dir not given")
        return True
    try:
        import pandas as pd

        from cinema_tpu.config import load_config
        from cinema_tpu.factory import from_finetuned
        from cinema_tpu.tasks.evaluate import edes_seg_eval

        config = load_config(paths["seg_config"])
        config.data.dir = str(args.acdc_dir)
        model, params = from_finetuned("convunetr", paths["seg_model"], paths["seg_config"])
        out = Path(args.out) / "acdc_eval"
        edes_seg_eval(config, args.split, out, model, params)
        mean = pd.read_csv(out / "mean_metrics.csv")
        dice_cols = [c for c in mean.columns if "dice" in c]
        dice = float(mean[dice_cols].mean(axis=1).iloc[0]) if dice_cols else float("nan")
        expected = (
            json.loads((REPO / "BASELINE.json").read_text())
            .get("published", {})
            .get("acdc_sax_dice")
        )
        info = {"mean_dice": dice, "expected": expected, "csv_dir": str(out)}
        if expected is None:
            _result(report, "eval", "PASS", note="no published expectation; recorded", **info)
            return True
        ok = abs(dice - float(expected)) <= 0.005
        _result(report, "eval", "PASS" if ok else "FAIL", **info)
        return ok
    except Exception as e:  # noqa: BLE001
        traceback.print_exc()
        _result(report, "eval", "FAIL", error=f"{type(e).__name__}: {e}")
        return False


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", type=Path, default=REPO / "results" / "real_ab")
    parser.add_argument("--acdc-dir", type=Path, default=None)
    parser.add_argument("--split", type=str, default="test")
    parser.add_argument("--local-mae", nargs=2, metavar=("SAFETENSORS", "CONFIG"), default=None)
    parser.add_argument("--local-seg", nargs=2, metavar=("SAFETENSORS", "CONFIG"), default=None)
    args = parser.parse_args()
    if bool(args.local_mae) != bool(args.local_seg):
        parser.error("--local-mae and --local-seg must be given together")

    report = {"repo": HF_REPO, "steps": {}}
    args.out.mkdir(parents=True, exist_ok=True)

    paths = step_download(args, report)
    ok = paths is not None
    if ok:
        models = step_bridge(paths, report)
        ok = models is not None
    if ok:
        record = step_forward(models, args.out, report)
        ok = record is not None
    if ok:
        ok = step_torch_ab(paths, record, report) and ok
        ok = step_eval(args, paths, report) and ok

    (args.out / "report.json").write_text(json.dumps(report, indent=2))
    failed = [k for k, v in report["steps"].items() if v["status"] == "FAIL"]
    print(f"\nReport: {args.out / 'report.json'}")
    print("FAILED steps: " + (", ".join(failed) if failed else "none"))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
