"""Real-TPU smoke drives: run each framework flow end-to-end on the device.

Consolidates the verification drives used during development: every task
family trains/evaluates on synthetic data on whatever accelerator JAX sees
(designed for the one-chip axon TPU; also runs on CPU). Each flow asserts
its own success criteria and prints one OK line.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_smoke.py [flows...]

Flows: entry pretrain classification landmark all (default: all).
Budget: ~15 min on one v5e chip (compiles dominate).
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def flow_entry() -> None:
    """Driver-style compile check of the flagship forward."""
    import jax

    from __graft_entry__ import entry

    fn, args = entry()
    loss = float(jax.jit(fn)(*args)[0])
    assert np.isfinite(loss), loss
    print(f"entry OK: loss={loss:.4f}", flush=True)


def _write_ukb(root: Path) -> None:
    from cinema_tpu.data.nifti import save_nifti

    rng = np.random.default_rng(0)
    views = {"sax": (48, 48, 8), "lax_2c": (64, 64), "lax_3c": (64, 64), "lax_4c": (64, 64)}
    for pid in [f"10000{i}" for i in range(6)]:
        d = root / pid
        d.mkdir(parents=True, exist_ok=True)
        for v, size in views.items():
            shape = size if len(size) == 3 else (*size, 1)  # LAX stored (x, y, 1, t)
            arr = (rng.random((*shape, 6)) * 255).astype(np.uint8)
            save_nifti(d / f"{pid}_{v}_t.nii.gz", arr, spacing=(1.0,) * (len(shape) + 1))


def flow_pretrain(tmp: Path) -> None:
    """Full UKB MAE pretrain path: manifest -> workers -> sparse-stem masked
    steps -> run.json/metrics -> checkpoint + safetensors; loss must drop."""
    from cinema_tpu.config import apply_overrides, load_config
    from cinema_tpu.tasks.pretrain import run

    data = tmp / "ukb"
    _write_ukb(data)
    config = apply_overrides(
        load_config(REPO / "cinema_tpu" / "configs" / "mae.yaml"),
        [
            f"data.dir={data}", "data.sax.patch_size=[48,48,8]", "data.lax.patch_size=[64,64]",
            "model.size=tiny", "train.batch_size=4", "train.batch_size_per_device=4",
            "train.n_epochs=6", "train.n_warmup_epochs=1", "train.n_workers_per_device=2",
            f"logging.dir={tmp / 'ukb_runs'}",
        ],
    )
    run(config)
    run_dir = sorted((tmp / "ukb_runs").iterdir())[-1]
    losses = [json.loads(l)["loss"] for l in (run_dir / "metrics.jsonl").read_text().splitlines()]
    assert (run_dir / "cinema.safetensors").exists()
    assert losses[-1] < losses[0], losses
    print(f"pretrain OK: loss {losses[0]:.4f} -> {losses[-1]:.4f}", flush=True)


def _write_acdc_clf(root: Path) -> None:
    import pandas as pd

    from cinema_tpu.data.nifti import save_nifti

    pathologies = ["DCM", "HCM", "MINF", "NOR", "RV"]
    rng = np.random.default_rng(0)
    rows = []
    for i in range(15):
        pid = f"patient{i:03d}"
        d = root / "train" / pid
        d.mkdir(parents=True, exist_ok=True)
        for frame in ["ed", "es"]:
            save_nifti(
                d / f"{pid}_sax_{frame}.nii.gz",
                rng.uniform(0, 255, size=(16, 16, 4)).astype(np.float32),
                spacing=(1, 1, 10),
            )
            save_nifti(
                d / f"{pid}_sax_{frame}_gt.nii.gz",
                rng.integers(0, 4, size=(16, 16, 4)).astype(np.uint8),
                spacing=(1, 1, 10),
            )
        rows.append({"pid": pid, "n_slices": 4, "pathology": pathologies[i % 5], "ef": 40.0 + i})
    pd.DataFrame(rows).to_csv(root / "train_metadata.csv", index=False)


def flow_classification(tmp: Path) -> None:
    """ConvViT + ResNet (BatchNorm stats) classification fine-tune."""
    from cinema_tpu.config import apply_overrides, load_config
    from cinema_tpu.tasks.classification.acdc import run

    data = tmp / "acdc_clf"
    _write_acdc_clf(data)
    base = [
        f"data.dir={data}", "data.sax.patch_size=[16,16,4]",
        "transform.sax.translate_range=[2,2,0]",
        "model.convvit.size=tiny", "model.convvit.enc_conv_chans=[4,8]",
        "model.convvit.enc_conv_n_blocks=1", "model.convvit.drop_path=0.0",
        "train.batch_size=4", "train.batch_size_per_device=2", "train.n_epochs=2",
        "train.n_warmup_epochs=0", "train.eval_interval=2", "train.n_workers=2",
        "grad_ckpt=false",
    ]
    for model_name, extra in [("convvit", []), ("resnet", ["model.name=resnet"])]:
        out = tmp / f"clf_runs_{model_name}"
        run(apply_overrides(load_config(REPO / "cinema_tpu" / "configs" / "classification" / "acdc.yaml"),
                            base + [f"logging.dir={out}"] + extra))
        run_dir = sorted(out.iterdir())[-1]
        lines = [json.loads(l) for l in (run_dir / "metrics.jsonl").read_text().splitlines()]
        assert any("val_accuracy" in l for l in lines)
        print(f"classification[{model_name}] OK", flush=True)


def flow_landmark(tmp: Path) -> None:
    """Landmark heatmap (ConvUNetR) + coordinate (ConvViT Wing) training."""
    import pandas as pd
    from PIL import Image

    from cinema_tpu.config import apply_overrides, load_config
    from cinema_tpu.tasks.regression.landmark import run as run_coord
    from cinema_tpu.tasks.segmentation.landmark import run as run_heatmap

    root = tmp / "landmark"
    view = "lax_2c"
    (root / view / "images").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(12):
        uid = f"u{i:03d}"
        Image.fromarray(rng.integers(0, 255, size=(32, 32), dtype=np.uint8)).save(
            root / view / "images" / f"{uid}.png"
        )
        rows.append({"uid": uid, "path": f"{view}/images/{uid}.png",
                     "x1": 6, "y1": 7, "x2": 20, "y2": 10, "x3": 15, "y3": 25})
    df = pd.DataFrame(rows)
    df.iloc[:10].to_csv(root / "train_metadata.csv", index=False)
    df.iloc[10:].to_csv(root / "val_metadata.csv", index=False)

    base = [
        f"data.dir={root}", "data.lax.patch_size=[32,32]",
        "transform.lax.translate_range=[2,2]",
        "train.batch_size=4", "train.batch_size_per_device=2", "train.n_epochs=2",
        "train.n_warmup_epochs=0", "train.eval_interval=2", "train.n_workers=2",
        "grad_ckpt=false",
    ]
    run_heatmap(apply_overrides(
        load_config(REPO / "cinema_tpu" / "configs" / "segmentation" / "landmark.yaml"),
        base + [
            f"logging.dir={tmp / 'lm_heat'}",
            "model.convunetr.size=tiny", "model.convunetr.enc_conv_chans=[4,8]",
            "model.convunetr.enc_conv_n_blocks=1", "model.convunetr.dec_chans=[4,4,8,16,32]",
        ],
    ))
    print("landmark[heatmap] OK", flush=True)
    run_coord(apply_overrides(
        load_config(REPO / "cinema_tpu" / "configs" / "regression" / "landmark.yaml"),
        base + [
            f"logging.dir={tmp / 'lm_coord'}",
            "model.convvit.size=tiny", "model.convvit.enc_conv_chans=[4,8]",
            "model.convvit.enc_conv_n_blocks=1", "model.convvit.drop_path=0.0",
        ],
    ))
    print("landmark[coordinate] OK", flush=True)


def main() -> None:
    flows = sys.argv[1:] or ["all"]
    if "all" in flows:
        flows = ["entry", "pretrain", "classification", "landmark"]
    with tempfile.TemporaryDirectory(prefix="tpu_smoke_") as tmp_str:
        tmp = Path(tmp_str)
        for flow in flows:
            {
                "entry": flow_entry,
                "pretrain": lambda: flow_pretrain(tmp),
                "classification": lambda: flow_classification(tmp),
                "landmark": lambda: flow_landmark(tmp),
            }[flow]()
    print("TPU SMOKE OK:", " ".join(flows), flush=True)


if __name__ == "__main__":
    main()
