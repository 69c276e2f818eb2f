"""End-to-end fine-tune slice: synthetic ACDC data -> acdc segmentation task.

Exercises datasets + loader + transforms + training loop + optimizer +
sliding-window eval + early stopping + orbax checkpointing + safetensors
export, with a tiny ConvUNetR on the CPU mesh.
"""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # full-model tier; fast tier runs -m "not slow"

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from cinema_tpu.config import apply_overrides, load_config
from cinema_tpu.data.nifti import save_nifti

CONFIG = Path(__file__).parent.parent / "cinema_tpu" / "configs" / "segmentation" / "acdc.yaml"

PATHOLOGIES = ["DCM", "HCM", "MINF", "NOR", "RV"]


@pytest.fixture(scope="module")
def acdc_dir(tmp_path_factory):
    """Synthetic ACDC-like processed directory."""
    root = tmp_path_factory.mktemp("acdc")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(15):  # 3 per pathology so the val split (2/pathology) works
        pid = f"patient{i:03d}"
        pid_dir = root / "train" / pid
        pid_dir.mkdir(parents=True)
        n_slices = int(rng.integers(4, 6))
        for frame in ["ed", "es"]:
            image = rng.uniform(0, 255, size=(20, 20, n_slices)).astype(np.float32)
            label = rng.integers(0, 4, size=(20, 20, n_slices)).astype(np.uint8)
            save_nifti(pid_dir / f"{pid}_sax_{frame}.nii.gz", image, spacing=(1, 1, 10))
            save_nifti(pid_dir / f"{pid}_sax_{frame}_gt.nii.gz", label, spacing=(1, 1, 10))
        rows.append({"pid": pid, "n_slices": n_slices, "pathology": PATHOLOGIES[i % 5]})
    pd.DataFrame(rows).to_csv(root / "train_metadata.csv", index=False)
    return root


def _tiny_config(acdc_dir, out_dir):
    cfg = load_config(CONFIG)
    return apply_overrides(
        cfg,
        [
            f"data.dir={acdc_dir}",
            "data.sax.patch_size=[16,16,4]",
            "transform.sax.translate_range=[2,2,0]",
            "transform.sax.dropout_size=[4,4,1]",
            "model.convunetr.size=tiny",
            "model.convunetr.enc_conv_chans=[4,8]",
            "model.convunetr.enc_conv_n_blocks=1",
            "model.convunetr.dec_chans=[4,8,12,16,24]",
            "model.convunetr.dropout=0.0",
            "model.convunetr.drop_path=0.0",
            "train.batch_size=4",
            "train.batch_size_per_device=2",
            "train.n_epochs=2",
            "train.n_warmup_epochs=0",
            "train.eval_interval=2",
            "train.n_workers=2",
            "grad_ckpt=false",
            f"logging.dir={out_dir}",
        ],
    )


@pytest.fixture(scope="module")
def first_run(acdc_dir, tmp_path_factory):
    """One 2-epoch fine-tune run shared by the e2e asserts AND as the resume
    source — the run itself is the expensive part (train-step compile)."""
    from cinema_tpu.tasks.segmentation.acdc import run

    out = tmp_path_factory.mktemp("acdc_run") / "runs"
    cfg = _tiny_config(acdc_dir, out)
    run(cfg)
    run_dirs = list(out.iterdir())
    assert len(run_dirs) == 1
    return cfg, run_dirs[0]


def test_acdc_task_end_to_end(acdc_dir, first_run):
    from cinema_tpu.tasks.segmentation.acdc import load_dataset

    cfg, run_dir = first_run

    train_ds, val_ds = load_dataset(cfg)
    assert len(val_ds) == 2 * 10  # 2 per pathology x 5 pathologies x ED/ES
    assert len(train_ds) == 2 * 5
    sample = train_ds[0]
    assert sample["sax_image"].shape == (16, 16, 4, 1)
    assert sample["sax_label"].shape == (16, 16, 4)

    metrics = [json.loads(line) for line in (run_dir / "metrics.jsonl").read_text().splitlines()]
    train_records = [m for m in metrics if "train_loss" in m]
    val_records = [m for m in metrics if "val_mean_dice_score" in m]
    assert len(train_records) == 2
    assert len(val_records) == 1
    assert np.isfinite(train_records[-1]["train_loss"])
    assert np.isfinite(val_records[-1]["val_mean_dice_score"])
    assert 0 <= val_records[-1]["val_mean_dice_score"] <= 1
    # checkpoint + safetensors export exist
    assert list(run_dir.glob("ckpt_*"))
    assert list(run_dir.glob("model_*.safetensors"))
    assert (run_dir / "config.yaml").exists()


def test_acdc_eval_loads_exported_safetensors(acdc_dir, tmp_path):
    """The exported safetensors round-trips through the torch bridge."""
    import jax

    from cinema_tpu.bridge.torch_loader import load_torch_state_dict
    from cinema_tpu.data.datasets import BatchLoader
    from cinema_tpu.factory import get_segmentation_model, init_params, load_safetensors
    from cinema_tpu.tasks.segmentation import segmentation_eval_dataloader
    from cinema_tpu.tasks.segmentation.acdc import load_dataset

    cfg = _tiny_config(acdc_dir, tmp_path / "runs2")
    model = get_segmentation_model(cfg)
    _, val_ds = load_dataset(cfg)
    params = init_params(model, {"sax": np.zeros((1, 16, 16, 4, 1), np.float32)})

    from cinema_tpu.train.checkpoint import save_params_safetensors

    path = tmp_path / "model.safetensors"
    save_params_safetensors(params, path)
    restored, _, _ = load_torch_state_dict(
        jax.tree.map(np.zeros_like, params), load_safetensors(path), strict=True
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), params, restored
    )

    # eval a couple of studies with sliding window (20x20x5 vs patch 16x16x4)
    val_loader = BatchLoader(
        # restrict to 2 samples for speed
        type(val_ds)(val_ds.data_dir, val_ds.meta_df.iloc[:1], "sax", val_ds.transform),
        batch_size=1,
        n_workers=1,
    )
    metrics = segmentation_eval_dataloader(model, restored, val_loader, cfg)
    assert "mean_dice_score" in metrics
    assert np.isfinite(metrics["mean_dice_score"])


def test_acdc_resume_from_checkpoint(acdc_dir, first_run, tmp_path):
    """A fine-tune interrupted after its checkpoint resumes past the epochs
    already trained (train.resume_path; beyond the reference, whose run_train
    cannot resume). Resumes from the shared first_run (n_epochs=2,
    eval_interval=2 -> saved ckpt_1)."""
    from cinema_tpu.config import apply_overrides
    from cinema_tpu.tasks.segmentation.acdc import run

    _, first = first_run
    ckpt = first / "ckpt_1"
    assert ckpt.exists()

    cfg2 = _tiny_config(acdc_dir, tmp_path / "runs_resumed")
    cfg2 = apply_overrides(cfg2, ["train.n_epochs=4", f"train.resume_path={ckpt}"])
    run(cfg2)
    second = next((tmp_path / "runs_resumed").iterdir())
    metrics = [json.loads(line) for line in (second / "metrics.jsonl").read_text().splitlines()]
    train_epochs = [m["epoch"] for m in metrics if "train_loss" in m]
    assert train_epochs == [2, 3], f"resume must continue at epoch 2, logged {train_epochs}"
    # saved-best is monotone across the resume: ckpt_3 exists iff the
    # resumed run's eval beat the best restored from ckpt_1's meta sidecar
    first_metrics = [
        json.loads(line) for line in (first / "metrics.jsonl").read_text().splitlines()
    ]
    best_before = max(m["val_mean_dice_score"] for m in first_metrics if "val_mean_dice_score" in m)
    val_after = [m["val_mean_dice_score"] for m in metrics if "val_mean_dice_score" in m]
    assert val_after, "resumed run must eval at epoch 3"
    if (second / "ckpt_3").exists():
        assert max(val_after) > best_before
    else:
        assert max(val_after) <= best_before
