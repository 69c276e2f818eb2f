"""Execution tests for the video-EF evaluators: Kaggle (label-free EF from
per-frame segmentation) and Rescan test-retest reproducibility.

These were previously only dispatch-mocked; here each evaluator runs for
real on synthetic processed data with a tiny ConvUNetR.
"""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from cinema_tpu.config import apply_overrides, load_config
from cinema_tpu.data.nifti import save_nifti
from cinema_tpu.factory import get_segmentation_model, init_params

pytestmark = pytest.mark.slow  # full-model tier; fast tier runs -m "not slow"

CONFIG_DIR = Path(__file__).parents[1] / "cinema_tpu" / "configs"

_TINY = [
    "data.sax.patch_size=[16,16,4]",
    "model.views=sax",
    "model.convunetr.size=tiny",
    "model.convunetr.enc_conv_chans=[4,8]",
    "model.convunetr.enc_conv_n_blocks=1",
    "model.convunetr.dec_chans=[4,8,12,16,24]",
    "train.n_workers=2",
]


def _tiny_model(cfg):
    model = get_segmentation_model(cfg)
    params = init_params(model, {"sax": np.zeros((1, 16, 16, 4, 1), np.float32)})
    return model, params


def test_evaluate_kaggle_executes(tmp_path):
    from cinema_tpu.tasks.segmentation.kaggle import evaluate_kaggle

    rng = np.random.default_rng(0)
    root = tmp_path / "kaggle_proc"
    rows = []
    for pid in [10, 11]:
        d = root / "validate" / str(pid)
        d.mkdir(parents=True)
        video = rng.uniform(0, 255, size=(16, 16, 4, 6)).astype(np.float32)
        save_nifti(d / f"{pid}_sax_t.nii.gz", video, spacing=(1, 1, 10, 1))
        rows.append(
            {"pid": pid, "n_slices": 4, "n_frames": 6,
             "diastole_volume": 120.0, "systole_volume": 50.0}
        )
    pd.DataFrame(rows).to_csv(root / "validate_metadata.csv", index=False)

    cfg = apply_overrides(
        load_config(CONFIG_DIR / "segmentation" / "kaggle.yaml"),
        [f"data.dir={root}", *_TINY],
    )
    model, params = _tiny_model(cfg)
    metrics = evaluate_kaggle(model, params, cfg, split="validate")
    assert metrics["n_samples"] == 2.0
    for key in ["ef_mae", "ef_rmse", "ef_region_accuracy"]:
        assert np.isfinite(metrics[key]), key


def test_rescan_ef_eval_executes(tmp_path):
    from cinema_tpu.tasks.segmentation.rescan_ef_eval import rescan_ef_eval

    rng = np.random.default_rng(1)
    root = tmp_path / "rescan_proc"
    rows = []
    # two subjects x two acquisitions (test-retest pairs)
    for subject in ["A", "B"]:
        for acq in ["1", "2"]:
            pid = f"{subject}_{acq}"
            d = root / "test_retest" / pid
            d.mkdir(parents=True)
            video = rng.uniform(0, 255, size=(16, 16, 4, 5)).astype(np.float32)
            save_nifti(d / "sax_t.nii.gz", video, spacing=(1, 1, 10, 1))
            rows.append({"pid": pid, "subject": subject, "acq": acq, "ef": np.nan})
    pd.DataFrame(rows).to_csv(root / "test_retest_metadata.csv", index=False)

    cfg = apply_overrides(
        load_config(CONFIG_DIR / "segmentation" / "rescan.yaml"),
        [f"data.dir={root}", *_TINY],
    )
    model, params = _tiny_model(cfg)
    out_dir = tmp_path / "ef_out"
    summary = rescan_ef_eval(cfg, model, params, "test_retest", out_dir)

    per_scan = pd.read_csv(out_dir / "ef_metrics.csv")
    assert len(per_scan) == 4
    assert set(per_scan["subject"]) == {"A", "B"}
    mean = pd.read_csv(out_dir / "mean_metrics.csv")
    assert len(mean) == 1
    assert any(np.isfinite(v) for v in summary.values() if isinstance(v, float))


def test_rescan_seg_eval_frame_batched(tmp_path):
    """Labeled rescan seg eval: frames batched into shared forwards
    (chunks of eval.frames_per_forward) with per-frame metric rows — vs the
    reference's one dispatch per frame (segmentation/train.py:204-210)."""
    from cinema_tpu.tasks.evaluate import rescan_seg_eval

    rng = np.random.default_rng(2)
    root = tmp_path / "rescan_labeled"
    rows = []
    for pid in ["scan_00_A", "scan_01_A"]:
        d = root / "train" / pid
        d.mkdir(parents=True)
        n_frames = 5  # not divisible by the chunk: exercises tail wrap-pad
        video = rng.uniform(0, 255, size=(16, 16, 4, n_frames)).astype(np.float32)
        labels = rng.integers(0, 4, size=(16, 16, 4, n_frames)).astype(np.uint8)
        save_nifti(d / "sax_t.nii.gz", video, spacing=(1, 1, 10, 1))
        save_nifti(d / "sax_gt_t.nii.gz", labels, spacing=(1, 1, 10, 1))
        rows.append({"pid": pid, "n_slices": 4, "n_frames": n_frames})
    pd.DataFrame(rows).to_csv(root / "train_metadata.csv", index=False)

    cfg = apply_overrides(
        load_config(CONFIG_DIR / "segmentation" / "rescan.yaml"),
        [f"data.dir={root}", *_TINY, "eval.frames_per_forward=4"],
    )
    model, params = _tiny_model(cfg)
    out_dir = tmp_path / "seg_out"
    rescan_seg_eval(cfg, "train", out_dir, model, params)

    df = pd.read_csv(out_dir / "metrics.csv")
    assert len(df) == 10  # 2 pids x 5 frames, padded rows dropped
    assert sorted(df["frame"].unique().tolist()) == [0, 1, 2, 3, 4]
    assert df["mean_dice_score"].between(0, 1).all()
    assert (tmp_path / "seg_out" / "mean_metrics.csv").exists()
