"""Smoke tests for classification/regression/landmark tasks and the eval CLI."""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # full-model tier; fast tier runs -m "not slow"

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from cinema_tpu.config import apply_overrides, load_config
from cinema_tpu.data.nifti import save_nifti

CONFIG_DIR = Path(__file__).parent.parent / "cinema_tpu" / "configs"
PATHOLOGIES = ["DCM", "HCM", "MINF", "NOR", "RV"]


@pytest.fixture(scope="module")
def acdc_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("acdc_clf")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(15):
        pid = f"patient{i:03d}"
        pid_dir = root / "train" / pid
        pid_dir.mkdir(parents=True)
        for frame in ["ed", "es"]:
            image = rng.uniform(0, 255, size=(16, 16, 4)).astype(np.float32)
            label = rng.integers(0, 4, size=(16, 16, 4)).astype(np.uint8)
            save_nifti(pid_dir / f"{pid}_sax_{frame}.nii.gz", image, spacing=(1, 1, 10))
            save_nifti(pid_dir / f"{pid}_sax_{frame}_gt.nii.gz", label, spacing=(1, 1, 10))
        rows.append(
            {"pid": pid, "n_slices": 4, "pathology": PATHOLOGIES[i % 5], "ef": 40.0 + i}
        )
    pd.DataFrame(rows).to_csv(root / "train_metadata.csv", index=False)
    return root


def _clf_overrides(acdc_dir, out_dir):
    return [
        f"data.dir={acdc_dir}",
        "data.sax.patch_size=[16,16,4]",
        "transform.sax.translate_range=[2,2,0]",
        "model.convvit.size=tiny",
        "model.convvit.enc_conv_chans=[4,8]",
        "model.convvit.enc_conv_n_blocks=1",
        "model.convvit.drop_path=0.0",
        "train.batch_size=4",
        "train.batch_size_per_device=2",
        "train.n_epochs=2",
        "train.n_warmup_epochs=0",
        "train.eval_interval=2",
        "train.n_workers=2",
        "grad_ckpt=false",
        f"logging.dir={out_dir}",
    ]


def test_classification_task_end_to_end(acdc_dir, tmp_path):
    from cinema_tpu.tasks.classification.acdc import load_dataset, run

    cfg = apply_overrides(
        load_config(CONFIG_DIR / "classification" / "acdc.yaml"), _clf_overrides(acdc_dir, tmp_path / "runs")
    )
    train_ds, val_ds = load_dataset(cfg)
    sample = train_ds[0]
    assert sample["sax_image"].shape == (16, 16, 4, 2)  # ED+ES channels
    assert 0 <= int(sample["label"]) < 5
    run(cfg)
    run_dir = next((tmp_path / "runs").iterdir())
    lines = (run_dir / "metrics.jsonl").read_text().splitlines()
    assert any("val_accuracy" in line for line in lines)


def test_regression_task_end_to_end(acdc_dir, tmp_path):
    from cinema_tpu.tasks.regression.acdc import load_dataset, run

    cfg = apply_overrides(
        load_config(CONFIG_DIR / "regression" / "acdc.yaml"), _clf_overrides(acdc_dir, tmp_path / "runs")
    )
    train_ds, _ = load_dataset(cfg)
    assert abs(float(train_ds[0]["label"])) < 10  # z-normalised
    run(cfg)
    run_dir = next((tmp_path / "runs").iterdir())
    lines = (run_dir / "metrics.jsonl").read_text().splitlines()
    assert any("val_mae" in line for line in lines)


def test_landmark_datasets_and_losses(tmp_path):
    from PIL import Image

    from cinema_tpu.data.datasets import LandmarkDetectionDataset, LandmarkRegressionDataset

    rng = np.random.default_rng(0)
    rows = []
    for i in range(3):
        img = rng.integers(0, 255, size=(32, 32), dtype=np.uint8)
        Image.fromarray(img).save(tmp_path / f"im{i}.png")
        rows.append(
            {
                "path": f"im{i}.png",
                "x1": 5,
                "y1": 6,
                "x2": 20,
                "y2": 10,
                "x3": 15,
                "y3": 25,
            }
        )
    meta = pd.DataFrame(rows)
    det = LandmarkDetectionDataset(tmp_path, meta, view="lax_2c")
    sample = det[0]
    assert sample["lax_2c_image"].shape == (32, 32, 1)
    assert sample["lax_2c_label"].shape == (32, 32, 3)
    # heatmap peaks at the landmark coords
    hm = sample["lax_2c_label"]
    assert hm[5, 6, 0] == hm[..., 0].max()

    reg = LandmarkRegressionDataset(tmp_path, meta, view="lax_2c")
    sample = reg[0]
    assert sample["label"].shape == (6,)
    assert (sample["label"] <= 1).all()


def test_eval_dispatcher_on_run_folder(acdc_dir, tmp_path):
    """cinema_eval over a run folder produced by the seg task."""
    from cinema_tpu.tasks import evaluate
    from cinema_tpu.tasks.segmentation.acdc import run as seg_run

    cfg = apply_overrides(
        load_config(CONFIG_DIR / "segmentation" / "acdc.yaml"),
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
            "train.n_epochs=1",
            "train.n_warmup_epochs=0",
            "train.eval_interval=1",
            "train.n_workers=2",
            "grad_ckpt=false",
            f"logging.dir={tmp_path / 'runs'}",
        ],
    )
    seg_run(cfg)
    run_dir = next((tmp_path / "runs").iterdir())

    # build a "train split as test split" copy for the dispatcher
    evaluate.main(["--folder_path", str(run_dir), "--split", "train", "--data", "acdc"])
    out = run_dir / "acdc_eval"
    assert (out / "metrics.csv").exists()
    assert (out / "mean_metrics.csv").exists()
    assert (out / "ef_metrics.csv").exists()
    df = pd.read_csv(out / "metrics.csv")
    assert "mean_dice_score" in df.columns
    ef = pd.read_csv(out / "ef_metrics.csv")
    assert {"true_ef", "pred_ef", "ef_error"} <= set(ef.columns)


def test_cine_segmentation_dataset_rescan_layout(tmp_path):
    """CineSegmentationDataset must read the rescan preprocess layout:
    pid/{view}_t.nii.gz + {view}_gt_t.nii.gz 4D label, min-max normalised."""
    from cinema_tpu.data.datasets import CineSegmentationDataset
    from cinema_tpu.data.nifti import save_nifti

    pid_dir = tmp_path / "G" / "s_0001"
    pid_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    save_nifti(pid_dir / "sax_t.nii.gz", (rng.random((12, 12, 3, 4)) * 255).astype(np.uint8))
    save_nifti(pid_dir / "sax_gt_t.nii.gz", rng.integers(0, 4, (12, 12, 3, 4)).astype(np.uint8))
    meta = pd.DataFrame({"pid": ["G/s_0001"], "n_slices": [3], "n_frames": [4]})

    ds = CineSegmentationDataset(tmp_path, meta, views="sax")
    assert len(ds) == 4
    s = ds[1]
    assert s["sax_image"].shape == (12, 12, 3, 1)
    assert s["sax_label"].shape == (12, 12, 3)
    assert 0.0 <= s["sax_image"].min() and s["sax_image"].max() <= 1.0
    assert int(s["frame"]) == 1

    # unlabeled test_retest rows pass edv/esv/ef through
    meta2 = meta.assign(pid=["G/s_0001"], edv=[100.0], esv=[40.0], ef=[60.0])
    ds2 = CineSegmentationDataset(tmp_path, meta2, views="sax", has_labels=False)
    s2 = ds2[0]
    assert "sax_label" not in s2
    assert float(s2["ef"]) == 60.0


def test_eval_dispatcher_routes(monkeypatch, tmp_path):
    """Every reference dispatcher route must resolve (reference eval.py:53-171):
    landmark (heatmap + coordinate) and rescan (seg + test_retest_100 EF)."""
    from cinema_tpu.config import from_dict
    from cinema_tpu.tasks import evaluate

    calls = []

    def fake_load_run(folder, dtype=None):
        cfg = from_dict({"task": fake_load_run.task, "data": {"name": fake_load_run.data}})
        return cfg, object(), object()

    monkeypatch.setattr(evaluate, "load_run", fake_load_run)
    for route in ("rescan_seg_eval", "landmark_seg_eval", "landmark_reg_eval", "volume_seg_eval"):
        monkeypatch.setattr(
            evaluate, route, lambda *a, _r=route, **k: calls.append(_r), raising=True
        )
    monkeypatch.setattr(
        "cinema_tpu.tasks.segmentation.rescan_ef_eval.rescan_ef_eval",
        lambda *a, **k: calls.append("rescan_ef_eval"),
    )

    for task, data, split, expect in [
        ("segmentation", "rescan", "test", "rescan_seg_eval"),
        ("segmentation", "rescan", "test_retest_100", "rescan_ef_eval"),
        ("segmentation", "landmark", "test", "landmark_seg_eval"),
        ("regression", "landmark", "test", "landmark_reg_eval"),
        # emidec/myops2020 use pid-directory volume datasets, NOT the EDES
        # dataset (their layouts have no ED/ES pairing)
        ("segmentation", "emidec", "test", "volume_seg_eval"),
        ("segmentation", "myops2020", "test", "volume_seg_eval"),
    ]:
        fake_load_run.task = task
        fake_load_run.data = data
        evaluate.main(["--folder_path", str(tmp_path), "--split", split])
        assert calls[-1] == expect, (task, data, split, calls)


def test_per_dataset_eval_wrappers(monkeypatch, tmp_path):
    """Per-dataset ``*_eval`` console scripts pin --data and validate the
    run-folder task (reference pyproject.toml:58-106 CLI parity)."""
    import yaml

    from cinema_tpu.tasks import evaluate

    (tmp_path / "config.yaml").write_text(yaml.safe_dump({"task": "segmentation"}))
    seen = []
    monkeypatch.setattr(evaluate, "main", lambda argv: seen.append(argv))
    evaluate.main_acdc_seg(["--folder_path", str(tmp_path), "--split", "train"])
    assert seen[-1] == ["--folder_path", str(tmp_path), "--split", "train", "--data", "acdc"]

    with pytest.raises(ValueError, match="classification"):
        evaluate.main_acdc_clf(["--folder_path", str(tmp_path)])


def test_run_record_conventions(tmp_path):
    """Run tags + run.json match the reference's wandb record
    (reference log.py:45-76, train.py:243-257)."""
    from cinema_tpu.config import from_dict
    from cinema_tpu.log import flatten_dict, get_run_tags, init_run_dir

    assert flatten_dict({"a": {"b": 1, "c": {"d": 2}}, "e": 3}) == {"a_b": 1, "a_c_d": 2, "e": 3}

    config = from_dict(
        {
            "task": "classification",
            "seed": 7,
            "data": {"name": "acdc", "proportion": 0.5, "class_column": "pathology"},
            "model": {"name": "convvit", "views": "sax", "ckpt_path": "x.safetensors"},
            "logging": {"dir": str(tmp_path)},
        }
    )
    tags = get_run_tags(config)
    assert tags == sorted({"acdc", "convvit", "sax", "classification", "seed7", "50%", "finetuned", "pathology"})

    out_dir = init_run_dir(config)
    assert out_dir.parent == tmp_path
    record = json.loads((out_dir / "run.json").read_text())
    assert record["tags"] == tags
    assert record["config"]["data_name"] == "acdc"
    assert record["config"]["model_ckpt_path"] == "x.safetensors"


@pytest.fixture()
def landmark_dir(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("landmark_proc")
    rng = np.random.default_rng(0)
    view = "lax_2c"
    (root / view / "images").mkdir(parents=True)
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
    return root


def _landmark_overrides(landmark_dir, out_dir):
    return [
        f"data.dir={landmark_dir}",
        "data.lax.patch_size=[32,32]",
        "transform.lax.translate_range=[2,2]",
        "train.batch_size=4",
        "train.batch_size_per_device=2",
        "train.n_epochs=2",
        "train.n_warmup_epochs=0",
        "train.eval_interval=2",
        "train.n_workers=2",
        "grad_ckpt=false",
        f"logging.dir={out_dir}",
    ]


@pytest.mark.slow
def test_landmark_heatmap_task_end_to_end(landmark_dir, tmp_path):
    from cinema_tpu.tasks.segmentation.landmark import run

    cfg = apply_overrides(
        load_config(CONFIG_DIR / "segmentation" / "landmark.yaml"),
        _landmark_overrides(landmark_dir, tmp_path / "runs")
        + [
            "model.convunetr.size=tiny",
            "model.convunetr.enc_conv_chans=[4,8]",
            "model.convunetr.enc_conv_n_blocks=1",
            "model.convunetr.dec_chans=[4,4,8,16,32]",
        ],
    )
    run(cfg)
    run_dir = next((tmp_path / "runs").iterdir())
    lines = (run_dir / "metrics.jsonl").read_text().splitlines()
    assert any("val_mean_landmark_distance" in line for line in lines)


@pytest.mark.slow
def test_landmark_coordinate_task_end_to_end(landmark_dir, tmp_path):
    from cinema_tpu.tasks.regression.landmark import run

    cfg = apply_overrides(
        load_config(CONFIG_DIR / "regression" / "landmark.yaml"),
        _landmark_overrides(landmark_dir, tmp_path / "runs")
        + [
            "model.convvit.size=tiny",
            "model.convvit.enc_conv_chans=[4,8]",
            "model.convvit.enc_conv_n_blocks=1",
            "model.convvit.drop_path=0.0",
        ],
    )
    run(cfg)
    run_dir = next((tmp_path / "runs").iterdir())
    lines = (run_dir / "metrics.jsonl").read_text().splitlines()
    assert any("val_mean_coordinate_error" in line for line in lines)


def test_scan_manifest_cache_detects_new_studies(tmp_path):
    """Studies added to data_dir AFTER the manifest cache was written must be
    picked up without data.rescan (ADVICE round 4: the old cache only checked
    that its first entry still resolved)."""
    from cinema_tpu.tasks.pretrain import scan_manifest

    def add_study(pid):
        d = tmp_path / pid
        d.mkdir()
        save_nifti(
            d / f"{pid}_sax_t.nii.gz",
            np.zeros((4, 4, 2, 2), np.float32),
            spacing=(1, 1, 10, 1),
        )

    add_study("a01")
    assert scan_manifest(tmp_path, ["sax"]) == ["a01"]
    # cache exists now; a new study invalidates it via the dir-entry count
    add_study("a02")
    assert scan_manifest(tmp_path, ["sax"]) == ["a01", "a02"]
    # unchanged dir -> served from cache (same result)
    assert scan_manifest(tmp_path, ["sax"]) == ["a01", "a02"]
    # legacy list-format caches are treated as stale exactly once
    cache = next(tmp_path.glob("manifest_pids_*.json"))
    cache.write_text(json.dumps(["a01"]))
    assert scan_manifest(tmp_path, ["sax"]) == ["a01", "a02"]
