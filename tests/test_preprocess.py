"""End-to-end test of the ACDC preprocess CLI on synthetic raw data."""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from cinema_tpu.data.nifti import load_nifti, save_nifti


@pytest.fixture()
def raw_acdc(tmp_path):
    rng = np.random.default_rng(0)
    for i in [1, 2]:
        pid = f"patient{i:03d}"
        d = tmp_path / "training" / pid
        d.mkdir(parents=True)
        # raw spacing (1.5, 1.5, 5) -> resampled to (1, 1, 10)
        shape = (64, 64, 10)
        video = rng.uniform(0, 500, size=(*shape, 4)).astype(np.float32)
        save_nifti(d / f"{pid}_4d.nii.gz", video, spacing=(1.5, 1.5, 5.0, 1.0))
        label = np.zeros(shape, np.uint8)
        label[20:30, 20:30, 2:8] = 3  # LV (ACDC class 3)
        label[15:20, 20:30, 2:8] = 2  # MYO
        label[10:15, 20:30, 2:8] = 1  # RV
        for frame, idx in [("01", 1), ("04", 4)]:
            img = rng.uniform(0, 500, size=shape).astype(np.float32)
            save_nifti(d / f"{pid}_frame{frame}.nii.gz", img, spacing=(1.5, 1.5, 5.0))
            save_nifti(d / f"{pid}_frame{frame}_gt.nii.gz", label, spacing=(1.5, 1.5, 5.0))
        (d / "Info.cfg").write_text(
            "ED: 1\nES: 4\nGroup: DCM\nHeight: 184.0\nNbFrame: 4\nWeight: 95.0\n"
        )
    return tmp_path


def test_acdc_preprocess_end_to_end(raw_acdc, tmp_path):
    from cinema_tpu.data.preprocess.acdc import main
    import sys

    out = tmp_path / "processed"
    argv = sys.argv
    sys.argv = ["acdc_preprocess", "--data_dir", str(raw_acdc), "--out_dir", str(out)]
    try:
        main()
    finally:
        sys.argv = argv

    meta = pd.read_csv(out / "train_metadata.csv")
    assert len(meta) == 2
    assert {"pid", "n_slices", "pathology", "ef", "lv_edv", "bmi"} <= set(meta.columns)
    assert (meta["pathology"] == "DCM").all()
    # z: 10 slices @ 5mm -> 5 slices @ 10mm
    assert (meta["n_slices"] == 5).all()
    # EF is 0 here (same label for ED/ES)
    assert np.allclose(meta["ef"], 0.0)

    pid = meta.iloc[0]["pid"]
    img, header = load_nifti(out / "train" / pid / f"{pid}_sax_ed.nii.gz")
    assert img.dtype == np.uint8
    # x/y 64 @ 1.5mm -> 96 @ 1mm, below the 192 crop -> unchanged
    assert img.shape == (96, 96, 5)
    np.testing.assert_allclose(header.spacing, (1, 1, 10), atol=1e-5)
    gt, _ = load_nifti(out / "train" / pid / f"{pid}_sax_ed_gt.nii.gz")
    assert set(np.unique(gt)) <= {0, 1, 2, 3}
    vid, _ = load_nifti(out / "train" / pid / f"{pid}_sax_t.nii.gz")
    assert vid.shape == (96, 96, 5, 4)

    # the processed folder feeds the training dataset directly
    from cinema_tpu.data.datasets import EDESSegmentationDataset

    ds = EDESSegmentationDataset(out / "train", meta, views="sax")
    sample = ds[0]
    assert sample["sax_image"].shape == (96, 96, 5, 1)
    assert sample["sax_label"].shape == (96, 96, 5)


@pytest.fixture()
def raw_mnms2(tmp_path):
    rng = np.random.default_rng(1)
    root = tmp_path / "mnms2_raw"
    rows = []
    for pid in [1, 161, 201]:  # one per split
        d = root / "dataset" / str(pid)
        d.mkdir(parents=True)
        shape = (48, 48, 8)
        label = np.zeros(shape, np.uint8)
        label[18:28, 18:28, 2:6] = 1  # raw LV (mnms2 class 1)
        label[14:18, 18:28, 2:6] = 2  # MYO
        label[10:14, 18:28, 2:6] = 3  # RV
        lax = np.zeros((64, 64, 1), np.uint8)
        lax[20:40, 25:45, 0] = 1
        for tag in ["ED", "ES"]:
            img = rng.uniform(0, 300, size=shape).astype(np.float32)
            save_nifti(d / f"{pid}_SA_{tag}.nii.gz", img, spacing=(1.25, 1.25, 10.0))
            save_nifti(d / f"{pid}_SA_{tag}_gt.nii.gz", label, spacing=(1.25, 1.25, 10.0))
            save_nifti(d / f"{pid}_LA_{tag}.nii.gz",
                       rng.uniform(0, 300, size=(64, 64, 1)).astype(np.float32),
                       spacing=(1.5, 1.5, 8.0))
            save_nifti(d / f"{pid}_LA_{tag}_gt.nii.gz", lax, spacing=(1.5, 1.5, 8.0))
        rows.append({"SUBJECT_CODE": pid, "DISEASE": "NOR", "VENDOR": "A",
                     "SCANNER": "s1", "FIELD": 1.5})
    pd.DataFrame(rows).to_csv(root / "dataset_information.csv", index=False)
    return root


def test_mnms2_preprocess_end_to_end(raw_mnms2, tmp_path, monkeypatch):
    from cinema_tpu.data.preprocess.mnms2 import main
    from cinema_tpu.constants import LV_LABEL, RV_LABEL

    out = tmp_path / "mnms2_out"
    monkeypatch.setattr(
        "sys.argv", ["mnms2_preprocess", "--data_dir", str(raw_mnms2), "--out_dir", str(out)]
    )
    main()

    for split, pid in [("train", 1), ("val", 161), ("test", 201)]:
        meta = pd.read_csv(out / f"{split}_metadata.csv")
        assert len(meta) == 1 and int(meta["pid"].iloc[0]) == pid
        assert 0 < meta["ef"].iloc[0] < 100 or meta["ef"].iloc[0] == 0.0
        pdir = out / split / str(pid)
        # 48 @ 1.25mm -> 60 @ 1mm, below the 192 crop -> unchanged (the
        # reference only crops; padding happens in the train transforms)
        sax, h = load_nifti(pdir / f"{pid}_sax_ed.nii.gz")
        assert sax.shape == (60, 60, 8) and sax.dtype == np.uint8
        np.testing.assert_allclose(h.spacing, (1.0, 1.0, 10.0), rtol=1e-6)
        gt, _ = load_nifti(pdir / f"{pid}_sax_ed_gt.nii.gz")
        # raw mnms2 labels 1/2/3 = LV/MYO/RV remap to unified RV=1, MYO=2, LV=3
        assert set(np.unique(gt)) <= {0, 1, 2, 3}
        assert (gt == LV_LABEL).sum() > 0 and (gt == RV_LABEL).sum() > 0
        lax, hl = load_nifti(pdir / f"{pid}_lax_4c_ed.nii.gz")
        # 64 @ 1.5mm -> 96 @ 1mm, below the 256 crop -> unchanged
        assert lax.shape == (96, 96, 1) and lax.dtype == np.uint8
        lax_gt, _ = load_nifti(pdir / f"{pid}_lax_4c_ed_gt.nii.gz")
        assert (lax_gt == LV_LABEL).sum() > 0  # raw 1 -> LV


def test_landmark_preprocess_end_to_end(tmp_path, monkeypatch):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from cinema_tpu.data.preprocess.landmark import main

    rng = np.random.default_rng(2)
    root = tmp_path / "landmark_raw"
    rows = []
    for view in ["lax_2c", "lax_4c"]:
        (root / view / "images").mkdir(parents=True)
        for i in range(10):
            uid = f"u{i:03d}"
            arr = rng.integers(0, 255, size=(128, 128), dtype=np.uint8)
            Image.fromarray(arr).save(root / view / "images" / f"{uid}.png")
            for k in range(3):
                rows.append((f"c", uid, view, k + 1, 20.0 + 8 * k, 30.0 + 4 * k))
        pd.DataFrame([r for r in rows if r[2] == view]).to_csv(
            root / f"{view}.csv", index=False, header=False
        )
    out = tmp_path / "landmark_out"
    for view in ["lax_2c", "lax_4c"]:
        monkeypatch.setattr(
            "sys.argv",
            ["landmark_preprocess", "--data_dir", str(root), "--out_dir", str(out / view),
             "--view", view, "--scale", "0.25"],
        )
        main()
        meta = pd.read_csv(out / view / "train_metadata.csv")
        assert len(meta) == 8  # 8/1/1 split of 10
        assert {"x1", "y1", "x2", "y2", "x3", "y3"} <= set(meta.columns)
        img = Image.open(out / view / meta["path"].iloc[0])
        assert img.size == (32, 32)  # 128 * 0.25
        # scaled coordinates stay inside the downscaled image
        assert meta[["x1", "x2", "x3", "y1", "y2", "y3"]].to_numpy().max() < 32

    # both views into ONE out_dir: the split CSVs merge instead of the
    # second view overwriting the first; the dataset filters by view
    shared = tmp_path / "landmark_shared"
    for view in ["lax_2c", "lax_4c"]:
        monkeypatch.setattr(
            "sys.argv",
            ["landmark_preprocess", "--data_dir", str(root), "--out_dir", str(shared),
             "--view", view, "--scale", "0.25"],
        )
        main()
    meta = pd.read_csv(shared / "train_metadata.csv")
    assert len(meta) == 16 and set(meta["view"]) == {"lax_2c", "lax_4c"}
    from cinema_tpu.data.datasets import LandmarkDetectionDataset

    ds = LandmarkDetectionDataset(shared, meta, "lax_4c")
    assert len(ds) == 8
    assert all(ds.meta_df["view"] == "lax_4c")


def test_emidec_preprocess_end_to_end(tmp_path, monkeypatch):
    from cinema_tpu.data.preprocess.emidec import main

    rng = np.random.default_rng(3)
    root = tmp_path / "emidec_raw"
    for pid in ["N001", "P002"]:
        (root / f"Case_{pid}" / "Images").mkdir(parents=True)
        (root / f"Case_{pid}" / "Contours").mkdir(parents=True)
        (root / f"Case {pid}.txt").write_text("Sex : M\nAge : 61\nFEVG : 55.0\n")
        shape = (40, 40, 6)
        img = rng.uniform(0, 400, size=shape).astype(np.float32)
        label = np.zeros(shape, np.uint8)
        label[15:25, 15:25, 1:5] = 1  # cavity
        label[12:15, 15:25, 1:5] = 2  # myocardium
        label[12:14, 15:18, 2:4] = 3  # infarct
        save_nifti(root / f"Case_{pid}" / "Images" / f"Case_{pid}.nii.gz", img,
                   spacing=(1.458, 1.458, 8.0))
        save_nifti(root / f"Case_{pid}" / "Contours" / f"Case_{pid}.nii.gz", label,
                   spacing=(1.458, 1.458, 8.0))
    out = tmp_path / "emidec_out"
    monkeypatch.setattr("sys.argv", ["emidec_preprocess", "--data_dir", str(root), "--out_dir", str(out)])
    main()

    meta = pd.read_csv(out / "train_metadata.csv")
    assert len(meta) == 2
    assert set(meta["pathology"]) == {"N", "P"}
    assert (meta["ef"] == 55.0).all() and (meta["age"] == 61).all()
    img, h = load_nifti(out / "train" / "N001" / "N001.nii.gz")
    assert img.dtype == np.uint8
    np.testing.assert_allclose(h.spacing, (1.458, 1.458, 10.0), rtol=1e-5)
    gt, _ = load_nifti(out / "train" / "N001" / "N001_gt.nii.gz")
    assert set(np.unique(gt)) <= {0, 1, 2, 3, 4}
    assert meta["cls_2_proportion"].iloc[0] > 0


def test_myops2020_preprocess_end_to_end(tmp_path, monkeypatch):
    from cinema_tpu.data.preprocess.myops2020 import MYOPS2020_LABEL_MAP, main

    rng = np.random.default_rng(4)
    root = tmp_path / "myops_raw"
    (root / "train25").mkdir(parents=True)
    (root / "train25_myops_gd").mkdir()
    (root / "test20").mkdir()
    shape = (300, 300, 4)
    for pid in ["101", "102"]:
        for tag in ["C0", "DE", "T2"]:
            arr = rng.uniform(0, 800, size=shape).astype(np.float32)
            save_nifti(root / "train25" / f"myops_training_{pid}_{tag}.nii.gz", arr,
                       spacing=(0.75, 0.75, 12.0))
        label = np.zeros(shape, np.int32)  # raw codes up to 2221
        for k, src in enumerate(sorted(MYOPS2020_LABEL_MAP)):
            label[120 + 6 * k : 126 + 6 * k, 130:170, :] = src
        save_nifti(root / "train25_myops_gd" / f"myops_training_{pid}_gd.nii.gz", label,
                   spacing=(0.75, 0.75, 12.0))
    for tag in ["C0", "DE", "T2"]:
        save_nifti(root / "test20" / f"myops_test_{pid}_{tag}.nii.gz",
                   rng.uniform(0, 800, size=shape).astype(np.float32),
                   spacing=(0.75, 0.75, 12.0))
    out = tmp_path / "myops_out"
    monkeypatch.setattr("sys.argv", ["myops2020_preprocess", "--data_dir", str(root), "--out_dir", str(out)])
    main()

    meta = pd.read_csv(out / "train_metadata.csv")
    assert len(meta) == 2
    for key in ["c0", "de", "t2"]:
        arr, _ = load_nifti(out / "train" / "101" / f"101_{key}.nii.gz")
        assert arr.dtype == np.uint8 and arr.shape[:2] != shape[:2]
    gt, _ = load_nifti(out / "train" / "101" / "101_gt.nii.gz")
    assert set(np.unique(gt)) == {0, *MYOPS2020_LABEL_MAP.values()}
    test_meta = pd.read_csv(out / "test_metadata.csv")
    assert len(test_meta) == 1
    assert not (out / "test" / "102" / "102_gt.nii.gz").exists()


def test_console_scripts_resolve():
    """Every pyproject console script must import and expose its callable."""
    import importlib
    import tomllib

    with open(Path(__file__).parents[1] / "pyproject.toml", "rb") as f:
        scripts = tomllib.load(f)["project"]["scripts"]
    # every console script the reference declares (pyproject.toml:48-106)
    reference_scripts = {
        "ukb_mae_pretrain", "cinema_eval",
        "acdc_preprocess", "acdc_seg_train", "acdc_seg_eval",
        "acdc_clf_train", "acdc_clf_eval", "acdc_reg_train", "acdc_reg_eval",
        "mnms_preprocess", "mnms_seg_train", "mnms_seg_eval",
        "mnms_clf_train", "mnms_clf_eval", "mnms_reg_train", "mnms_reg_eval",
        "mnms2_preprocess", "mnms2_seg_train", "mnms2_seg_eval",
        "mnms2_clf_train", "mnms2_clf_eval", "mnms2_reg_train", "mnms2_reg_eval",
        "kaggle_preprocess", "kaggle_seg_eval",
        "rescan_preprocess", "rescan_seg_train", "rescan_seg_eval",
        "emidec_preprocess", "emidec_seg_train", "emidec_seg_eval",
        "myops2020_preprocess", "myops2020_seg_train", "myops2020_seg_eval",
        "landmark_preprocess", "landmark_seg_train", "landmark_seg_eval",
        "landmark_reg_train", "landmark_reg_eval",
    }
    missing = reference_scripts - set(scripts)
    assert not missing, f"reference console scripts missing: {sorted(missing)}"
    for name, target in scripts.items():
        module, func = target.split(":")
        mod = importlib.import_module(module)
        assert callable(getattr(mod, func)), f"{name} -> {target} not callable"


def test_mnms_preprocess_end_to_end(tmp_path, monkeypatch):
    from cinema_tpu.constants import LV_LABEL, RV_LABEL
    from cinema_tpu.data.preprocess.mnms import main

    rng = np.random.default_rng(5)
    root = tmp_path / "mnms_raw"
    rows = []
    for pid, sub in [("A0S9V9", Path("Training") / "Labeled"), ("B1T2W3", Path("Validation"))]:
        d = root / sub / pid
        d.mkdir(parents=True)
        shape = (48, 48, 8)
        video = rng.uniform(0, 300, size=(*shape, 5)).astype(np.float32)
        labels = np.zeros((*shape, 5), np.uint8)
        # ED frame 0 (bigger LV), ES frame 3 (smaller LV); raw 1=LV 2=MYO 3=RV
        labels[16:30, 16:30, 2:6, 0] = 1
        labels[18:28, 18:28, 2:6, 3] = 1
        labels[12:16, 16:30, 2:6, [0, 3]] = 2
        labels[8:12, 16:30, 2:6, [0, 3]] = 3
        save_nifti(d / f"{pid}_sa.nii.gz", video, spacing=(1.25, 1.25, 10.0, 1.0))
        save_nifti(d / f"{pid}_sa_gt.nii.gz", labels, spacing=(1.25, 1.25, 10.0, 1.0))
        rows.append({"Unnamed: 0": 0, "External code": pid, "Pathology": "NOR",
                     "Vendor": "A", "Centre": 1, "ED": 0, "ES": 3,
                     "Age": 60, "Sex": "M", "Height": 170, "Weight": 70})
    pd.DataFrame(rows).to_csv(
        root / "211230_M&Ms_Dataset_information_diagnosis_opendataset.csv", index=False
    )
    out = tmp_path / "mnms_out"
    monkeypatch.setattr("sys.argv", ["mnms_preprocess", "--data_dir", str(root), "--out_dir", str(out)])
    main()

    train = pd.read_csv(out / "train_metadata.csv")
    val = pd.read_csv(out / "val_metadata.csv")
    assert len(train) == 1 and train["pid"].iloc[0] == "A0S9V9"
    assert len(val) == 1 and val["pid"].iloc[0] == "B1T2W3"
    # ED LV bigger than ES LV => positive EF
    assert 0 < train["lv_ef"].iloc[0] < 100
    img, h = load_nifti(out / "train" / "A0S9V9" / "A0S9V9_sax_ed.nii.gz")
    assert img.dtype == np.uint8
    np.testing.assert_allclose(h.spacing, (1.0, 1.0, 10.0), rtol=1e-6)
    gt, _ = load_nifti(out / "train" / "A0S9V9" / "A0S9V9_sax_ed_gt.nii.gz")
    assert (gt == LV_LABEL).sum() > (gt == RV_LABEL).sum() > 0  # remapped 1->3, 3->1
