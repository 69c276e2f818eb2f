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
