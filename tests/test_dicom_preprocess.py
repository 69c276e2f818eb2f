"""End-to-end tests for the DICOM/pickle-sourced preprocess pipelines.

Round-1 gap: kaggle/rescan/UKB preprocess were NotImplementedError stubs.
These tests drive the full pipelines on synthetic fixtures (the acdc
preprocess e2e test pattern): Kaggle study folders of hand-written DICOM
files, rescan pickles, and a UKB-layout flat DICOM dir with a manifest.
"""

from __future__ import annotations

import pickle

import numpy as np
import pandas as pd
import pytest

from cinema_tpu.data.dicom import find_series, load_dicom_folder
from cinema_tpu.data.nifti import load_nifti
from cinema_tpu.data.volume import Volume, get_origin_for_crop, get_sax_center
from tests.dicom_fixtures import (
    LAX_2C_ORIENT,
    LAX_4C_ORIENT,
    SAX_ORIENT,
    make_kaggle_study,
    write_cine_slice_dir,
    write_dicom,
)


class TestVolume:
    def test_resample_size_and_origin(self):
        vol = Volume(
            array=np.random.default_rng(0).normal(size=(16, 12, 4)).astype(np.float32),
            origin=(1.0, 2.0, 3.0),
            spacing=(2.0, 2.0, 8.0),
            rotation=np.eye(3),
        )
        out = vol.resample((1.0, 1.0, 8.0))
        assert out.array.shape == (32, 24, 4)
        # reference origin shift: +0.5 * (target - original) per component
        np.testing.assert_allclose(out.origin, (0.5, 1.5, 3.0))

    def test_resample_label_nearest_preserves_values(self):
        label = np.zeros((8, 8, 2), dtype=np.uint8)
        label[2:6, 2:6, :] = 3
        vol = Volume(array=label, origin=(0, 0, 0), spacing=(2, 2, 1), rotation=np.eye(3))
        out = vol.resample((1.0, 1.0, 1.0), is_label=True)
        assert out.array.shape == (16, 16, 2)
        assert set(np.unique(out.array)) <= {0, 3}

    def test_crop_xy_in_bounds_and_origin_shift(self):
        arr = np.arange(6 * 5 * 2, dtype=np.float32).reshape(6, 5, 2)
        vol = Volume(array=arr, origin=(10.0, 20.0, 0.0), spacing=(2, 3, 1), rotation=np.eye(3))
        out = vol.crop_xy((1, 2), (3, 2))
        np.testing.assert_array_equal(out.array, arr[1:4, 2:4])
        np.testing.assert_allclose(out.origin, (12.0, 26.0, 0.0))

    def test_crop_xy_pads_out_of_bounds(self):
        arr = np.ones((4, 4, 1, 2), dtype=np.float32)
        vol = Volume(array=arr, origin=(0, 0, 0), spacing=(1, 1, 1), rotation=np.eye(3))
        out = vol.crop_xy((-2, 3), (6, 4))
        assert out.array.shape == (6, 4, 1, 2)
        assert out.array[:2].sum() == 0  # x pad (indices -2, -1)
        assert out.array[:, 1:].sum() == 0  # y pad (indices 4..6)
        assert out.array.sum() == 4 * 1 * 1 * 2  # 4 real x rows, 1 real y col
        np.testing.assert_allclose(out.origin, (-2.0, 3.0, 0.0))

    def test_sax_center_and_crop_origin(self):
        # axial SAX plane z=0; LAX planes x=4 and y=6 -> center (4, 6, 0)
        sax = Volume(np.zeros((20, 20, 3)), (0, 0, 0), (1, 1, 8), np.eye(3))
        rot_x = np.array([[0, 0, 1], [1, 0, 0], [0, 1, 0]], dtype=float)  # normal +x
        rot_y = np.array([[1, 0, 0], [0, 0, 1], [0, 1, 0]], dtype=float)  # normal +y
        lax_2c = Volume(np.zeros((20, 20, 1)), (4, 0, 0), (1, 1, 1), rot_x)
        lax_4c = Volume(np.zeros((20, 20, 1)), (0, 6, 0), (1, 1, 1), rot_y)
        center = get_sax_center(sax, lax_2c, lax_4c)
        np.testing.assert_allclose(center, (4.0, 6.0, 0.0), atol=1e-9)
        start = get_origin_for_crop(center, sax, (8, 8))
        assert start == (0, 2)  # 4 - 3.5 = 0.5 -> int 0; 6 - 3.5 = 2.5 -> 2

    def test_save_roundtrip_affine(self, tmp_path):
        vol = Volume(
            array=np.random.default_rng(0).integers(0, 255, (6, 5, 4, 3)).astype(np.uint8),
            origin=(1.0, -2.0, 3.0),
            spacing=(1.5, 1.5, 8.0),
            rotation=np.eye(3),
        )
        vol.save(tmp_path / "v.nii.gz")
        arr, header = load_nifti(tmp_path / "v.nii.gz")
        np.testing.assert_array_equal(arr, vol.array)
        np.testing.assert_allclose(header.affine[:3], vol.affine[:3], rtol=1e-6)


class TestDicomFolder:
    def test_find_series_picks_last_uid(self, tmp_path):
        rng = np.random.default_rng(0)
        for uid, n in [("1.2.1", 2), ("1.2.9", 3)]:
            for i in range(n):
                write_dicom(
                    tmp_path / f"{uid}_{i}.dcm",
                    rng.integers(0, 100, (4, 4)).astype(np.uint16),
                    series_uid=uid,
                    instance_number=i + 1,
                )
        files = find_series(tmp_path)
        assert len(files) == 3
        assert all("1.2.9" in f.name for f in files)

    def test_load_dicom_folder_geometry_and_order(self, tmp_path):
        n_frames, n_slices = 4, 3
        for k in range(n_slices):
            write_cine_slice_dir(
                tmp_path / f"sax_{k}",
                rows=10,
                cols=8,
                n_frames=n_frames,
                position=(1.0, 2.0, k * 8.0),
                orientation=SAX_ORIENT,
                pixel_spacing=(1.5, 1.25),  # (row=dy, col=dx)
                spacing_between_slices=8.0,
                seed=k,
            )
        vol = load_dicom_folder([tmp_path / f"sax_{k}" for k in range(n_slices)])
        assert vol.array.shape == (8, 10, n_slices, n_frames)  # (x, y, z, t)
        np.testing.assert_allclose(vol.spacing, (1.25, 1.5, 8.0))
        # LPS -> RAS: x/y components of position negated
        np.testing.assert_allclose(vol.origin, (-1.0, -2.0, 0.0))
        # axis_z from slice origin difference: +z (untouched by negation)
        np.testing.assert_allclose(vol.rotation[:, 2], (0, 0, 1))
        # frames must be trigger-time ordered even though files are shuffled
        frames0 = [
            load_dicom_folder([tmp_path / "sax_0"]).array[..., 0, t] for t in range(n_frames)
        ]
        for t, f in enumerate(frames0):
            np.testing.assert_array_equal(vol.array[..., 0, t], f)

    def test_short_cine_copies_previous_frame(self, tmp_path):
        write_cine_slice_dir(
            tmp_path / "s0", rows=6, cols=6, n_frames=4, spacing_between_slices=8.0
        )
        write_cine_slice_dir(
            tmp_path / "s1",
            rows=6,
            cols=6,
            n_frames=2,  # short series; frames 2,3 copy frame 1
            position=(0, 0, 8.0),
            spacing_between_slices=8.0,
        )
        vol = load_dicom_folder([tmp_path / "s0", tmp_path / "s1"])
        assert vol.array.shape[-1] == 4  # CardiacNumberOfImages from first slice
        np.testing.assert_array_equal(vol.array[..., 1, 2], vol.array[..., 1, 1])
        np.testing.assert_array_equal(vol.array[..., 1, 3], vol.array[..., 1, 1])


class TestKagglePreprocess:
    def test_process_study_end_to_end(self, tmp_path):
        from cinema_tpu.data.preprocess.kaggle import process_study

        study_dir = tmp_path / "123" / "study"
        make_kaggle_study(study_dir, n_sax=4, n_frames=3, rows=24, cols=20)
        out_dir = tmp_path / "out"
        meta = process_study(study_dir, "123", out_dir)

        assert meta["pid"] == 123
        assert meta["n_frames"] == 3
        assert meta["n_slices"] > 0
        sax, _ = load_nifti(out_dir / "123" / "123_sax_t.nii.gz")
        lax2c, _ = load_nifti(out_dir / "123" / "123_lax_2c_t.nii.gz")
        assert sax.shape == (192, 192, meta["n_slices"], 3)
        assert lax2c.shape == (256, 256, 1, 3)
        assert sax.dtype == np.uint8
        assert sax.max() > 0  # image content survived crop around the LV center

    def test_filter_consistent_sax_slices(self):
        from cinema_tpu.data.preprocess.kaggle import filter_consistent_sax_slices

        eye = np.eye(3)
        # slice 0 has a different size; slices 1..4 consistent; slice 5 breaks spacing
        sizes = [(10, 10, 3)] + [(8, 8, 3)] * 5
        spacings = [(1, 1)] * 5 + [(2, 2)]
        directions = [eye] * 6
        origins = [np.array([0, 0, z * 8.0]) for z in range(6)]
        start, count = filter_consistent_sax_slices(sizes, spacings, directions, origins)
        assert (start, count) == (1, 4)

    def test_label_merge(self, tmp_path):
        from cinema_tpu.data.preprocess.kaggle import load_labels

        pd.DataFrame(
            {"Id": [1, 2], "Systole": [50.0, 60.0], "Diastole": [100.0, 150.0]}
        ).to_csv(tmp_path / "train.csv", index=False)
        df = load_labels(tmp_path, "train")
        np.testing.assert_allclose(df["ef"], [50.0, 60.0])


def _make_rescan_pickles(scan_dir, n_slices=3, n_frames=4, ny=24, nx=20, with_label=True):
    rng = np.random.default_rng(0)
    scan_dir.mkdir(parents=True, exist_ok=True)
    positions = np.stack(
        [np.array([-12.0, -12.0, (n_slices - 1 - k) * 8.0]) for k in range(n_slices)]
    )  # apex-first storage; the LAST row anchors the flipped stack
    sax = {
        "image_voxels": rng.integers(0, 900, (n_slices, n_frames, ny, nx)).astype(np.float32),
        "ImagePositionPatient": positions,
        "ImageOrientationPatient": np.array([1.0, 0, 0, 0, 1.0, 0]),
        "PixelSpacing": np.array([1.8, 1.8]),
        "SliceSpacing": 8.0,
    }
    with open(scan_dir / "SAX.pickle", "wb") as f:
        pickle.dump(sax, f)
    if with_label:
        seg = np.zeros((n_slices, n_frames, ny, nx), dtype=np.uint8)
        seg[:, :, 8:16, 6:14] = 1  # LV in source labels
        seg[:, 0, 6:18, 4:16] = 1  # frame 0 is the biggest -> ED
        label = dict(sax)
        label["image_segmentation"] = seg
        del label["image_voxels"]
        with open(scan_dir / "SAX_segs.pickle", "wb") as f:
            pickle.dump(label, f)
    for name, origin, orient in [
        ("2C.pickle", np.array([5.0, -10.0, -10.0]), np.array([0.0, 1, 0, 0, 0, 1])),
        ("4C.pickle", np.array([-10.0, 6.0, -10.0]), np.array([1.0, 0, 0, 0, 0, 1])),
    ]:
        lax = {
            "image_voxels": rng.integers(0, 900, (n_frames, ny, nx)).astype(np.float32),
            "ImagePositionPatient": origin,
            "ImageOrientationPatient": orient,
            "PixelSpacing": np.array([2.0, 2.0]),
        }
        with open(scan_dir / name, "wb") as f:
            pickle.dump(lax, f)


class TestRescanPreprocess:
    def test_process_labeled_split(self, tmp_path):
        from cinema_tpu.constants import LV_LABEL
        from cinema_tpu.data.preprocess.rescan import process

        _make_rescan_pickles(tmp_path / "data" / "train" / "G" / "s_0001")
        process(tmp_path / "data", tmp_path / "out", split="train")

        meta = pd.read_csv(tmp_path / "out" / "train_metadata.csv")
        assert len(meta) == 1
        assert meta.loc[0, "ed_index"] == 0  # frame 0 has the largest LV
        scan_out = tmp_path / "out" / "train" / "G" / "s_0001"
        img, _ = load_nifti(scan_out / "sax_t.nii.gz")
        gt, _ = load_nifti(scan_out / "sax_gt_t.nii.gz")
        assert img.shape == (192, 192, meta.loc[0, "n_slices"], 4)
        assert gt.shape == img.shape
        # source label 1 (LV) must arrive as unified LV_LABEL=3
        assert set(np.unique(gt)) <= {0, LV_LABEL}
        assert (gt == LV_LABEL).any()

    def test_process_paired_test_retest(self, tmp_path):
        from cinema_tpu.data.preprocess.rescan import process_paired

        data_dir = tmp_path / "data" / "test_retest_100"
        for scan_id in (7, 8, 9):
            _make_rescan_pickles(data_dir / str(scan_id), with_label=False)
        pd.DataFrame(
            {
                "A": [7],
                "B1": [8],
                "B2": [9],
                "EDV_A": [100.0],
                "ESV_A": [40.0],
                "EDV_B1": [110.0],
                "ESV_B1": [50.0],
                "EDV_B2": [90.0],
                "ESV_B2": [30.0],
            }
        ).to_csv(data_dir / "labels.csv", index=False)

        process_paired(tmp_path / "data", tmp_path / "out", split="test_retest_100")
        meta = pd.read_csv(tmp_path / "out" / "test_retest_100_metadata.csv")
        # B1 and B2 share pid scan_00_B (reference zip(ids, "ABB") quirk,
        # rescan/preprocess.py:411-419) and B2's files overwrite B1's —
        # metadata keeps ONE row per pid (the last, matching the files)
        assert list(meta["pid"]) == ["scan_00_A", "scan_00_B"]
        np.testing.assert_allclose(meta.loc[0, "ef"], 60.0)
        np.testing.assert_allclose(meta.loc[1, "edv"], 100.0)  # mean(110, 90)
        for pid in meta["pid"].unique():
            img, _ = load_nifti(tmp_path / "out" / "test_retest_100" / pid / "sax_t.nii.gz")
            assert img.shape[:2] == (192, 192)


class TestUKBDicom:
    def test_fix_manifest_date(self, tmp_path):
        from cinema_tpu.data.preprocess.ukb_dicom import fix_manifest

        src = tmp_path / "manifest.csv"
        src.write_text("filename,date\nIM-0001.dcm,Aug 30, 2015\n")
        dst = tmp_path / "fixed.csv"
        fix_manifest(src, dst)
        assert "30-Aug-2015" in dst.read_text()
        df = pd.read_csv(dst)
        assert list(df.columns) == ["filename", "date"]

    def test_get_sax_series_contiguity(self):
        from cinema_tpu.data.preprocess.ukb_dicom import get_sax_series

        df = pd.DataFrame(
            {"series discription": [f"CINE_segmented_SAX_b{i}" for i in (1, 2, 3)]}
        )
        assert get_sax_series(df, "x") == [1, 2, 3]
        df_bad = pd.DataFrame({"series discription": ["CINE_segmented_SAX_b1", "CINE_segmented_SAX_b3"]})
        with pytest.raises(ValueError, match="not continuous"):
            get_sax_series(df_bad, "x")

    def test_transform_and_crop_end_to_end(self, tmp_path):
        from cinema_tpu.data.preprocess.ukb_dicom import crop_nifti, transform_to_nifti

        n_frames, rows, cols = 3, 24, 20
        rng = np.random.default_rng(0)

        def flat_series(dcm_dir, series_name, position, orientation, uid, n_files=n_frames):
            names = []
            for t in range(n_files):
                name = f"{series_name}_{t:03d}.dcm"
                write_dicom(
                    dcm_dir / name,
                    rng.integers(100, 1000, (rows, cols)).astype(np.uint16),
                    position=position,
                    orientation=orientation,
                    pixel_spacing=(1.8, 1.8),
                    spacing_between_slices=10.0,
                    series_uid=uid,
                    series_description=series_name,
                    instance_number=t + 1,
                    trigger_time=t * 30.0,
                    cardiac_number_of_images=n_frames,
                )
                names.append(name)
            return names

        lax_dir = tmp_path / "1000001_20209_2_0"
        lax_dir.mkdir(parents=True)
        rows_csv = []
        for i, (series, pos, orient) in enumerate(
            [
                ("CINE_segmented_LAX_2Ch", (5.0, -10.0, -10.0), LAX_2C_ORIENT),
                ("CINE_segmented_LAX_3Ch", (-10.0, -10.0, 5.0), LAX_2C_ORIENT),
                ("CINE_segmented_LAX_4Ch", (-10.0, 6.0, -10.0), LAX_4C_ORIENT),
            ]
        ):
            for name in flat_series(lax_dir, series, pos, orient, uid=f"1.2.{i}"):
                rows_csv.append({"filename": name, "series discription": series})
        # known-bad derived series: listed in the manifest but its files are
        # never copied into a series folder — assembly must skip it too
        rows_csv.append(
            {"filename": "IM-9999.dcm", "series discription": "InlineVF_Results"}
        )
        pd.DataFrame(rows_csv).to_csv(lax_dir / "manifest.csv", index=False)

        sax_dir = tmp_path / "1000001_20208_2_0"
        sax_dir.mkdir(parents=True)
        rows_csv = []
        for k in range(3):
            series = f"CINE_segmented_SAX_b{k + 1}"
            # UKB SAX slice gap is 10 mm = the target spacing, so z is preserved
            for name in flat_series(
                sax_dir, series, (-12.0, -12.0, k * 10.0), SAX_ORIENT, uid=f"1.3.{k}"
            ):
                rows_csv.append({"filename": name, "series discription": series})
        pd.DataFrame(rows_csv).to_csv(sax_dir / "manifest.csv", index=False)

        out_dir = tmp_path / "out"
        data = transform_to_nifti(lax_dir, sax_dir, out_dir)
        assert data.eid == "1000001"
        assert data.sax_image.array.shape == (cols, rows, 3, n_frames)
        crop_nifti(data, out_dir)

        folder = out_dir / "1000001_2"
        sax, _ = load_nifti(folder / "1000001_2_sax.nii.gz")
        assert sax.shape == (192, 192, 3, n_frames)
        assert sax.dtype == np.uint8
        for view in ("lax_2c", "lax_3c", "lax_4c"):
            arr, _ = load_nifti(folder / f"1000001_2_{view}.nii.gz")
            assert arr.shape == (256, 256, 1, n_frames)

        # the ingest output (reference `{pid}_{view}` naming, no `_t` suffix)
        # must be discoverable by the pretrain manifest scan
        from cinema_tpu.tasks.pretrain import scan_manifest

        assert scan_manifest(out_dir, ["sax", "lax_2c", "lax_3c", "lax_4c"]) == [
            "1000001_2"
        ]
