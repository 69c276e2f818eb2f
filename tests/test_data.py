"""Tests for the data engine: NIfTI IO, transforms, geometry."""

import numpy as np
import pytest

from cinema_tpu.config import from_dict
from cinema_tpu.data.geometry import (
    cast_to_uint8,
    center_crop_xy,
    clip_and_normalise_intensity,
    get_binary_mask_bounding_box,
    get_sax_center_from_planes,
    pad_array,
    plane_line_intersection,
    plane_plane_intersection,
    resample_spacing,
    world_to_voxel,
)
from cinema_tpu.data.nifti import load_nifti, load_nifti_frame, load_nifti_header, save_nifti
from cinema_tpu.data.transforms import (
    RandAdjustContrastd,
    RandAffined,
    RandCoarseDropoutd,
    RandGaussianNoised,
    RandSpatialCropd,
    RandZoomd,
    ScaleIntensityd,
    SpatialPadd,
    get_pretrain_transforms,
    get_segmentation_transforms,
)


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.float32, np.uint8, np.int16])
def test_nifti_round_trip(tmp_path, suffix, dtype):
    rng = np.random.default_rng(0)
    arr = (rng.uniform(0, 100, size=(7, 6, 5))).astype(dtype)
    path = tmp_path / f"vol{suffix}"
    save_nifti(path, arr, spacing=(1.0, 1.25, 10.0))
    back, header = load_nifti(path)
    np.testing.assert_array_equal(back, arr)
    assert header.shape == (7, 6, 5)
    np.testing.assert_allclose(header.spacing, (1.0, 1.25, 10.0), rtol=1e-6)
    assert load_nifti_header(path).shape == (7, 6, 5)


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
def test_nifti_frame_seek(tmp_path, suffix):
    rng = np.random.default_rng(1)
    arr = rng.normal(size=(6, 5, 4, 9)).astype(np.float32)
    path = tmp_path / f"cine{suffix}"
    save_nifti(path, arr, spacing=(1.0, 1.0, 10.0, 1.0))
    for t in [0, 4, 8]:
        frame, header = load_nifti_frame(path, t)
        np.testing.assert_array_equal(frame, arr[..., t])
    with pytest.raises(ValueError):
        load_nifti_frame(path, 9)
    with pytest.raises(ValueError):
        load_nifti_frame(path, -1)


def test_nifti_frame_indexed_round_trip(tmp_path):
    """frame_indexed=True writes one gzip member per frame + an FEXTRA
    offset table: still a valid .nii.gz end-to-end, identical full-volume
    and per-frame reads, and the index resolves every member boundary."""
    import gzip

    from cinema_tpu.data.nifti import read_frame_index

    rng = np.random.default_rng(2)
    arr = (rng.uniform(0, 255, size=(19, 17, 3, 11))).astype(np.uint8)
    path = tmp_path / "cine.nii.gz"
    save_nifti(path, arr, spacing=(1.0, 1.0, 10.0, 1.0), frame_indexed=True)

    # any standard gzip reader sees one concatenated stream
    with gzip.open(path, "rb") as f:
        assert len(f.read()) == 348 + 4 + arr.size

    back, header = load_nifti(path)
    np.testing.assert_array_equal(back, arr)
    assert header.shape == arr.shape

    index = read_frame_index(path)
    assert index is not None and len(index) == arr.shape[-1] + 1
    assert int(index[-1]) == path.stat().st_size
    for t in [0, 5, 10]:
        frame, _ = load_nifti_frame(path, t)
        np.testing.assert_array_equal(frame, arr[..., t])

    # python-only member inflate (native unavailable) must agree
    import cinema_tpu.data.nifti as nifti_mod

    orig = nifti_mod.native.inflate_at if hasattr(nifti_mod, "native") else None
    from cinema_tpu import native

    real = native.inflate_at
    try:
        native.inflate_at = lambda *a, **k: None
        frame, _ = load_nifti_frame(path, 7)
        np.testing.assert_array_equal(frame, arr[..., 7])
    finally:
        native.inflate_at = real


def test_nifti_frame_indexed_ignored_for_plain_paths(tmp_path):
    """frame_indexed is a no-op for raw .nii (already seekable) and 3D."""
    from cinema_tpu.data.nifti import read_frame_index

    arr = np.arange(2 * 3 * 4 * 5, dtype=np.int16).reshape(2, 3, 4, 5)
    raw = tmp_path / "cine.nii"
    save_nifti(raw, arr, frame_indexed=True)
    back, _ = load_nifti(raw)
    np.testing.assert_array_equal(back, arr)
    assert read_frame_index(raw) is None

    vol3 = tmp_path / "vol.nii.gz"
    save_nifti(vol3, arr[..., 0], frame_indexed=True)
    assert read_frame_index(vol3) is None
    np.testing.assert_array_equal(load_nifti(vol3)[0], arr[..., 0])


def test_reindex_cli_round_trip(tmp_path):
    """cinema_reindex_nifti rewrites legacy 4D .nii.gz in place with
    identical voxels/geometry and skips already-indexed + non-4D files."""
    from cinema_tpu.data.nifti import read_frame_index
    from cinema_tpu.data.preprocess.reindex import main, reindex_file

    rng = np.random.default_rng(3)
    arr = (rng.uniform(0, 255, size=(12, 10, 2, 7))).astype(np.uint8)
    p4 = tmp_path / "s01" / "s01_sax_t.nii.gz"
    p4.parent.mkdir()
    save_nifti(p4, arr, spacing=(1.0, 1.25, 10.0, 1.0))
    p3 = tmp_path / "s01" / "s01_sax_ed.nii.gz"
    save_nifti(p3, arr[..., 0])

    import sys
    from unittest import mock

    with mock.patch.object(sys, "argv", ["x", "--data_dir", str(tmp_path)]):
        main()

    assert read_frame_index(p4) is not None
    back, header = load_nifti(p4)
    np.testing.assert_array_equal(back, arr)
    np.testing.assert_allclose(header.spacing, (1.0, 1.25, 10.0, 1.0), rtol=1e-6)
    assert read_frame_index(p3) is None  # 3D untouched
    assert reindex_file(p4) == "skip:already-indexed"

    # scaled int16 input (non-UKB trees): rewrite is LOSSLESS — raw dtype
    # kept, scl fields ride along, scaled reads unchanged
    rng2 = np.random.default_rng(4)
    scaled = rng2.integers(-1000, 1000, size=(6, 5, 2, 4)).astype(np.int16)
    ps = tmp_path / "s01" / "s01_scaled_t.nii.gz"
    save_nifti(ps, scaled, spacing=(1.0, 1.0, 8.0, 1.0), scl=(0.5, -2.0))
    before, _ = load_nifti(ps)
    assert reindex_file(ps) == "ok"
    after, hdr = load_nifti(ps)
    raw, _ = load_nifti(ps, apply_scaling=False)
    assert raw.dtype == np.int16
    np.testing.assert_array_equal(raw, scaled)
    np.testing.assert_array_equal(after, before)
    assert hdr.scl_slope == 0.5 and hdr.scl_inter == -2.0


def test_nifti_frame_requires_4d(tmp_path):
    save_nifti(tmp_path / "v.nii", np.zeros((4, 4, 4), np.float32))
    with pytest.raises(ValueError, match="4D"):
        load_nifti_frame(tmp_path / "v.nii", 0)


def test_scale_intensity():
    rng = np.random.default_rng(0)
    data = {"sax_image": rng.uniform(-50, 150, size=(8, 8, 1)).astype(np.float32)}
    out = ScaleIntensityd("sax_image")(data, rng)
    assert out["sax_image"].min() == 0.0
    assert out["sax_image"].max() == 1.0


def test_spatial_pad_end():
    data = {
        "sax_image": np.ones((6, 5, 3, 1), np.float32),
        "sax_label": np.ones((6, 5, 3), np.int32),
    }
    t = SpatialPadd(("sax_image", "sax_label"), (8, 8, 4))
    out = t(data, np.random.default_rng(0))
    assert out["sax_image"].shape == (8, 8, 4, 1)
    assert out["sax_label"].shape == (8, 8, 4)
    # end padding: original content at the start
    np.testing.assert_array_equal(out["sax_image"][:6, :5, :3, 0], 1.0)
    np.testing.assert_array_equal(out["sax_image"][6:], 0.0)


def test_rand_affine_applies_same_params_to_label():
    rng = np.random.default_rng(3)
    image = np.zeros((32, 32, 1), np.float32)
    image[8:24, 8:24, 0] = 1.0
    label = (image[..., 0] > 0).astype(np.int32)
    t = RandAffined(
        image_keys="sax_image",
        label_keys="sax_label",
        prob=1.0,
        rotate_range=[45],
        translate_range=[4, 4],
        scale_range=0.1,
    )
    out = t({"sax_image": image.copy(), "sax_label": label.copy()}, rng)
    # label still matches thresholded image (same geometric transform)
    overlap = ((out["sax_image"][..., 0] > 0.5) == (out["sax_label"] > 0)).mean()
    assert overlap > 0.97
    assert out["sax_label"].dtype == label.dtype


def test_rand_affine_prob_zero_noop():
    rng = np.random.default_rng(0)
    image = np.ones((8, 8, 1), np.float32)
    t = RandAffined(image_keys="k", prob=0.0, rotate_range=[90], translate_range=[2, 2])
    out = t({"k": image.copy()}, rng)
    np.testing.assert_array_equal(out["k"], image)


def test_rand_contrast_and_noise():
    rng = np.random.default_rng(0)
    x = np.linspace(0, 1, 64, dtype=np.float32).reshape(8, 8, 1)
    out = RandAdjustContrastd("k", prob=1.0, gamma=(2.0, 2.0))({"k": x.copy()}, rng)
    # gamma preserves range but changes values
    assert out["k"].min() == pytest.approx(x.min(), abs=1e-5)
    assert out["k"].max() == pytest.approx(x.max(), abs=1e-4)
    assert not np.allclose(out["k"], x)

    out = RandGaussianNoised("k", prob=1.0, std=0.5)({"k": x.copy()}, rng)
    assert not np.allclose(out["k"], x)


def test_rand_coarse_dropout():
    rng = np.random.default_rng(0)
    x = np.ones((16, 16, 1), np.float32)
    out = RandCoarseDropoutd("k", prob=1.0, spatial_size=(4, 4))({"k": x}, rng)
    assert (out["k"] == 0).sum() == 16


def test_rand_spatial_crop_and_pad_round():
    rng = np.random.default_rng(0)
    data = {"k_image": np.ones((20, 20, 6, 1), np.float32), "k_label": np.ones((20, 20, 6), np.int32)}
    out = RandSpatialCropd(("k_image", "k_label"), (16, 16, 8))(data, rng)
    assert out["k_image"].shape == (16, 16, 6, 1)  # z smaller than roi stays
    out = SpatialPadd(("k_image", "k_label"), (16, 16, 8))(out, rng)
    assert out["k_image"].shape == (16, 16, 8, 1)
    assert out["k_label"].shape == (16, 16, 8)


def test_rand_zoom_keeps_size():
    rng = np.random.default_rng(0)
    x = np.ones((16, 16, 1), np.float32)
    out = RandZoomd("k", prob=1.0, min_zoom=0.8, max_zoom=0.8)({"k": x}, rng)
    assert out["k"].shape == (16, 16, 1)
    assert out["k"].sum() < x.sum()  # zoomed out, zero padded


def test_segmentation_pipeline_from_config():
    cfg = from_dict(
        {
            "model": {"views": "sax"},
            "data": {"sax": {"patch_size": [16, 16, 4]}},
            "transform": {
                "prob": 1.0,
                "gamma": [0.7, 1.5],
                "scale_range": 0.2,
                "sax": {
                    "rotate_range": [0, 0, 180],
                    "translate_range": [4, 4, 0],
                    "dropout_size": [4, 4, 1],
                },
            },
        }
    )
    train_t, val_t = get_segmentation_transforms(cfg)
    rng = np.random.default_rng(0)
    data = {
        "sax_image": np.random.default_rng(1).uniform(size=(20, 20, 5, 1)).astype(np.float32),
        "sax_label": np.random.default_rng(2).integers(0, 4, size=(20, 20, 5)).astype(np.int32),
    }
    out = train_t(dict(data), rng)
    assert out["sax_image"].shape == (16, 16, 4, 1)
    assert out["sax_label"].shape == (16, 16, 4)
    assert set(np.unique(out["sax_label"])) <= {0, 1, 2, 3}
    out = val_t(dict(data), rng)
    assert out["sax_image"].shape == (20, 20, 5, 1)  # val only pads, image bigger
    assert out["sax_image"].max() <= 1.0


def test_pretrain_pipeline_from_config():
    cfg = from_dict(
        {
            "transform": {"prob": 1.0, "scale_range": 0.2},
            "data": {
                "sax": {"patch_size": [16, 16, 4]},
                "lax": {"patch_size": [16, 16]},
            },
        }
    )
    t = get_pretrain_transforms(cfg)
    rng = np.random.default_rng(0)
    data = {
        "sax": np.random.default_rng(1).uniform(size=(12, 12, 3, 1)).astype(np.float32),
        "lax_2c": np.random.default_rng(2).uniform(size=(12, 12, 1)).astype(np.float32),
    }
    out = t(data, rng)
    assert out["sax"].shape == (16, 16, 4, 1)
    assert out["lax_2c"].shape == (16, 16, 1)


def test_plane_plane_intersection():
    # xy plane (normal z) and xz plane (normal y) intersect in the x axis
    rot_xy = np.eye(3)
    rot_xz = np.array([[1, 0, 0], [0, 0, 1], [0, 1, 0]], dtype=float)
    point, vec = plane_plane_intersection(rot_xy, np.zeros(3), rot_xz, np.zeros(3))
    np.testing.assert_allclose(np.abs(vec), [1, 0, 0], atol=1e-12)
    np.testing.assert_allclose(point[1:], [0, 0], atol=1e-12)


def test_plane_line_intersection():
    rot = np.eye(3)  # plane z=5
    origin = np.array([0.0, 0.0, 5.0])
    p = plane_line_intersection(rot, origin, np.zeros(3), np.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(p, [0, 0, 5])
    # parallel line -> None
    assert plane_line_intersection(rot, origin, np.zeros(3), np.array([1.0, 0.0, 0.0])) is None


def test_sax_center_from_planes():
    sax_rot = np.eye(3)  # z=0 plane
    lax_a = np.array([[0, 0, 1.0], [1, 0, 0], [0, 1, 0]]).T  # normal y... build simple
    # use two orthogonal planes whose intersection line is the z axis
    rot1 = np.array([[0, 0, 1.0], [0, 1, 0], [-1, 0, 0]])  # normal x
    rot2 = np.array([[1, 0, 0], [0, 0, 1.0], [0, -1, 0]])  # normal y
    center = get_sax_center_from_planes(sax_rot, np.zeros(3), [rot1, rot2], [np.zeros(3), np.zeros(3)])
    np.testing.assert_allclose(center, [0, 0, 0], atol=1e-12)
    del lax_a


def test_resample_spacing():
    arr = np.zeros((10, 10, 4), np.float32)
    arr[2:8] = 1.0
    out = resample_spacing(arr, (1, 1, 10), (2, 2, 10))
    assert out.shape == (5, 5, 4)
    lbl = resample_spacing(arr.astype(np.int32), (1, 1, 10), (2, 2, 10), is_label=True)
    assert set(np.unique(lbl)) <= {0, 1}
    vid = resample_spacing(np.stack([arr] * 3, axis=-1), (1, 1, 10), (2, 2, 10))
    assert vid.shape == (5, 5, 4, 3)


def test_clip_and_normalise_intensity():
    rng = np.random.default_rng(0)
    arr = rng.normal(100, 50, size=(16, 16, 4)).astype(np.float32)
    out = clip_and_normalise_intensity(arr)
    assert out.min() == 0.0 and out.max() == pytest.approx(1.0)
    vid = clip_and_normalise_intensity(np.stack([arr] * 2, axis=-1))
    assert vid.shape == (16, 16, 4, 2)


def test_cast_to_uint8():
    arr = np.linspace(-1, 1, 100).reshape(10, 10)
    out = cast_to_uint8(arr)
    assert out.dtype == np.uint8
    assert out.min() == 0 and out.max() == 255


def test_bbox_and_center_crop():
    mask = np.zeros((10, 12, 3), bool)
    mask[2:5, 4:9, 1] = True
    lo, hi = get_binary_mask_bounding_box(mask)
    np.testing.assert_array_equal(lo, [2, 4, 1])
    np.testing.assert_array_equal(hi, [5, 9, 2])
    empty_lo, empty_hi = get_binary_mask_bounding_box(np.zeros((4, 4), bool))
    np.testing.assert_array_equal(empty_lo, [0, 0])
    np.testing.assert_array_equal(empty_hi, [4, 4])

    arr = np.arange(100, dtype=np.float32).reshape(10, 10)
    out = center_crop_xy(arr, (5, 5), (4, 4))
    np.testing.assert_array_equal(out, arr[3:7, 3:7])
    # crop beyond borders zero-pads
    out = center_crop_xy(arr, (0, 0), (6, 6))
    assert out.shape == (6, 6)
    assert out[0, 0] == 0.0


def test_pad_array_and_world_to_voxel():
    arr = np.ones((4, 4))
    out = pad_array(arr, 0, 3, value=7)
    assert out.shape == (7, 4)
    assert out[0, 0] == 7

    rot = np.eye(3)
    vox = world_to_voxel(np.array([2.0, 4.0, 30.0]), rot, np.zeros(3), (1, 2, 10))
    np.testing.assert_allclose(vox, [2, 2, 3])


def _write_edes_patient(data_dir, pid="p0", size=(16, 16, 3)):
    pid_dir = data_dir / pid
    pid_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(7)
    for frame in ("ed", "es"):
        save_nifti(pid_dir / f"{pid}_sax_{frame}.nii.gz", rng.random(size).astype(np.float32))
        save_nifti(
            pid_dir / f"{pid}_sax_{frame}_gt.nii.gz",
            rng.integers(0, 4, size).astype(np.uint8),
        )


def test_seeded_augmentations_reproducible(tmp_path):
    """Two loaders with equal seeds must yield bit-identical augmented
    batches; different seeds must diverge (round-1 regression: per-item
    OS-entropy rngs made no run reproducible)."""
    import pandas as pd

    from cinema_tpu.data.datasets import BatchLoader, EDESSegmentationDataset

    _write_edes_patient(tmp_path)
    meta = pd.DataFrame({"pid": ["p0"], "n_slices": [3]})
    config = from_dict(
        {
            "model": {"views": "sax"},
            "data": {"sax": {"patch_size": [16, 16, 3]}},
            "transform": {
                "prob": 1.0,
                "gamma": [0.7, 1.5],
                "scale_range": 0.2,
                "sax": {
                    "rotate_range": [0, 0, 180],
                    "translate_range": [4, 4, 0],
                    "dropout_size": [4, 4, 1],
                },
            },
        }
    )
    transform, _val = get_segmentation_transforms(config)

    def batches(seed, n_epochs=2):
        ds = EDESSegmentationDataset(tmp_path, meta, views="sax", transform=transform)
        ds.seed = seed
        loader = BatchLoader(ds, batch_size=2, shuffle=True, seed=seed, n_workers=1)
        return [b["sax_image"] for _ in range(n_epochs) for b in loader]

    a, b, c = batches(0), batches(0), batches(1)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    assert any(not np.array_equal(x, y) for x, y in zip(a, c))
    # epochs must differ from each other (epoch folds into the item rng)
    assert not np.array_equal(a[0], a[1])


def test_process_workers_match_thread_workers(tmp_path):
    """Spawned process workers must produce the same (seeded) batches as
    in-process loading, epoch threading included."""
    import pandas as pd

    from cinema_tpu.data.datasets import BatchLoader, EDESSegmentationDataset

    _write_edes_patient(tmp_path)
    meta = pd.DataFrame({"pid": ["p0"], "n_slices": [3]})

    def batches(use_processes):
        ds = EDESSegmentationDataset(tmp_path, meta, views="sax")
        ds.seed = 3
        loader = BatchLoader(
            ds, batch_size=2, shuffle=True, seed=3, n_workers=2, use_processes=use_processes
        )
        return [b["sax_image"] for _ in range(2) for b in loader]

    for a, b in zip(batches(False), batches(True)):
        np.testing.assert_array_equal(a, b)


def test_device_prefetch_order_and_depth():
    from cinema_tpu.data.datasets import device_prefetch

    puts = []
    out = list(device_prefetch(iter(range(5)), lambda x: puts.append(x) or x * 10, depth=2))
    assert out == [0, 10, 20, 30, 40]
    assert puts == [0, 1, 2, 3, 4]


def test_process_4d_and_center_pad():
    from cinema_tpu.data.geometry import center_pad, get_center_pad_size, process_4d

    arr = np.arange(2 * 3 * 4 * 5, dtype=np.float32).reshape(2, 3, 4, 5)
    doubled = process_4d(arr, lambda frame: frame * 2)
    np.testing.assert_array_equal(doubled, arr * 2)
    with pytest.raises(ValueError):
        process_4d(arr[..., 0], lambda f: f)

    lower, upper = get_center_pad_size((5, 8), (8, 8))
    assert lower == (1, 0) and upper == (2, 0)

    # trailing time axis untouched; symmetric split like sitk.ConstantPad
    padded = center_pad(np.ones((5, 8, 3, 2)), (8, 8, 4))
    assert padded.shape == (8, 8, 4, 2)
    assert padded[0].sum() == 0 and padded[1:6, :, :3].sum() == 5 * 8 * 3 * 2


def test_valid_and_invalid_bounding_box():
    from cinema_tpu.data.geometry import (
        get_invalid_bounding_box,
        get_valid_binary_mask_bounding_box,
    )

    mask = np.zeros((6, 7, 8), dtype=bool)
    mask[2:4, 1:6, 5] = True
    bbox_min, bbox_max = get_valid_binary_mask_bounding_box(mask)
    np.testing.assert_array_equal(bbox_min, [2, 1, 5])
    np.testing.assert_array_equal(bbox_max, [4, 6, 6])

    inv_min, inv_max = get_invalid_bounding_box(mask)
    np.testing.assert_array_equal(inv_min, [-1, -1, -1])
    np.testing.assert_array_equal(inv_max, [-1, -1, -1])


def test_save_nifti_like(tmp_path):
    from cinema_tpu.data.nifti import save_nifti_like

    rng = np.random.default_rng(3)
    ref = rng.normal(size=(6, 5, 4, 9)).astype(np.float32)
    ref_path = tmp_path / "ref.nii.gz"
    save_nifti(ref_path, ref, spacing=(1.0, 1.25, 10.0, 1.0))

    # same-size 4D: geometry copied
    out_path = tmp_path / "out.nii.gz"
    save_nifti_like(np.ones_like(ref), ref_path, out_path)
    back, header = load_nifti(out_path)
    assert back.shape == (6, 5, 4, 9)
    np.testing.assert_allclose(header.spacing[:3], (1.0, 1.25, 10.0), rtol=1e-6)

    # 3D array against 4D reference (rescan): first-frame geometry
    out3d = tmp_path / "out3d.nii.gz"
    save_nifti_like(np.ones((6, 5, 4), np.float32), ref_path, out3d)
    assert load_nifti(out3d)[0].shape == (6, 5, 4)

    # frame-count mismatch: clamp to the shorter length (Kaggle semantics)
    out_clamped = tmp_path / "clamped.nii.gz"
    save_nifti_like(np.ones((6, 5, 4, 12), np.float32), ref_path, out_clamped)
    assert load_nifti(out_clamped)[0].shape == (6, 5, 4, 9)

    # incompatible spatial shape raises
    with pytest.raises(ValueError):
        save_nifti_like(np.ones((7, 5, 4, 9), np.float32), ref_path, tmp_path / "bad.nii.gz")

    # no reference: plain save
    save_nifti_like(np.ones((6, 5, 4), np.float32), None, tmp_path / "noref.nii.gz")
    assert load_nifti(tmp_path / "noref.nii.gz")[0].shape == (6, 5, 4)
