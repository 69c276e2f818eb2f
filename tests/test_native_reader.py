"""Native (C++/zlib) NIfTI frame reader: parity with the Python reader.

Builds the shared library with g++ on first use; every test skips cleanly
when no compiler/zlib is present (the Python fallback is then the active
path and is covered by test_data.py).
"""

import gzip

import numpy as np
import pytest

from cinema_tpu import native
from cinema_tpu.data.nifti import load_nifti_frame, load_nifti_header, save_nifti

pytestmark = pytest.mark.skipif(not native.available(), reason="native reader unavailable")


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize("dtype", [np.uint8, np.int16, np.float32])
def test_probe_matches_python_header(tmp_path, suffix, dtype):
    arr = np.arange(5 * 4 * 3 * 6, dtype=dtype).reshape(5, 4, 3, 6)
    path = tmp_path / f"vol{suffix}"
    save_nifti(path, arr, spacing=(1.0, 1.0, 1.0, 1.0))
    shape, dt, vox_offset, slope, inter = native.probe(path)
    header = load_nifti_header(path)
    assert shape == header.shape == (5, 4, 3, 6)
    assert dt == header.dtype
    assert vox_offset == header.vox_offset
    assert slope == header.scl_slope and inter == header.scl_inter


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
def test_read_at_matches_python(tmp_path, suffix):
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(6, 5, 4, 9)).astype(np.float32)
    path = tmp_path / f"cine{suffix}"
    save_nifti(path, arr)
    header = load_nifti_header(path)
    frame_bytes = 6 * 5 * 4 * 4
    for t in (0, 4, 8):
        buf = native.read_at(path, header.vox_offset + t * frame_bytes, frame_bytes)
        got = np.frombuffer(buf, np.float32).reshape(4, 5, 6).transpose(2, 1, 0)
        np.testing.assert_array_equal(got, arr[..., t])


def test_load_nifti_frame_uses_native_and_matches(tmp_path, monkeypatch):
    rng = np.random.default_rng(1)
    arr = rng.normal(size=(7, 6, 5, 8)).astype(np.float32)
    path = tmp_path / "cine.nii.gz"
    save_nifti(path, arr)

    frame_native, _ = load_nifti_frame(path, 5)
    monkeypatch.setenv("CINEMA_TPU_NATIVE", "0")  # env gate is load-time...
    # ...so force the python path directly instead:
    monkeypatch.setattr(native, "read_at", lambda *a, **k: None)
    frame_python, _ = load_nifti_frame(path, 5)
    np.testing.assert_array_equal(frame_native, frame_python)
    np.testing.assert_array_equal(frame_native, arr[..., 5])


def test_read_at_batch_threads(tmp_path):
    rng = np.random.default_rng(2)
    items, want = [], []
    for i in range(6):
        arr = rng.normal(size=(4, 4, 2, 5)).astype(np.float32)
        path = tmp_path / f"s{i}.nii.gz"
        save_nifti(path, arr)
        header = load_nifti_header(path)
        t = i % 5
        fb = 4 * 4 * 2 * 4
        items.append((str(path), header.vox_offset + t * fb, fb))
        want.append(arr[..., t])
    bufs = native.read_at_batch(items, n_threads=3)
    for buf, w in zip(bufs, want):
        got = np.frombuffer(buf, np.float32).reshape(2, 4, 4).transpose(2, 1, 0)
        np.testing.assert_array_equal(got, w)


def test_read_errors(tmp_path):
    with pytest.raises(IOError):
        native.probe(tmp_path / "missing.nii.gz")
    path = tmp_path / "trunc.nii.gz"
    with gzip.open(path, "wb") as f:
        f.write(b"short")
    with pytest.raises(IOError):
        native.probe(path)
