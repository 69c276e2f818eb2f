"""Tests for the from-scratch DICOM reader, using hand-crafted part-10 files."""

import struct

import numpy as np
import pytest

from cinema_tpu.data.dicom import (
    EXPLICIT_VR_LE,
    IMPLICIT_VR_LE,
    load_series,
    read_dicom,
    sort_cine_frames,
)


def _element_explicit(group, element, vr, value: bytes) -> bytes:
    head = struct.pack("<HH", group, element)
    if vr in (b"OB", b"OW", b"SQ", b"UN", b"UT"):
        return head + vr + b"\x00\x00" + struct.pack("<I", len(value)) + value
    return head + vr + struct.pack("<H", len(value)) + value


def _element_implicit(group, element, value: bytes) -> bytes:
    return struct.pack("<HH", group, element) + struct.pack("<I", len(value)) + value


def _make_dicom(
    tmp_path,
    name,
    pixels: np.ndarray,
    implicit=False,
    series_uid=b"1.2.3",
    instance=b"1",
    position=b"0\\0\\0",
    slice_location=None,
    trigger_time=None,
    spacing=b"1.5\\1.5",
):
    ts = (IMPLICIT_VR_LE if implicit else EXPLICIT_VR_LE).encode() + b"\x00"
    meta = _element_explicit(0x0002, 0x0010, b"UI", ts)
    el = _element_implicit if implicit else (
        lambda g, e, value, vr=b"LO": _element_explicit(g, e, vr, value)
    )

    def elem(g, e, value, vr=b"LO"):
        if implicit:
            return _element_implicit(g, e, value)
        return _element_explicit(g, e, vr, value)

    body = b""
    body += elem(0x0008, 0x103E, b"cine_sax ", b"LO")
    body += elem(0x0018, 0x0050, b"10", b"DS")
    if trigger_time is not None:
        body += elem(0x0018, 0x1060, trigger_time, b"DS")
    body += elem(0x0020, 0x000E, series_uid + b"\x00", b"UI")
    body += elem(0x0020, 0x0013, instance, b"IS")
    body += elem(0x0020, 0x0032, position, b"DS")
    body += elem(0x0020, 0x0037, b"1\\0\\0\\0\\1\\0", b"DS")
    if slice_location is not None:
        body += elem(0x0020, 0x1041, slice_location, b"DS")
    body += elem(0x0028, 0x0010, struct.pack("<H", pixels.shape[0]), b"US")
    body += elem(0x0028, 0x0011, struct.pack("<H", pixels.shape[1]), b"US")
    body += elem(0x0028, 0x0030, spacing, b"DS")
    body += elem(0x0028, 0x0100, struct.pack("<H", 16), b"US")
    body += elem(0x0028, 0x0103, struct.pack("<H", 0), b"US")
    body += elem(0x7FE0, 0x0010, pixels.astype("<u2").tobytes(), b"OW")
    del el
    path = tmp_path / name
    path.write_bytes(b"\x00" * 128 + b"DICM" + meta + body)
    return path


@pytest.mark.parametrize("implicit", [False, True])
def test_read_dicom(tmp_path, implicit):
    rng = np.random.default_rng(0)
    pixels = rng.integers(0, 1000, size=(8, 6), dtype=np.uint16)
    path = _make_dicom(tmp_path, "a.dcm", pixels, implicit=implicit)
    im = read_dicom(path)
    np.testing.assert_array_equal(im.pixel_array, pixels)
    assert im.spacing == (1.5, 1.5)
    assert im.slice_thickness == 10.0
    assert im.series_uid == "1.2.3"
    assert im.series_description == "cine_sax"
    # identity orientation -> identity rotation
    np.testing.assert_allclose(im.rotation, np.eye(3))


def test_read_dicom_rejects_non_dicom(tmp_path):
    p = tmp_path / "x.dcm"
    p.write_bytes(b"\x00" * 200)
    with pytest.raises(ValueError, match="DICM"):
        read_dicom(p)


def test_load_series_sorts_by_location(tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    for i, loc in enumerate([b"20.0", b"0.0", b"10.0"]):
        pixels = np.full((4, 4), i, dtype=np.uint16)
        paths.append(
            _make_dicom(
                tmp_path, f"s{i}.dcm", pixels, instance=str(i + 1).encode(), slice_location=loc
            )
        )
    volume, first = load_series(paths)
    assert volume.shape == (4, 4, 3)
    # sorted by location: 0.0 (i=1), 10.0 (i=2), 20.0 (i=0)
    np.testing.assert_array_equal(volume[0, 0, :], [1, 2, 0])
    assert first.slice_location == 0.0
    del rng


def test_load_series_rejects_mixed_series(tmp_path):
    p1 = _make_dicom(tmp_path, "a.dcm", np.zeros((2, 2), np.uint16), series_uid=b"1.1")
    p2 = _make_dicom(tmp_path, "b.dcm", np.zeros((2, 2), np.uint16), series_uid=b"1.2")
    with pytest.raises(ValueError, match="multiple series"):
        load_series([p1, p2])


def test_sort_cine_frames(tmp_path):
    ims = [
        read_dicom(
            _make_dicom(
                tmp_path, f"t{i}.dcm", np.zeros((2, 2), np.uint16),
                instance=str(i).encode(), trigger_time=str(100 - i * 10).encode(),
            )
        )
        for i in range(3)
    ]
    ordered = sort_cine_frames(ims)
    assert [im.instance_number for im in ordered] == [2, 1, 0]
