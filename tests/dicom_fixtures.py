"""Synthetic DICOM study builders for preprocess pipeline tests.

Writes minimal explicit-VR little-endian part-10 files with the geometry
tags the cinema_tpu pipelines consume (position, orientation, spacing,
trigger time, CardiacNumberOfImages), arranged into per-slice cine folders
like the Kaggle DSB and UKB layouts.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np


def _element(group: int, element: int, vr: bytes, value: bytes) -> bytes:
    if len(value) % 2:
        value += b"\x00" if vr != b"UI" else b"\x00"
    head = struct.pack("<HH", group, element)
    if vr in (b"OB", b"OW", b"SQ", b"UN", b"UT"):
        return head + vr + b"\x00\x00" + struct.pack("<I", len(value)) + value
    return head + vr + struct.pack("<H", len(value)) + value


def write_dicom(
    path: Path,
    pixels: np.ndarray,
    position=(0.0, 0.0, 0.0),
    orientation=(1, 0, 0, 0, 1, 0),
    pixel_spacing=(1.0, 1.0),  # (row, col)
    slice_thickness: float = 8.0,
    spacing_between_slices: float | None = None,
    series_uid: str = "1.2.3",
    series_description: str = "cine",
    instance_number: int = 1,
    trigger_time: float | None = None,
    cardiac_number_of_images: int | None = None,
) -> Path:
    """Write one single-frame uint16 DICOM file."""
    ts = b"1.2.840.10008.1.2.1\x00"  # explicit VR LE
    meta = _element(0x0002, 0x0010, b"UI", ts)

    def ds(values) -> bytes:
        return "\\".join(f"{v:g}" for v in np.atleast_1d(values)).encode()

    body = b""
    body += _element(0x0008, 0x103E, b"LO", series_description.encode())
    body += _element(0x0018, 0x0050, b"DS", ds(slice_thickness))
    if spacing_between_slices is not None:
        body += _element(0x0018, 0x0088, b"DS", ds(spacing_between_slices))
    if trigger_time is not None:
        body += _element(0x0018, 0x1060, b"DS", ds(trigger_time))
    if cardiac_number_of_images is not None:
        body += _element(0x0018, 0x1090, b"IS", str(cardiac_number_of_images).encode())
    body += _element(0x0020, 0x000E, b"UI", series_uid.encode())
    body += _element(0x0020, 0x0013, b"IS", str(instance_number).encode())
    body += _element(0x0020, 0x0032, b"DS", ds(position))
    body += _element(0x0020, 0x0037, b"DS", ds(orientation))
    body += _element(0x0028, 0x0010, b"US", struct.pack("<H", pixels.shape[0]))  # rows
    body += _element(0x0028, 0x0011, b"US", struct.pack("<H", pixels.shape[1]))  # cols
    body += _element(0x0028, 0x0030, b"DS", ds(pixel_spacing))
    body += _element(0x0028, 0x0100, b"US", struct.pack("<H", 16))
    body += _element(0x0028, 0x0103, b"US", struct.pack("<H", 0))
    body += _element(0x7FE0, 0x0010, b"OW", pixels.astype("<u2").tobytes())

    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(b"\x00" * 128 + b"DICM" + meta + body)
    return path


def write_cine_slice_dir(
    slice_dir: Path,
    rows: int,
    cols: int,
    n_frames: int,
    position=(0.0, 0.0, 0.0),
    orientation=(1, 0, 0, 0, 1, 0),
    pixel_spacing=(1.0, 1.0),
    spacing_between_slices: float | None = None,
    series_uid: str = "1.2.3",
    series_description: str = "cine",
    seed: int = 0,
    file_prefix: str = "IM",
) -> None:
    """One z-slice's cine frames, shuffled on disk, ordered by TriggerTime."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(n_frames)
    for file_idx, t in enumerate(order):
        write_dicom(
            slice_dir / f"{file_prefix}-{file_idx:04d}.dcm",
            pixels=rng.integers(0, 900, size=(rows, cols)).astype(np.uint16) + 100,
            position=position,
            orientation=orientation,
            pixel_spacing=pixel_spacing,
            spacing_between_slices=spacing_between_slices,
            series_uid=series_uid,
            series_description=series_description,
            instance_number=int(t) + 1,
            trigger_time=float(t) * 30.0,
            cardiac_number_of_images=n_frames,
        )


# Orthogonal study geometry in DICOM LPS coordinates. The reader negates
# x/y (LPS -> RAS); these planes are axis-aligned so they stay orthogonal
# and the 2C/4C intersection line pierces every SAX slice.
SAX_ORIENT = (1, 0, 0, 0, 1, 0)  # normal +z
LAX_2C_ORIENT = (0, 1, 0, 0, 0, 1)  # normal +x  (after negation: -x)
LAX_4C_ORIENT = (1, 0, 0, 0, 0, 1)  # normal (0,-1,0) in LPS; stays y-normal


def make_kaggle_study(
    study_dir: Path, n_sax: int = 4, n_frames: int = 3, rows: int = 24, cols: int = 20
) -> None:
    """A Kaggle-layout study: 2ch_*/4ch_* LAX dirs + numbered sax_* dirs."""
    write_cine_slice_dir(
        study_dir / "2ch_21",
        rows,
        cols,
        n_frames,
        position=(5.0, -10.0, -10.0),
        orientation=LAX_2C_ORIENT,
        pixel_spacing=(2.0, 2.0),
        series_uid="",  # kaggle files lack SeriesInstanceUID
        seed=1,
    )
    write_cine_slice_dir(
        study_dir / "4ch_22",
        rows,
        cols,
        n_frames,
        position=(-10.0, 6.0, -10.0),
        orientation=LAX_4C_ORIENT,
        pixel_spacing=(2.0, 2.0),
        series_uid="",
        seed=2,
    )
    for k in range(n_sax):
        write_cine_slice_dir(
            study_dir / f"sax_{k + 5}",
            rows,
            cols,
            n_frames,
            position=(-12.0, -12.0, float(k) * 8.0),
            orientation=SAX_ORIENT,
            pixel_spacing=(1.8, 1.8),
            spacing_between_slices=8.0,
            series_uid="",
            seed=3 + k,
        )
