"""Self-contained NIfTI-1 reader/writer with frame-seek 4D reads.

The reference reads NIfTI via SimpleITK (not available here). This module
implements the NIfTI-1 spec directly (348-byte header + raw voxels,
optionally gzipped). Arrays are returned in x-fastest Fortran voxel order
mapped to numpy shape (nx, ny, nz[, nt]) with C-order axes — i.e.
``arr[x, y, z, t]`` indexing, matching SimpleITK's GetArrayFromImage
transposed convention used throughout the reference preprocessing.

Frame-seek: a 4D cine volume stores each time frame contiguously, so
``load_nifti_frame`` reads exactly one frame — seeking directly for .nii
and stream-decompressing only the needed prefix for .nii.gz — replacing
the reference's sitk.ImageFileReader.SetExtractIndex streaming read
(mae/pretrain.py:88-119).

Frame-INDEXED .nii.gz (``save_nifti(..., frame_indexed=True)``): a gzip
stream may be a concatenation of members (RFC 1952 §2.2), and every
conforming reader — python gzip, zlib's gz API, SimpleITK/nibabel —
decodes the concatenation as one stream. Writing one member per time
frame therefore stays a 100%-valid .nii.gz while making random frame
access O(frame): member 0 (the NIfTI header) carries an FEXTRA subfield
('C','T') holding the absolute byte offset of every frame member, so
``load_nifti_frame`` inflates exactly one member instead of the whole
stream prefix (which averages nt/2 frames of wasted inflate per read —
the measured 178 ms/item loader bound on the UKB pretrain shapes).
"""

from __future__ import annotations

import gzip
import struct
import zlib
from dataclasses import dataclass
from pathlib import Path
from typing import BinaryIO, Optional, Sequence, Tuple, Union

import numpy as np

from cinema_tpu.log import get_logger

logger = get_logger(__name__)

_DTYPES = {
    2: np.dtype(np.uint8),
    4: np.dtype(np.int16),
    8: np.dtype(np.int32),
    16: np.dtype(np.float32),
    64: np.dtype(np.float64),
    256: np.dtype(np.int8),
    512: np.dtype(np.uint16),
    768: np.dtype(np.uint32),
}
_DTYPE_CODES = {v: k for k, v in _DTYPES.items()}

HEADER_SIZE = 348


@dataclass
class NiftiHeader:
    """Subset of the NIfTI-1 header the framework needs."""

    shape: Tuple[int, ...]
    dtype: np.dtype
    spacing: Tuple[float, ...]
    affine: np.ndarray  # 4x4 voxel->world
    vox_offset: int
    scl_slope: float = 1.0
    scl_inter: float = 0.0
    descrip: bytes = b""


def _open(path: Union[str, Path], mode: str = "rb") -> BinaryIO:
    path = Path(path)
    if path.suffix == ".gz":
        return gzip.open(path, mode)  # type: ignore[return-value]
    return open(path, mode)


def _parse_header(raw: bytes) -> NiftiHeader:
    if len(raw) < HEADER_SIZE:
        raise ValueError(f"NIfTI header too short: {len(raw)} bytes.")
    sizeof_hdr = struct.unpack_from("<i", raw, 0)[0]
    if sizeof_hdr != HEADER_SIZE:
        raise ValueError(f"Not a little-endian NIfTI-1 file (sizeof_hdr={sizeof_hdr}).")
    magic = raw[344:348]
    if magic not in (b"n+1\x00", b"ni1\x00"):
        raise ValueError(f"Bad NIfTI magic: {magic!r}.")
    dim = struct.unpack_from("<8h", raw, 40)
    ndim = dim[0]
    if ndim < 1 or ndim > 7:
        raise ValueError(f"Unsupported ndim {ndim}.")
    shape = tuple(int(d) for d in dim[1 : 1 + ndim])
    datatype = struct.unpack_from("<h", raw, 70)[0]
    if datatype not in _DTYPES:
        raise ValueError(f"Unsupported NIfTI datatype code {datatype}.")
    pixdim = struct.unpack_from("<8f", raw, 76)
    vox_offset = int(struct.unpack_from("<f", raw, 108)[0])
    scl_slope = struct.unpack_from("<f", raw, 112)[0]
    scl_inter = struct.unpack_from("<f", raw, 116)[0]
    descrip = raw[148:228].rstrip(b"\x00")
    sform_code = struct.unpack_from("<h", raw, 254)[0]
    affine = np.eye(4)
    if sform_code > 0:
        srow = struct.unpack_from("<12f", raw, 280)
        affine[0, :] = srow[0:4]
        affine[1, :] = srow[4:8]
        affine[2, :] = srow[8:12]
    else:
        for i in range(3):
            affine[i, i] = pixdim[i + 1] if i < ndim else 1.0
    spacing = tuple(float(abs(p)) if p != 0 else 1.0 for p in pixdim[1 : 1 + ndim])
    return NiftiHeader(
        shape=shape,
        dtype=_DTYPES[datatype],
        spacing=spacing,
        affine=affine,
        vox_offset=max(vox_offset, HEADER_SIZE + 4),
        scl_slope=float(scl_slope) if scl_slope != 0 else 1.0,
        scl_inter=float(scl_inter),
        descrip=descrip,
    )


def load_nifti_header(path: Union[str, Path]) -> NiftiHeader:
    """Read only the header."""
    with _open(path) as f:
        return _parse_header(f.read(HEADER_SIZE))


# ---- frame-indexed gzip (multi-member .nii.gz with an offset table) ----

_FIDX_SI = b"CT"  # FEXTRA subfield id carrying the frame-offset table


def _gzip_member(payload: bytes, extra: bytes = b"", level: int = 6) -> bytes:
    """One complete RFC-1952 gzip member, optionally with an FEXTRA field."""
    flg = 0x04 if extra else 0x00
    hdr = struct.pack("<2sBBIBB", b"\x1f\x8b", 8, flg, 0, 0, 255)
    if extra:
        hdr += struct.pack("<H", len(extra)) + extra
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    body = co.compress(payload) + co.flush()
    tail = struct.pack("<II", zlib.crc32(payload) & 0xFFFFFFFF, len(payload) & 0xFFFFFFFF)
    return hdr + body + tail


def read_frame_index(path: Union[str, Path]) -> Optional[np.ndarray]:
    """Absolute byte offsets (nt + 1,) of the per-frame gzip members.

    Returns None for files not written with ``frame_indexed=True`` (plain
    single-member gzip, raw .nii, or foreign FEXTRA fields) — callers then
    take the sequential-prefix read path.
    """
    try:
        with open(path, "rb") as f:
            head = f.read(14)
            if len(head) < 14 or head[:2] != b"\x1f\x8b" or not (head[3] & 0x04):
                return None
            xlen = struct.unpack_from("<H", head, 10)[0]
            extra = head[12:14] + f.read(xlen - 2) if xlen >= 2 else b""
    except OSError:
        return None
    pos = 0
    while pos + 4 <= len(extra):
        si, sub_len = extra[pos : pos + 2], struct.unpack_from("<H", extra, pos + 2)[0]
        data = extra[pos + 4 : pos + 4 + sub_len]
        if si == _FIDX_SI and len(data) == sub_len and sub_len >= 12:
            nt = struct.unpack_from("<I", data, 0)[0]
            if sub_len == 4 + 8 * (nt + 1):
                return np.frombuffer(data, dtype="<u8", count=nt + 1, offset=4)
        pos += 4 + sub_len
    return None


def _read_member(path: Path, start: int, end: int, nbytes: int) -> bytes:
    """Inflate the single gzip member at byte range [start, end)."""
    try:
        from cinema_tpu import native

        buf = native.inflate_at(path, start, end - start, nbytes)
        if buf is not None:
            return buf
    except (ImportError, IOError):
        pass
    with open(path, "rb") as f:
        f.seek(start)
        comp = f.read(end - start)
    return zlib.decompressobj(wbits=31).decompress(comp, nbytes)


def load_nifti(
    path: Union[str, Path], apply_scaling: bool = True
) -> Tuple[np.ndarray, NiftiHeader]:
    """Read a full NIfTI volume.

    Returns:
        (array of shape header.shape with x-fastest storage mapped to
        ``arr[x, y, ...]``, header). Scaling (scl_slope/inter) is applied
        when non-identity (output float32 in that case); pass
        ``apply_scaling=False`` to get the stored voxels verbatim (lossless
        rewrites keep the raw dtype + the header's scl fields).
    """
    with _open(path) as f:
        raw = f.read()
    header = _parse_header(raw[:HEADER_SIZE])
    n_items = int(np.prod(header.shape))
    data = np.frombuffer(
        raw, dtype=header.dtype, count=n_items, offset=header.vox_offset
    )
    # NIfTI stores x fastest: numpy C-order view has shape reversed
    arr = data.reshape(header.shape[::-1]).transpose(tuple(range(len(header.shape) - 1, -1, -1)))
    if apply_scaling and (header.scl_slope != 1.0 or header.scl_inter != 0.0):
        arr = arr.astype(np.float32) * header.scl_slope + header.scl_inter
    return np.ascontiguousarray(arr), header


def load_nifti_frame(path: Union[str, Path], t: int) -> Tuple[np.ndarray, NiftiHeader]:
    """Read ONE time frame of a 4D NIfTI without loading the rest.

    For .nii the frame is seek-read directly; for .nii.gz only the prefix up
    to the frame end is decompressed (zlib streams are sequential).

    Args:
        path: 4D NIfTI path.
        t: frame index in [0, nt).

    Returns:
        ((nx, ny, nz) array, header).
    """
    path = Path(path)
    header = load_nifti_header(path)
    if len(header.shape) != 4:
        raise ValueError(f"Expected 4D volume, got shape {header.shape}.")
    nx, ny, nz, nt = header.shape
    if not 0 <= t < nt:
        raise ValueError(f"Frame {t} out of range [0, {nt}).")
    frame_items = nx * ny * nz
    frame_bytes = frame_items * header.dtype.itemsize
    offset = header.vox_offset + t * frame_bytes

    buf = None
    if path.suffix == ".gz":
        index = read_frame_index(path)
        if index is not None and len(index) == nt + 1:
            # frame-indexed file: frame t IS gzip member t+1 — inflate it alone
            buf = _read_member(path, int(index[t]), int(index[t + 1]), frame_bytes)
    if buf is None:
        buf = _seek_read(path, offset, frame_bytes)
    data = np.frombuffer(buf, dtype=header.dtype, count=frame_items)
    arr = data.reshape((nz, ny, nx)).transpose(2, 1, 0)
    if header.scl_slope != 1.0 or header.scl_inter != 0.0:
        arr = arr.astype(np.float32) * header.scl_slope + header.scl_inter
    return np.ascontiguousarray(arr), header


def _seek_read(path: Path, offset: int, frame_bytes: int) -> bytes:
    """Sequential-prefix frame read (non-indexed files)."""
    buf = None
    try:
        # GIL-free zlib seek+read (cinema_tpu.native); None when the native
        # library is unavailable -> pure-Python fallback below
        from cinema_tpu import native

        buf = native.read_at(path, offset, frame_bytes)
    except ImportError:
        buf = None
    except IOError as e:
        # Native reader rejected the stream (e.g. a gzip variant zlib's gz*
        # API refuses); the Python path may still handle it.
        logger.warning("native frame read failed (%s); falling back to Python reader", e)
        buf = None
    if buf is None:
        if path.suffix == ".gz":
            with gzip.open(path, "rb") as f:
                f.seek(offset)  # sequential decompression up to the offset
                buf = f.read(frame_bytes)
        else:
            with open(path, "rb") as f:
                f.seek(offset)
                buf = f.read(frame_bytes)
    return buf


def save_nifti(
    path: Union[str, Path],
    array: np.ndarray,
    spacing: Optional[Sequence[float]] = None,
    affine: Optional[np.ndarray] = None,
    descrip: bytes = b"cinema_tpu",
    frame_indexed: bool = False,
    scl: Tuple[float, float] = (1.0, 0.0),
) -> None:
    """Write a NIfTI-1 file (gzipped if the path ends in .gz).

    Args:
        array: (nx, ny[, nz[, nt]]) with ``arr[x, y, ...]`` indexing.
        spacing: per-axis spacing (defaults to 1s).
        affine: 4x4 sform (defaults to diag(spacing)).
        frame_indexed: for 4D .gz outputs, write one gzip member per time
            frame plus an FEXTRA offset table (see module docstring) so
            ``load_nifti_frame`` inflates a single frame. The file stays a
            valid .nii.gz for every standard reader; ignored for raw .nii
            (already seekable) and non-4D arrays.
        scl: (scl_slope, scl_inter) written verbatim — pass a source
            header's values when rewriting raw (unscaled) voxels so
            readers keep applying the same scaling.
    """
    array = np.asarray(array)
    if array.dtype not in _DTYPE_CODES:
        array = array.astype(np.float32)
    ndim = array.ndim
    if ndim < 2 or ndim > 4:
        raise ValueError(f"Only 2D-4D arrays supported, got {ndim}D.")
    spacing = tuple(float(s) for s in (spacing or (1.0,) * ndim))
    if len(spacing) != ndim:
        raise ValueError(f"Spacing rank {len(spacing)} != array rank {ndim}.")
    if affine is None:
        affine = np.eye(4)
        for i in range(min(3, ndim)):
            affine[i, i] = spacing[i]

    header = bytearray(HEADER_SIZE)
    struct.pack_into("<i", header, 0, HEADER_SIZE)
    dim = [ndim] + list(array.shape) + [1] * (7 - ndim)
    struct.pack_into("<8h", header, 40, *dim)
    struct.pack_into("<h", header, 70, _DTYPE_CODES[array.dtype])
    struct.pack_into("<h", header, 72, array.dtype.itemsize * 8)  # bitpix
    pixdim = [1.0] + list(spacing) + [1.0] * (7 - ndim)
    struct.pack_into("<8f", header, 76, *pixdim)
    struct.pack_into("<f", header, 108, float(HEADER_SIZE + 4))  # vox_offset
    struct.pack_into("<f", header, 112, float(scl[0]))  # scl_slope
    struct.pack_into("<f", header, 116, float(scl[1]))  # scl_inter
    header[148 : 148 + min(len(descrip), 79)] = descrip[:79]
    struct.pack_into("<h", header, 252, 1)  # qform_code (identity-ish)
    struct.pack_into("<h", header, 254, 1)  # sform_code
    struct.pack_into("<12f", header, 280, *affine[:3].reshape(-1).astype(np.float32))
    header[344:348] = b"n+1\x00"

    # x-fastest storage: write the transposed C-order buffer
    stored = np.ascontiguousarray(array.transpose(tuple(range(ndim - 1, -1, -1))))
    head_payload = bytes(header) + b"\x00\x00\x00\x00"  # + extension flag
    if frame_indexed and ndim == 4 and str(path).endswith(".gz"):
        # time is the slowest storage axis: frame t == stored[t]
        nt = array.shape[-1]
        frames = [_gzip_member(stored[t].tobytes()) for t in range(nt)]
        # member 0's size is fixed by its (deterministic) deflate body and
        # the table length, so absolute offsets are known before writing
        extra_len = 4 + 4 + 8 * (nt + 1)  # SI+LEN header + u32 nt + offsets
        base = len(_gzip_member(head_payload)) + 2 + extra_len
        offsets = np.cumsum([base] + [len(m) for m in frames]).astype("<u8")
        table = (
            _FIDX_SI
            + struct.pack("<H", 4 + 8 * (nt + 1))
            + struct.pack("<I", nt)
            + offsets.tobytes()
        )
        with open(path, "wb") as f:
            f.write(_gzip_member(head_payload, extra=table))
            for m in frames:
                f.write(m)
        return
    with _open(path, "wb") as f:
        f.write(head_payload)
        f.write(stored.tobytes())


def save_nifti_like(
    array: np.ndarray,
    reference_image_path: Optional[Union[str, Path]],
    out_path: Union[str, Path],
) -> None:
    """Save an array copying geometry from a reference NIfTI
    (reference sitk.py save_image, sitk.py:662-713).

    Semantics match the reference:
    - 4D reference + 3D array: use the reference's first frame geometry
      (rescan data).
    - frame-count mismatch on the last axis: clamp BOTH to the shorter
      length (Kaggle studies with >30 frames), error-logged.
    - any remaining size mismatch raises.
    """
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    if reference_image_path is None:
        save_nifti(out_path, array)
        return
    ref = load_nifti_header(reference_image_path)
    ref_shape = tuple(ref.shape)
    if len(ref_shape) == 4 and array.ndim == 3:
        ref_shape = ref_shape[:3]
    if ref_shape != array.shape:
        logger.error(
            f"Reference image {reference_image_path} has different size from "
            f"the input image, {ref_shape} != {array.shape}"
        )
        min_size = min(ref_shape[-1], array.shape[-1])
        ref_shape = ref_shape[:-1] + (min_size,)
        array = array[..., :min_size]
    if ref_shape != array.shape:
        raise ValueError(
            f"Reference image {reference_image_path} has different size from "
            f"the input image, {ref_shape} != {array.shape}"
        )
    spacing = tuple(ref.spacing[: array.ndim])
    if len(spacing) < array.ndim:
        spacing = spacing + (1.0,) * (array.ndim - len(spacing))
    save_nifti(out_path, array, spacing=spacing, affine=ref.affine)
