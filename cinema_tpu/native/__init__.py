"""Native (C++) data-path components, loaded via ctypes.

``frame_reader.cpp`` does NIfTI header probing and gzip frame-seek reads
without the GIL (zlib inflate in C++, threaded batch variant), replacing the
hot part of the UKB cine loader (reference cinema/mae/pretrain.py:88-119).

The shared library is built lazily with g++ on first import and cached next
to the source keyed by a source hash; any failure (no compiler, no zlib)
degrades silently to the pure-Python reader in ``cinema_tpu.data.nifti`` —
``available()`` reports which path is active. Set ``CINEMA_TPU_NATIVE=0``
to force the Python path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "frame_reader.cpp"

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False

# NIfTI datatype code -> numpy dtype (mirror of data/nifti.py:_DTYPES)
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


class CtNiftiHeader(ctypes.Structure):
    _fields_ = [
        ("ndim", ctypes.c_int64),
        ("shape", ctypes.c_int64 * 7),
        ("datatype", ctypes.c_int32),
        ("bitpix", ctypes.c_int32),
        ("vox_offset", ctypes.c_int64),
        ("scl_slope", ctypes.c_float),
        ("scl_inter", ctypes.c_float),
    ]


def _build() -> Optional[Path]:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:12]
    out = _DIR / f"_frame_reader_{tag}.so"
    if out.exists():
        return out
    # Compile to a per-process temp name and os.replace() into the final
    # path: multiple loader workers may race here, and dlopen must never
    # see a partially written .so (os.replace is atomic on POSIX).
    tmp = _DIR / f"_frame_reader_{tag}.{os.getpid()}.tmp.so"
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", str(_SRC), "-o", str(tmp), "-lz", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, out)
    except (OSError, subprocess.SubprocessError):
        tmp.unlink(missing_ok=True)
        return None
    return out if out.exists() else None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    if os.environ.get("CINEMA_TPU_NATIVE", "1") == "0":
        return None
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    lib.ct_probe.argtypes = [ctypes.c_char_p, ctypes.POINTER(CtNiftiHeader)]
    lib.ct_probe.restype = ctypes.c_int
    lib.ct_read_at.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_ubyte),
    ]
    lib.ct_read_at.restype = ctypes.c_int
    lib.ct_inflate_at.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_int64,
    ]
    lib.ct_inflate_at.restype = ctypes.c_int
    lib.ct_read_at_batch.argtypes = [
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.c_int64,
    ]
    lib.ct_read_at_batch.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    """True when the native reader compiled and loaded."""
    return _load() is not None


def probe(path) -> Optional[Tuple[Tuple[int, ...], np.dtype, int, float, float]]:
    """Parse a NIfTI header natively.

    Returns:
        (shape, dtype, vox_offset, scl_slope, scl_inter) or None when the
        native library is unavailable (caller falls back to Python).
    """
    lib = _load()
    if lib is None:
        return None
    hdr = CtNiftiHeader()
    rc = lib.ct_probe(str(path).encode(), ctypes.byref(hdr))
    if rc != 0:
        raise IOError(f"ct_probe({path}) failed with code {rc}.")
    if hdr.datatype not in _DTYPES:
        raise ValueError(f"Unsupported NIfTI datatype {hdr.datatype} in {path}.")
    shape = tuple(int(hdr.shape[i]) for i in range(int(hdr.ndim)))
    slope = float(hdr.scl_slope) if hdr.scl_slope != 0.0 else 1.0
    return shape, _DTYPES[hdr.datatype], int(hdr.vox_offset), slope, float(hdr.scl_inter)


def read_at(path, offset: int, nbytes: int) -> Optional[np.ndarray]:
    """Seek-read ``nbytes`` raw bytes (gzip-aware) without the GIL.

    Returns a uint8 buffer, or None when native is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    buf = np.empty(nbytes, dtype=np.uint8)
    rc = lib.ct_read_at(
        str(path).encode(),
        offset,
        nbytes,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    if rc != 0:
        raise IOError(f"ct_read_at({path}, {offset}, {nbytes}) failed with code {rc}.")
    return buf


def inflate_at(path, offset: int, clen: int, nbytes: int) -> Optional[np.ndarray]:
    """Inflate one gzip member at byte range [offset, offset+clen) — the
    frame-indexed .nii.gz fast path (no sequential skip over earlier
    members). Returns a uint8 buffer, or None when native is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    buf = np.empty(nbytes, dtype=np.uint8)
    rc = lib.ct_inflate_at(
        str(path).encode(),
        offset,
        clen,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        nbytes,
    )
    if rc != 0:
        raise IOError(f"ct_inflate_at({path}, {offset}, {clen}) failed with code {rc}.")
    return buf


def read_at_batch(
    items: Sequence[Tuple[str, int, int]],
    n_threads: int = 0,
) -> Optional[List[np.ndarray]]:
    """Concurrently seek-read many (path, offset, nbytes) items.

    zlib inflation runs on ``n_threads`` C++ threads (0 = one per item,
    capped at cpu count), with the GIL released for the whole batch.

    Returns raw uint8 buffers in order, or None when native is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    n = len(items)
    if n == 0:
        return []
    if n_threads <= 0:
        n_threads = min(n, os.cpu_count() or 1)
    bufs = [np.empty(nb, dtype=np.uint8) for _, _, nb in items]
    paths = (ctypes.c_char_p * n)(*[str(p).encode() for p, _, _ in items])
    offsets = (ctypes.c_int64 * n)(*[o for _, o, _ in items])
    nbytes = (ctypes.c_int64 * n)(*[nb for _, _, nb in items])
    outs = (ctypes.POINTER(ctypes.c_ubyte) * n)(
        *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)) for b in bufs]
    )
    rc = lib.ct_read_at_batch(n, paths, offsets, nbytes, outs, n_threads)
    if rc != 0:
        raise IOError(f"ct_read_at_batch failed with code {rc}.")
    return bufs
