"""Visualize SAX cine slices in real (scanner) coordinate space
(reference: cinema/examples/cine_cmr.py).

The reference renders an interactive plotly figure of every SAX slice plane
positioned by the NIfTI direction/origin/spacing; this version computes the
same image->world geometry from our NIfTI affine and renders with matplotlib
3D (plotly is not in the environment; the geometry math is the point).

Usage:
    python examples/cine_cmr.py --image path/to/patient_sax_t.nii.gz \
        --t 0 --depth 4 --out out/cine_cmr.png

With no --image, a synthetic oriented 4D volume is generated so the script
is runnable end-to-end anywhere.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root

import argparse
from pathlib import Path
from typing import Tuple

import numpy as np

from cinema_tpu.data.nifti import NiftiHeader, load_nifti, save_nifti


def image_to_real_space(
    x: np.ndarray,
    y: np.ndarray,
    z: np.ndarray,
    rot: np.ndarray,
    origin: np.ndarray,
    pixel_spacing: Tuple[float, float],
    slice_spacing: float,
) -> np.ndarray:
    """Voxel indices -> world coordinates for an oriented slice stack
    (reference cine_cmr.py:11-37).

    Args:
        x/y/z: per-axis voxel indices, each (n_points,).
        rot: (3, 3) direction matrix.
        origin: (3,) world origin.
        pixel_spacing: in-plane (dx, dy) in mm.
        slice_spacing: dz in mm.

    Returns:
        (3, n_points) world coordinates.
    """
    coords = np.array([x, y, z])
    spacing = np.array([pixel_spacing[0], pixel_spacing[1], slice_spacing])
    return rot @ (coords * spacing[:, None]) + np.asarray(origin)[:, None]


def get_meshgrid(
    height: int,
    width: int,
    z: int,
    rot: np.ndarray,
    origin: np.ndarray,
    pixel_spacing: Tuple[float, float],
    slice_spacing: float,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """World-space meshgrid of one slice plane (reference cine_cmr.py:40-69)."""
    x, y = np.meshgrid(
        np.linspace(0, width, width), np.linspace(0, height, height), indexing="ij"
    )
    zz = z + np.zeros((width, height))
    coords = image_to_real_space(
        x.reshape(-1), y.reshape(-1), zz.reshape(-1), rot, origin, pixel_spacing, slice_spacing
    )
    return (
        coords[0].reshape(width, height),
        coords[1].reshape(width, height),
        coords[2].reshape(width, height),
    )


def geometry_from_header(header: NiftiHeader) -> Tuple[np.ndarray, np.ndarray, Tuple[float, float], float]:
    """Split a NIfTI affine into (rot, origin, pixel_spacing, slice_spacing)."""
    affine = np.asarray(header.affine, dtype=np.float64)
    spacing = np.asarray(header.spacing[:3], dtype=np.float64)
    safe = np.where(spacing > 0, spacing, 1.0)
    rot = affine[:3, :3] / safe[None, :]
    origin = affine[:3, 3]
    return rot, origin, (float(spacing[0]), float(spacing[1])), float(spacing[2])


def plot_cmr_views(volume: np.ndarray, header: NiftiHeader, t_to_show: int, depth_to_show: int):
    """Render SAX slice planes in world space (reference cine_cmr.py:74-160).

    Every slice's outline is drawn; the ``depth_to_show`` slice additionally
    shows the image itself as a textured plane.

    Args:
        volume: (x, y, z, t) SAX cine.
        header: NIfTI header carrying the affine.
        t_to_show: frame to render.
        depth_to_show: slice index to texture.

    Returns:
        matplotlib Figure.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    width, height, depth = volume.shape[:3]
    rot, origin, pixel_spacing, slice_spacing = geometry_from_header(header)

    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection="3d")
    for d in range(depth):
        xs = np.array([0, 0, width, width, 0], dtype=np.float64)
        ys = np.array([0, height, height, 0, 0], dtype=np.float64)
        zs = np.zeros(5) + d
        coords = image_to_real_space(xs, ys, zs, rot, origin, pixel_spacing, slice_spacing)
        ax.plot(coords[0], coords[1], coords[2], color="#6C8EBF", linewidth=1.5,
                label="SAX" if d == 0 else None)
        if d == depth_to_show:
            img = volume[..., d, t_to_show].astype(np.float64)
            lo, hi = img.min(), img.max()
            img = (img - lo) / (hi - lo) if hi > lo else np.zeros_like(img)
            x, y, z = get_meshgrid(height, width, d, rot, origin, pixel_spacing, slice_spacing)
            ax.plot_surface(
                x, y, z, facecolors=plt.cm.gray(img), shade=False,
                rstride=max(1, width // 96), cstride=max(1, height // 96),
            )
    ax.set_xlabel("x (mm)")
    ax.set_ylabel("y (mm)")
    ax.set_zlabel("z (mm)")
    ax.legend(loc="upper left")
    ax.view_init(elev=35, azim=-120)
    return fig


def _synthetic_volume(path: Path) -> Path:
    """Write a small oriented 4D SAX-like volume for a self-contained demo."""
    rng = np.random.default_rng(0)
    vol = rng.uniform(0, 255, size=(64, 64, 9, 3)).astype(np.float32)
    # oblique orientation: rotate 30 deg about x
    c, s = np.cos(np.pi / 6), np.sin(np.pi / 6)
    rot = np.array([[1, 0, 0], [0, c, -s], [0, s, c]], dtype=np.float64)
    spacing = np.array([1.0, 1.0, 10.0])
    affine = np.eye(4)
    affine[:3, :3] = rot * spacing[None, :]
    affine[:3, 3] = (-32.0, -32.0, -45.0)
    save_nifti(path, vol, spacing=(1.0, 1.0, 10.0, 1.0), affine=affine)
    return path


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--image", type=Path, default=None, help="4D SAX NIfTI (x, y, z, t)")
    parser.add_argument("--t", type=int, default=0, help="frame to show")
    parser.add_argument("--depth", type=int, default=4, help="slice to texture")
    parser.add_argument("--out", type=Path, default=Path("out/cine_cmr.png"))
    args = parser.parse_args()

    args.out.parent.mkdir(parents=True, exist_ok=True)
    image_path = args.image or _synthetic_volume(args.out.parent / "synthetic_sax_t.nii.gz")
    volume, header = load_nifti(image_path)
    if volume.ndim != 4:
        raise ValueError(f"Expected a 4D cine volume, got shape {volume.shape}.")
    fig = plot_cmr_views(volume, header, args.t, min(args.depth, volume.shape[2] - 1))
    fig.savefig(args.out, dpi=120, bbox_inches="tight")
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
