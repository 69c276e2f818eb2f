"""Visualisation helpers for the inference examples.

Re-implements the reference example plots (animated cine segmentation GIF,
ventricle volume curves, MAE reconstruction grid — reference
cinema/examples/inference/segmentation_sax.py:19-107 and mae.py:14-56)
with matplotlib + PIL only (no imageio/tqdm dependency).
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import numpy as np

from cinema_tpu.constants import LV_LABEL, MYO_LABEL, RV_LABEL

# reference overlay colours (segmentation_sax.py:49-51): RV blue, MYO gold,
# LV green, at 0.6 alpha
_LABEL_RGBA = {
    RV_LABEL: (108 / 255, 142 / 255, 191 / 255, 0.6),
    MYO_LABEL: (214 / 255, 182 / 255, 86 / 255, 0.6),
    LV_LABEL: (130 / 255, 179 / 255, 102 / 255, 0.6),
}


def _figure_to_rgb(fig) -> np.ndarray:
    import io

    from PIL import Image

    buf = io.BytesIO()
    fig.savefig(buf, format="png", bbox_inches="tight", pad_inches=0)
    buf.seek(0)
    frame = np.array(Image.open(buf).convert("RGB"))
    buf.close()
    return frame


def save_gif(frames: Sequence[np.ndarray], filepath: Path, duration_ms: int = 50) -> None:
    """Write an animated GIF from (H, W, 3) uint8 frames via PIL."""
    from PIL import Image

    images = [Image.fromarray(np.asarray(f, dtype=np.uint8)) for f in frames]
    images[0].save(
        str(filepath),
        save_all=True,
        append_images=images[1:],
        duration=duration_ms,
        loop=0,
    )


def plot_segmentations_gif(
    images: np.ndarray,
    labels: np.ndarray,
    filepath: Path,
    t_step: int = 1,
    dpi: int = 150,
) -> None:
    """Animated cine segmentation: per frame, a 3-column grid of slices with
    RV/MYO/LV overlays (reference segmentation_sax.py:19-77).

    Args:
        images: (x, y, z, t) grayscale.
        labels: (x, y, z, t) integer labels.
        filepath: output ``.gif``.
        t_step: temporal stride between rendered frames.
        dpi: figure resolution (drop for fast smoke tests).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n_slices, n_frames = labels.shape[-2:]
    n_cols = min(3, n_slices)
    n_rows = (n_slices + n_cols - 1) // n_cols
    frames = []
    for t in range(0, n_frames, t_step):
        fig, axs = plt.subplots(
            n_rows, n_cols, figsize=(n_cols * 2, n_rows * 2), dpi=dpi, squeeze=False
        )
        for z in range(n_slices):
            ax = axs[z // n_cols][z % n_cols]
            ax.imshow(images[..., z, t], cmap="gray")
            for label, rgba in _LABEL_RGBA.items():
                ax.imshow((labels[..., z, t, None] == label) * np.array(rgba))
            ax.set_xticks([])
            ax.set_yticks([])
        for z in range(n_slices, n_rows * n_cols):
            axs[z // n_cols][z % n_cols].set_visible(False)
        fig.tight_layout()
        fig.subplots_adjust(wspace=0.0, hspace=0.0)
        frames.append(_figure_to_rgb(fig))
        plt.close(fig)
    save_gif(frames, filepath, duration_ms=50 * t_step)


def plot_volume_changes(
    labels: np.ndarray,
    filepath: Path,
    t_step: int = 1,
    ml_per_voxel: float = 10.0 / 1000.0,
    dpi: int = 120,
) -> dict:
    """Ventricle/myocardium volume curves + LVEF/RVEF title (reference
    segmentation_sax.py:80-107).

    Args:
        labels: (x, y, z, t) integer labels.
        filepath: output ``.png``.
        t_step: frame stride used when the labels were subsampled.
        ml_per_voxel: voxel volume in ml (reference hardcodes UKB 1x1x10mm).

    Returns:
        {"lvef": float, "rvef": float} derived from the curves.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n_frames = labels.shape[-1]
    xs = np.arange(n_frames) * t_step
    rv = np.sum(labels == RV_LABEL, axis=(0, 1, 2)) * ml_per_voxel
    myo = np.sum(labels == MYO_LABEL, axis=(0, 1, 2)) * ml_per_voxel
    lv = np.sum(labels == LV_LABEL, axis=(0, 1, 2)) * ml_per_voxel
    lvef = float((lv.max() - lv.min()) / lv.max() * 100) if lv.max() > 0 else float("nan")
    rvef = float((rv.max() - rv.min()) / rv.max() * 100) if rv.max() > 0 else float("nan")

    fig, ax = plt.subplots(figsize=(4, 4), dpi=dpi)
    ax.plot(xs, rv, color="#6C8EBF", label="Right Ventricle")
    ax.plot(xs, myo, color="#D6B656", label="Myocardium")
    ax.plot(xs, lv, color="#82B366", label="Left Ventricle")
    ax.set_xlabel("Frame")
    ax.set_ylabel("Volume (ml)")
    ax.set_title(f"LVEF = {lvef:.2f}%\nRVEF = {rvef:.2f}%")
    ax.legend(loc="upper center", bbox_to_anchor=(0.5, 1))
    fig.tight_layout()
    fig.savefig(filepath, dpi=dpi, bbox_inches="tight")
    plt.close(fig)
    return {"lvef": lvef, "rvef": rvef}


def plot_mae_reconstruction(
    image: np.ndarray,
    reconstructed: np.ndarray,
    mask: np.ndarray,
    filepath: Path,
    dpi: int = 150,
) -> None:
    """Original / masked / reconstructed / error grid, one row per SAX slice
    (reference mae.py:14-56).

    Args:
        image: (x, y, z) original.
        reconstructed: (x, y, z) MAE output with predicted masked patches.
        mask: (x, y, z) 1 where the patch was masked.
        filepath: output ``.png``.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n_slices = image.shape[-1]
    masked = (1 - mask) * image
    error = np.abs(reconstructed - image)
    fig, axs = plt.subplots(n_slices, 4, figsize=(8, n_slices * 2), dpi=dpi, squeeze=False)
    for j in range(n_slices):
        axs[j][0].set_ylabel(f"SAX slice {j}")
        axs[j][0].imshow(image[..., j], cmap="gray")
        axs[j][1].imshow(masked[..., j], cmap="gray")
        axs[j][2].imshow(reconstructed[..., j], cmap="gray")
        axs[j][3].imshow(error[..., j], cmap="gray")
    for title, ax in zip(("Original", "Masked", "Reconstructed", "Error"), axs[0]):
        ax.set_title(title)
    for row in axs:
        for ax in row:
            ax.set_xticks([])
            ax.set_yticks([])
    fig.tight_layout()
    fig.subplots_adjust(wspace=0, hspace=0)
    fig.savefig(filepath, dpi=dpi, bbox_inches="tight")
    plt.close(fig)
