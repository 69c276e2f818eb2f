"""LAX 4-chamber segmentation inference
(reference: cinema/examples/inference/segmentation_lax_4c.py).

Loads a finetuned ConvUNetR (local safetensors+config, or HuggingFace
``repo::filename`` refs), segments every frame of a 4D SAX NIfTI in ONE
batched forward, and writes a labelled NIfTI + a mid-slice PNG.

Usage:
    python examples/inference/segmentation_lax_4c.py \
        --model mathpluscode/CineMA::finetuned/segmentation/acdc/convunetr_sax.safetensors \
        --config mathpluscode/CineMA::finetuned/segmentation/acdc/config.yaml \
        --image path/to/patient_sax_t.nii.gz --out out/
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))  # repo root, for non-installed use


import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from cinema_tpu.data.nifti import load_nifti, save_nifti
from cinema_tpu.data.transforms import ScaleIntensityd, SpatialPadd
from cinema_tpu.factory import from_finetuned
from cinema_tpu.ops.window import crop_start


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True, help="safetensors path or repo::file")
    parser.add_argument("--config", required=True, help="config.yaml path or repo::file")
    parser.add_argument("--image", required=True, type=Path, help="4D LAX NIfTI (x, y, 1, t)")
    parser.add_argument("--out", type=Path, default=Path("out"))
    args = parser.parse_args()

    model, params = from_finetuned("convunetr", args.model, args.config, dtype=jnp.bfloat16)
    patch_size = tuple(model.image_size_dict["lax_4c"])

    video, header = load_nifti(args.image)  # (x, y, z, t)
    n_frames = video.shape[-1]
    orig_shape = video.shape[:3]

    # per-frame transform: scale to [0,1], end-pad to the training patch size
    rng = np.random.default_rng(0)
    frames = []
    for t in range(n_frames):
        data = {"lax_4c_image": video[:, :, 0, t][..., None].astype(np.float32)}
        data = ScaleIntensityd("lax_4c_image")(data, rng)
        data = SpatialPadd("lax_4c_image", patch_size)(data, rng)
        frames.append(data["lax_4c_image"])
    batch = jnp.asarray(np.stack(frames))  # (t, x, y, z, 1) — all frames, one forward

    forward = jax.jit(lambda p, imgs: model.apply(p, imgs))
    logits = forward(params, {"lax_4c": batch})["lax_4c"]
    labels = np.asarray(jnp.argmax(logits, axis=-1), dtype=np.uint8)  # (t, x, y)
    labels = np.asarray(crop_start(labels, (n_frames, *orig_shape[:2])))
    labels = np.moveaxis(labels, 0, -1)[:, :, None, :]  # (x, y, 1, t)

    args.out.mkdir(parents=True, exist_ok=True)
    save_nifti(args.out / "segmentation_lax_4c_t.nii.gz", labels, spacing=header.spacing)

    # animated cine GIF + area/EF curves (reference
    # segmentation_lax_4c.py:47-130)
    from cinema_tpu.viz import plot_segmentations_gif, plot_volume_changes

    plot_segmentations_gif(
        video.astype(np.float32), labels, args.out / "segmentation_lax_4c.gif"
    )
    plot_volume_changes(labels, args.out / "lax_4c_areas.png")
    print(f"Saved segmentation for {n_frames} frames to {args.out}.")


if __name__ == "__main__":
    main()
