"""SAX ventricle/myocardium segmentation inference
(reference: cinema/examples/inference/segmentation_sax.py).

Loads a finetuned ConvUNetR (local safetensors+config, or HuggingFace
``repo::filename`` refs), segments every frame of a 4D SAX NIfTI in ONE
batched forward, and writes a labelled NIfTI + the reference's animated
cine GIF and ventricle-volume/LVEF plot
(reference segmentation_sax.py:19-107).

Usage:
    python examples/inference/segmentation_sax.py \
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
    parser.add_argument("--image", required=True, type=Path, help="4D SAX NIfTI (x, y, z, t)")
    parser.add_argument("--out", type=Path, default=Path("out"))
    parser.add_argument("--t_step", type=int, default=1, help="GIF temporal stride")
    args = parser.parse_args()

    model, params = from_finetuned("convunetr", args.model, args.config, dtype=jnp.bfloat16)
    patch_size = tuple(model.image_size_dict["sax"])

    video, header = load_nifti(args.image)  # (x, y, z, t)
    n_frames = video.shape[-1]
    orig_shape = video.shape[:3]

    # per-frame transform: scale to [0,1], end-pad to the training patch size
    rng = np.random.default_rng(0)
    frames = []
    for t in range(n_frames):
        data = {"sax_image": video[..., t][..., None].astype(np.float32)}
        data = ScaleIntensityd("sax_image")(data, rng)
        data = SpatialPadd("sax_image", patch_size)(data, rng)
        frames.append(data["sax_image"])
    batch = np.stack(frames)  # (t, x, y, z, 1)

    # chunks of 8 frames: fills the bf16 sublane tile (batch lives in
    # sublanes of the decoder's finest tensors) and bounds activation
    # memory — measured 31 vs 24 frames/s for chunk 10 on v5e; a single
    # 50-frame forward does not fit at base scale
    chunk = 8
    forward = jax.jit(
        lambda p, imgs: jnp.argmax(model.apply(p, imgs)["sax"], axis=-1).astype(jnp.uint8)
    )
    n_pad = (-n_frames) % chunk
    if n_pad:
        batch = np.concatenate([batch, batch[:n_pad]], axis=0)
    parts = [
        np.asarray(forward(params, {"sax": jnp.asarray(batch[i : i + chunk])}))
        for i in range(0, len(batch), chunk)
    ]
    labels = np.concatenate(parts, axis=0)[:n_frames]  # (t, x, y, z)
    labels = np.asarray(crop_start(labels, (n_frames, *orig_shape)))
    labels = np.moveaxis(labels, 0, -1)  # (x, y, z, t)

    args.out.mkdir(parents=True, exist_ok=True)
    save_nifti(args.out / "segmentation_sax_t.nii.gz", labels, spacing=header.spacing)

    # animated cine GIF + ventricle-volume/EF curves (reference
    # segmentation_sax.py:19-107)
    from cinema_tpu.viz import plot_segmentations_gif, plot_volume_changes

    plot_segmentations_gif(
        video.astype(np.float32), labels, args.out / "segmentation_sax.gif", t_step=args.t_step
    )
    ml_per_voxel = float(np.prod(header.spacing[:3])) / 1000.0
    efs = plot_volume_changes(
        labels, args.out / "ventricle_volumes.png", t_step=args.t_step, ml_per_voxel=ml_per_voxel
    )
    print(f"LVEF = {efs['lvef']:.2f}%, RVEF = {efs['rvef']:.2f}%")
    print(f"Saved segmentation for {n_frames} frames to {args.out}.")


if __name__ == "__main__":
    main()
