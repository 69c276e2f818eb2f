"""Masked-autoencoder reconstruction visualisation
(reference: cinema/examples/inference/mae.py)."""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))  # repo root, for non-installed use


import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from cinema_tpu.data.nifti import load_nifti_frame
from cinema_tpu.data.transforms import ScaleIntensityd, SpatialPadd
from cinema_tpu.factory import mae_from_pretrained
from cinema_tpu.ops.patch import patchify, unpatchify


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default=None)
    parser.add_argument("--config", default=None)
    parser.add_argument("--study_dir", required=True, type=Path)
    parser.add_argument("--mask_ratio", type=float, default=0.75)
    parser.add_argument("--out", type=Path, default=Path("out"))
    args = parser.parse_args()

    model, params = mae_from_pretrained(args.model, args.config, dtype=jnp.bfloat16)
    pid = args.study_dir.name
    rng = np.random.default_rng(0)
    images = {}
    for view in model.views:
        frame, _ = load_nifti_frame(args.study_dir / f"{pid}_{view}_t.nii.gz", 0)
        if view != "sax":
            frame = frame[:, :, 0]
        data = {view: frame.astype(np.float32)[..., None]}
        data = ScaleIntensityd(view)(data, rng)
        data = SpatialPadd(view, tuple(model.image_size_dict[view]))(data, rng)
        images[view] = jnp.asarray(data[view])[None]

    loss, preds, masks, _ = model.apply(
        params, images, args.mask_ratio, rngs={"mask": jax.random.PRNGKey(0)}
    )
    args.out.mkdir(parents=True, exist_ok=True)
    for view in model.views:
        dec_patch = model.dec_patch_size(view)
        grid = tuple(s // p for s, p in zip(model.image_size_dict[view], dec_patch))
        # scatter predicted masked patches back into the patch grid
        target = patchify(images[view], dec_patch)
        full = jnp.asarray(target)
        full = full.at[jnp.arange(1)[:, None], masks[view].mask_ids].set(
            preds[view].astype(full.dtype)
        )
        recon = np.asarray(unpatchify(full, dec_patch, grid))[0, ..., 0]
        np.save(args.out / f"recon_{view}.npy", recon)

        # binary mask volume (1 = patch was masked) for the viz grid
        ones = jnp.zeros_like(jnp.asarray(target))
        ones = ones.at[jnp.arange(1)[:, None], masks[view].mask_ids].set(1.0)
        mask_vol = np.asarray(unpatchify(ones, dec_patch, grid))[0, ..., 0]

        if view == "sax":
            # original/masked/reconstructed/error grid (reference mae.py:14-56)
            from cinema_tpu.viz import plot_mae_reconstruction

            plot_mae_reconstruction(
                np.asarray(images[view])[0, ..., 0].astype(np.float32),
                recon.astype(np.float32),
                mask_vol.astype(np.float32),
                args.out / "mae_reconstruction.png",
            )
    print(f"loss={float(loss):.4f}; reconstructions saved to {args.out}")


if __name__ == "__main__":
    main()
