"""Extract CineMA foundation-model features
(reference: cinema/examples/inference/mae_feature_extraction.py).

Loads the pretrained CineMA and returns cls + per-view token embeddings for
a multi-view study.
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

from cinema_tpu.data.nifti import load_nifti_frame
from cinema_tpu.data.transforms import ScaleIntensityd, SpatialPadd
from cinema_tpu.factory import mae_from_pretrained


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default=None, help="pretrained cinema.safetensors")
    parser.add_argument("--config", default=None, help="pretrained config.yaml")
    parser.add_argument("--study_dir", required=True, type=Path, help="pid dir with {pid}_{view}_t.nii.gz")
    parser.add_argument("--frame", type=int, default=0)
    parser.add_argument("--out", type=Path, default=Path("out/features.npz"))
    args = parser.parse_args()

    model, params = mae_from_pretrained(args.model, args.config, dtype=jnp.bfloat16)
    pid = args.study_dir.name
    rng = np.random.default_rng(0)
    images = {}
    for view in model.views:
        frame, _ = load_nifti_frame(args.study_dir / f"{pid}_{view}_t.nii.gz", args.frame)
        if view != "sax":
            frame = frame[:, :, 0]
        data = {view: frame.astype(np.float32)[..., None]}
        data = ScaleIntensityd(view)(data, rng)
        data = SpatialPadd(view, tuple(model.image_size_dict[view]))(data, rng)
        images[view] = jnp.asarray(data[view])[None]

    feats = jax.jit(lambda p, imgs: model.apply(p, imgs, method="feature_forward"))(params, images)
    out = {k: np.asarray(v) for k, v in feats.items()}
    args.out.parent.mkdir(parents=True, exist_ok=True)
    np.savez(args.out, **out)
    for k, v in out.items():
        print(f"{k}: {v.shape}")
    print(f"Saved features to {args.out}.")


if __name__ == "__main__":
    main()
