"""Landmark localization via coordinate regression (reference: cinema/examples/inference/landmark_coordinate.py)."""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parents[2]))  # repo root, for non-installed use


import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from cinema_tpu.data.transforms import ScaleIntensityd, SpatialPadd
from cinema_tpu.factory import from_finetuned


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True)
    parser.add_argument("--config", required=True)
    parser.add_argument("--image", required=True, type=Path, help="grayscale PNG")
    args = parser.parse_args()

    model, params = from_finetuned("convvit", args.model, args.config, dtype=jnp.bfloat16)
    view = model.views[0]
    image = np.asarray(Image.open(args.image).convert("L"), dtype=np.float32).T
    w, h = image.shape
    rng = np.random.default_rng(0)
    data = {f"{view}_image": image[..., None]}
    data = ScaleIntensityd(f"{view}_image")(data, rng)
    data = SpatialPadd(f"{view}_image", tuple(model.image_size_dict[view]))(data, rng)
    batch = {view: jnp.asarray(data[f"{view}_image"])[None]}

    out = jax.jit(lambda p, imgs: model.apply(p, imgs))(params, batch)
    coords = (np.asarray(out)[0].reshape(3, 2) * np.array([w, h])).astype(int)
    print("landmark coordinates (x, y):")
    for i, (x, y) in enumerate(coords):
        print(f"  landmark {i}: ({x}, {y})")


if __name__ == "__main__":
    main()
