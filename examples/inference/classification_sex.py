"""Sex classification inference (reference: cinema/examples/inference/classification_sex.py).

Loads a finetuned ConvViT and predicts from ED+ES frames of a SAX stack.
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

from cinema_tpu.data.nifti import load_nifti
from cinema_tpu.data.transforms import ScaleIntensityd, SpatialPadd
from cinema_tpu.factory import from_finetuned


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True, help="safetensors path or repo::file")
    parser.add_argument("--config", required=True, help="config.yaml path or repo::file")
    parser.add_argument("--ed", required=True, type=Path, help="ED frame NIfTI")
    parser.add_argument("--es", required=True, type=Path, help="ES frame NIfTI")
    args = parser.parse_args()

    model, params = from_finetuned("convvit", args.model, args.config, dtype=jnp.bfloat16)
    view = model.views[0]
    patch_size = tuple(model.image_size_dict[view])

    ed, _ = load_nifti(args.ed)
    es, _ = load_nifti(args.es)
    image = np.stack([ed, es], axis=-1).astype(np.float32)  # ED+ES as channels
    rng = np.random.default_rng(0)
    data = {f"{view}_image": image}
    data = ScaleIntensityd(f"{view}_image")(data, rng)
    data = SpatialPadd(f"{view}_image", patch_size)(data, rng)
    batch = {view: jnp.asarray(data[f"{view}_image"])[None]}

    out = jax.jit(lambda p, imgs: model.apply(p, imgs))(params, batch)
    probs = np.asarray(jax.nn.softmax(out.astype(jnp.float32), axis=-1))[0]
    print("class probabilities:", np.round(probs, 4))
    print("predicted class index:", int(np.argmax(probs)))


if __name__ == "__main__":
    main()
