"""Label-free EF test-retest reproducibility on paired rescan studies
(reference: cinema/segmentation/rescan/ef_eval.py:58-216).

For each subject the scan/rescan 4D SAX videos are segmented frame-by-frame
(all frames of a video in ONE batched forward), per-frame LV volumes give
EDV=max / ESV=min -> EF, and reproducibility is summarised as MAE/RMSE and
the coefficient of variance across the pairs.

Expected processed layout: data_dir/<split>/<pid>/<pid>_sax_t.nii.gz with a
<split>_metadata.csv carrying pid (one row per acquisition) and a
``subject`` column pairing scan/rescan rows.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from cinema_tpu.config import load_config
from cinema_tpu.data.nifti import load_nifti
from cinema_tpu.data.transforms import ScaleIntensityd, SpatialPadd
from cinema_tpu.log import get_logger
from cinema_tpu.metrics import coefficient_of_variance, get_ef_region
from cinema_tpu.tasks.segmentation.kaggle import video_lv_volumes
from cinema_tpu.tasks.segmentation.rescan import ef_from_volumes

logger = get_logger(__name__)


def evaluate_pair_reproducibility(df: pd.DataFrame) -> dict:
    """Summarise EF agreement between paired acquisitions."""
    pivot = df.pivot_table(index="subject", columns="acq", values="ef")
    pivot = pivot.dropna()
    a = pivot.iloc[:, 0].to_numpy(dtype=np.float64)
    b = pivot.iloc[:, 1].to_numpy(dtype=np.float64)
    region_match = np.mean(
        [get_ef_region(x) == get_ef_region(y) for x, y in zip(a, b)]
    )
    return {
        "n_pairs": int(len(a)),
        "ef_mae": float(np.mean(np.abs(a - b))),
        "ef_rmse": float(np.sqrt(np.mean((a - b) ** 2))),
        "ef_cv": coefficient_of_variance(a, b),
        "ef_region_agreement": float(region_match),
    }


def main() -> None:
    parser = argparse.ArgumentParser(description="Rescan test-retest EF reproducibility.")
    parser.add_argument("--folder_path", type=Path, required=True, help="run folder (config.yaml + safetensors)")
    parser.add_argument("--split", type=str, default="test_retest_100")
    args = parser.parse_args()

    from cinema_tpu.tasks.evaluate import load_run

    config, model, params = load_run(args.folder_path, dtype=jnp.bfloat16)
    data_dir = Path(config.data.dir).expanduser()
    meta_df = pd.read_csv(data_dir / f"{args.split}_metadata.csv")
    patch_size = tuple(config.data.sax.patch_size)
    spacing = tuple(config.data.sax.spacing)
    forward = jax.jit(lambda p, imgs: model.apply(p, imgs))

    rng = np.random.default_rng(0)
    rows = []
    for _, row in meta_df.iterrows():
        pid = str(row["pid"])
        video, _ = load_nifti(data_dir / args.split / pid / f"{pid}_sax_t.nii.gz")  # (x,y,z,t)
        n_frames = video.shape[-1]
        frames = []
        for t in range(n_frames):
            data = {"sax_image": video[..., t][..., None].astype(np.float32)}
            data = ScaleIntensityd("sax_image")(data, rng)
            data = SpatialPadd("sax_image", patch_size)(data, rng)
            frames.append(data["sax_image"])
        batch = jnp.asarray(np.stack(frames))
        volumes = video_lv_volumes(forward, params, batch, spacing, n_frames)
        rows.append(
            {
                "pid": pid,
                "subject": row.get("subject", pid.split("/")[0]),
                "acq": row.get("acq", pid.split("/")[-1]),
                "ef": ef_from_volumes(volumes),
                "edv": float(volumes.max()),
                "esv": float(volumes.min()),
            }
        )
    df = pd.DataFrame(rows)
    out_dir = args.folder_path / f"rescan_{args.split}_ef_eval"
    out_dir.mkdir(parents=True, exist_ok=True)
    df.to_csv(out_dir / "ef_metrics.csv", index=False)
    summary = evaluate_pair_reproducibility(df)
    pd.DataFrame([summary]).to_csv(out_dir / "mean_metrics.csv", index=False)
    logger.info(f"EF reproducibility: {summary}")


if __name__ == "__main__":
    main()
