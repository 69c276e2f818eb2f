"""Label-free EF test-retest reproducibility on paired rescan studies
(reference: cinema/segmentation/rescan/ef_eval.py:58-216).

For each acquisition the 4D SAX video is segmented frame-by-frame (all
frames in ONE batched forward), per-frame LV volumes give EDV=max / ESV=min
-> EF, and reproducibility is summarised as MAE/RMSE, coefficient of
variance, and EF-region agreement across scan/rescan pairs.

Processed layout (rescan preprocess output): data_dir/<split>/<pid>/sax_t.nii.gz
with <split>_metadata.csv carrying one row per acquisition. Pids follow the
reference's ``scan_<i>_<A|B|B...>`` scheme — the trailing letter is the
acquisition, the rest the subject.
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from cinema_tpu.config import Config
from cinema_tpu.data.nifti import load_nifti
from cinema_tpu.data.transforms import ScaleIntensityd, SpatialPadd
from cinema_tpu.log import get_logger
from cinema_tpu.metrics import coefficient_of_variance, get_ef_region
from cinema_tpu.tasks.segmentation.kaggle import video_lv_volumes
from cinema_tpu.tasks.segmentation.rescan import ef_from_volumes

logger = get_logger(__name__)


def _subject_acq(pid: str) -> tuple:
    """scan_00_A -> (scan_00, A); nested pids fall back to path parts."""
    if "_" in pid:
        subject, acq = pid.rsplit("_", 1)
        if len(acq) <= 2:
            return subject, acq
    parts = pid.split("/")
    return parts[0], parts[-1]


def evaluate_pair_reproducibility(df: pd.DataFrame) -> dict:
    """Summarise EF agreement between paired acquisitions."""
    pivot = df.pivot_table(index="subject", columns="acq", values="ef")
    pivot = pivot.dropna()
    a = pivot.iloc[:, 0].to_numpy(dtype=np.float64)
    b = pivot.iloc[:, 1].to_numpy(dtype=np.float64)
    region_match = np.mean(
        [get_ef_region(x) == get_ef_region(y) for x, y in zip(a, b)]
    )
    out = {
        "n_pairs": int(len(a)),
        "ef_mae": float(np.mean(np.abs(a - b))),
        "ef_rmse": float(np.sqrt(np.mean((a - b) ** 2))),
        "ef_cv": coefficient_of_variance(a, b),
        "ef_region_agreement": float(region_match),
    }
    # agreement with the human labels when present (reference ef_eval.py:148-170)
    if "label_ef" in df.columns and df["label_ef"].notna().any():
        merged = df.dropna(subset=["label_ef"])
        err = merged["ef"].to_numpy(np.float64) - merged["label_ef"].to_numpy(np.float64)
        out["ef_label_mae"] = float(np.mean(np.abs(err)))
        out["ef_label_rmse"] = float(np.sqrt(np.mean(err**2)))
    return out


def rescan_ef_eval(
    config: Config,
    model: Any,
    params: Any,
    split: str,
    out_dir: Path,
) -> Dict[str, float]:
    """Segment every acquisition's video, derive EF, summarise pairs."""
    data_dir = Path(config.data.dir).expanduser()
    meta_df = pd.read_csv(data_dir / f"{split}_metadata.csv")
    patch_size = tuple(config.data.sax.patch_size)
    spacing = tuple(config.data.sax.spacing)
    forward = jax.jit(lambda p, imgs: model.apply(p, imgs))

    rng = np.random.default_rng(0)
    rows = []
    for _, row in meta_df.iterrows():
        pid = str(row["pid"])
        pid_dir = data_dir / split / pid
        video_path = pid_dir / "sax_t.nii.gz"
        video, _ = load_nifti(video_path)  # (x, y, z, t)
        n_frames = video.shape[-1]
        frames = []
        for t in range(n_frames):
            data = {"sax_image": video[..., t][..., None].astype(np.float32)}
            data = ScaleIntensityd("sax_image")(data, rng)
            data = SpatialPadd("sax_image", patch_size)(data, rng)
            frames.append(data["sax_image"])
        batch = jnp.asarray(np.stack(frames))
        volumes = video_lv_volumes(forward, params, batch, spacing, n_frames)
        subject, acq = _subject_acq(pid)
        rows.append(
            {
                "pid": pid,
                "subject": row.get("subject", subject),
                "acq": row.get("acq", acq),
                "ef": ef_from_volumes(volumes),
                "edv": float(volumes.max()),
                "esv": float(volumes.min()),
                "label_ef": float(row["ef"]) if "ef" in row and pd.notna(row["ef"]) else np.nan,
            }
        )
    df = pd.DataFrame(rows)
    out_dir.mkdir(parents=True, exist_ok=True)
    df.to_csv(out_dir / "ef_metrics.csv", index=False)
    summary = evaluate_pair_reproducibility(df)
    pd.DataFrame([summary]).to_csv(out_dir / "mean_metrics.csv", index=False)
    logger.info(f"EF reproducibility: {summary}")
    return summary


def main() -> None:
    parser = argparse.ArgumentParser(description="Rescan test-retest EF reproducibility.")
    parser.add_argument(
        "--folder_path", type=Path, required=True, help="run folder (config.yaml + safetensors)"
    )
    parser.add_argument("--split", type=str, default="test_retest_100")
    args = parser.parse_args()

    from cinema_tpu.tasks.evaluate import load_run

    config, model, params = load_run(args.folder_path, dtype=jnp.bfloat16)
    out_dir = args.folder_path / f"rescan_{args.split}_ef_eval"
    rescan_ef_eval(config, model, params, args.split, out_dir)


if __name__ == "__main__":
    main()
