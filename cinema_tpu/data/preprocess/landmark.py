"""Landmark dataset preprocessing (reference: cinema/data/landmark/preprocess.py).

Raw layout: <root>/{lax_2c,lax_4c}.csv (cohort_name, uid, view,
landmark_number, x, y) + <root>/<view>/{images,masks}/<uid>.png.
Pipeline: downscale by ``scale``, extract 3 landmark coordinates, write
grayscale PNGs + per-view train/val/test CSVs with x1..y3 columns.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
import pandas as pd

from cinema_tpu.log import get_logger

logger = get_logger(__name__)


def process_view(data_dir: Path, out_dir: Path, view: str, scale: float = 0.25) -> None:
    from PIL import Image

    meta_df = pd.read_csv(
        data_dir / f"{view}.csv",
        header=None,
        names=["cohort_name", "uid", "view", "landmark_number", "x", "y"],
    )
    img_dir = out_dir / view / "images"
    img_dir.mkdir(parents=True, exist_ok=True)
    rows = []
    for uid, group in meta_df.groupby("uid"):
        image_path = data_dir / view / "images" / f"{uid}.png"
        if not image_path.exists():
            logger.warning(f"{image_path} missing, skipping.")
            continue
        image = Image.open(image_path).convert("L")
        new_size = (int(image.width * scale), int(image.height * scale))
        image.resize(new_size).save(img_dir / f"{uid}.png")
        group = group.sort_values("landmark_number")
        coords = (group[["x", "y"]].to_numpy(dtype=np.float64) * scale).round().astype(int)
        if len(coords) != 3:
            logger.warning(f"{uid} has {len(coords)} landmarks, skipping.")
            continue
        rows.append(
            {
                "uid": uid,
                "view": view,
                "path": f"{view}/images/{uid}.png",
                "x1": coords[0, 0],
                "y1": coords[0, 1],
                "x2": coords[1, 0],
                "y2": coords[1, 1],
                "x3": coords[2, 0],
                "y3": coords[2, 1],
            }
        )
    df = pd.DataFrame(rows)
    # deterministic 8/1/1 split
    n = len(df)
    df = df.sample(frac=1.0, random_state=0).reset_index(drop=True)
    train, val = df.iloc[: int(0.8 * n)], df.iloc[int(0.8 * n) : int(0.9 * n)]
    test = df.iloc[int(0.9 * n) :]
    for name, part in (("train", train), ("val", val), ("test", test)):
        csv_path = out_dir / f"{name}_metadata.csv"
        if csv_path.exists():
            # merge with the other view's rows instead of overwriting them
            # (processing lax_2c then lax_4c into one out_dir); re-running
            # the same view replaces its own rows
            old = pd.read_csv(csv_path)
            if "view" in old.columns:
                old = old[old["view"] != view]
            part = pd.concat([old, part], ignore_index=True)
        part.to_csv(csv_path, index=False)
    logger.info(f"{view}: {len(train)}/{len(val)}/{len(test)} train/val/test.")


def main() -> None:
    parser = argparse.ArgumentParser(description="Preprocess the landmark PNG dataset.")
    parser.add_argument("--data_dir", type=Path, required=True)
    parser.add_argument("--out_dir", type=Path, required=True)
    parser.add_argument("--view", type=str, default="lax_2c", choices=["lax_2c", "lax_4c"])
    parser.add_argument("--scale", type=float, default=0.25)
    args = parser.parse_args()
    process_view(args.data_dir, args.out_dir, args.view, args.scale)


if __name__ == "__main__":
    main()
