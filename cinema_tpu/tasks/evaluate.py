"""``cinema_eval`` dispatcher (reference: cinema/eval.py + segmentation/eval.py).

Loads a run folder (config.yaml + latest exported safetensors), rebuilds the
model, and evaluates the requested dataset split, writing metrics.csv /
mean_metrics.csv / ef_metrics.csv artifacts like the reference.
"""

from __future__ import annotations

import argparse
from itertools import islice
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

from cinema_tpu.config import Config, load_config
from cinema_tpu.data.datasets import (
    BatchLoader,
    EDESClassificationDataset,
    EDESRegressionDataset,
    EDESSegmentationDataset,
)
from cinema_tpu.data.transforms import get_segmentation_transforms
from cinema_tpu.log import get_logger
from cinema_tpu.metrics import ejection_fraction, get_ef_region
from cinema_tpu.tasks.segmentation import (
    make_seg_forward,
    patch_and_spacing_dicts,
    segmentation_eval_batch,
)

logger = get_logger(__name__)


def load_run(folder: Path, dtype=None):
    """Rebuild model + params from a run folder (config.yaml + model_*.safetensors)."""
    import jax.numpy as jnp

    from cinema_tpu.bridge.torch_loader import load_torch_state_dict
    from cinema_tpu.factory import (
        get_segmentation_model,
        init_params,
        load_safetensors,
    )

    config = load_config(folder / "config.yaml")
    sts = sorted(folder.glob("*.safetensors"), key=lambda p: p.stat().st_mtime)
    if not sts:
        raise FileNotFoundError(f"No safetensors checkpoints in {folder}.")
    ckpt = sts[-1]
    logger.info(f"Using checkpoint: {ckpt}")
    dtype = dtype or jnp.float32
    if config.task == "segmentation":
        model = get_segmentation_model(config, dtype=dtype)
    else:
        from cinema_tpu.tasks.classification import get_classification_model

        model = get_classification_model(config, dtype=dtype)
    views = [config.model.views] if isinstance(config.model.views, str) else list(config.model.views)

    def view_cfg(v):
        if v == "sax":
            return config.data.sax
        if "lax" in config.data:
            return config.data.lax
        return config.data[v]

    example = {}
    for v in views:
        import numpy as _np

        size = tuple(view_cfg(v).patch_size)
        chans = view_cfg(v).in_chans
        if config.task in ("classification", "regression") and config.data.get("regression_column") != "landmark":
            chans = chans * config.model.get("n_frames", 1)
        example[v] = _np.zeros((1, *size, chans), _np.float32)
    params = init_params(model, example)
    params, _, _ = load_torch_state_dict(params, load_safetensors(ckpt), strict=False)
    return config, model, params


def ef_metrics_from_edes(df: pd.DataFrame, lv_class: int = 3) -> pd.DataFrame:
    """Patient-level EF from ED/ES volume rows (reference segmentation/eval.py:28-118)."""
    ed = df[df["is_ed"]].set_index("pid")
    es = df[~df["is_ed"]].set_index("pid")
    merged = ed.join(es, lsuffix="_ed", rsuffix="_es", how="inner")
    out = pd.DataFrame(index=merged.index)
    for kind in ["true", "pred"]:
        edv = merged[f"class_{lv_class}_{kind}_volume_ed"]
        esv = merged[f"class_{lv_class}_{kind}_volume_es"]
        out[f"{kind}_ef"] = ejection_fraction(edv, esv)
    out["ef_error"] = out["pred_ef"] - out["true_ef"]
    out["true_region"] = out["true_ef"].map(get_ef_region)
    out["pred_region"] = out["pred_ef"].map(get_ef_region)
    return out.reset_index()


def edes_seg_eval(config: Config, split: str, out_dir: Path, model, params, metrics_fn=None) -> None:
    """Per-sample metrics + EF merge over a test split."""
    from cinema_tpu.metrics import segmentation_metrics

    data_dir = Path(config.data.dir).expanduser()
    meta_path = data_dir / f"{split}_metadata.csv"
    meta_df = pd.read_csv(meta_path, dtype={"pid": str})
    _, val_transform = get_segmentation_transforms(config)
    views = config.model.views
    dataset = EDESSegmentationDataset(data_dir / split, meta_df, views=views, transform=val_transform)
    loader = BatchLoader(dataset, batch_size=1, n_workers=config.train.get("n_workers", 4))
    patch_size_dict, spacing_dict = patch_and_spacing_dicts(config)
    forward = make_seg_forward(model)

    rows: List[Dict] = []
    for batch in loader:
        _, metrics = segmentation_eval_batch(
            forward, params, batch, patch_size_dict, spacing_dict,
            metrics_fn or segmentation_metrics,
            z_bucket=config.get("eval", {}).get("z_bucket", 4),
        )
        metrics["pid"] = batch["pid"][0]
        metrics["is_ed"] = bool(np.asarray(batch["is_ed"]).reshape(-1)[0])
        rows.append(metrics)
    df = pd.DataFrame(rows)
    out_dir.mkdir(parents=True, exist_ok=True)
    df.to_csv(out_dir / "metrics.csv", index=False)
    mean_df = df.drop(columns=["pid", "is_ed"]).mean(numeric_only=True).to_frame().T
    mean_df.to_csv(out_dir / "mean_metrics.csv", index=False)
    view = views if isinstance(views, str) else views[0]
    # exact "{view}_" prefix: unprefixed mean-metric names must never match
    vol_cols = [c for c in df.columns if "volume" in c and c.startswith(f"{view}_")]
    if vol_cols:
        slim = df[["pid", "is_ed"] + vol_cols].rename(
            columns={c: c[len(view) + 1 :] for c in vol_cols}
        )
        ef_df = ef_metrics_from_edes(slim)
        ef_df.to_csv(out_dir / "ef_metrics.csv", index=False)
    logger.info(f"Wrote metrics to {out_dir}.")


def volume_seg_eval(
    config: Config, split: str, out_dir: Path, model, params, dataset_cls, metrics_fn
) -> None:
    """Single-volume-per-patient seg eval (emidec / myops2020): their data
    layouts are pid-directories with no ED/ES pairing, so the EDES dataset
    and the EF merge do not apply (reference segmentation/{emidec,myops2020}/
    eval.py evaluate per-patient volumes directly)."""
    data_dir = Path(config.data.dir).expanduser()
    meta_df = pd.read_csv(data_dir / f"{split}_metadata.csv")
    _, val_transform = get_segmentation_transforms(config)
    dataset = dataset_cls(data_dir / split, meta_df, transform=val_transform)
    loader = BatchLoader(dataset, batch_size=1, n_workers=config.train.get("n_workers", 4))
    patch_size_dict, spacing_dict = patch_and_spacing_dicts(config)
    forward = make_seg_forward(model)

    rows: List[Dict] = []
    for batch in loader:
        _, metrics = segmentation_eval_batch(
            forward, params, batch, patch_size_dict, spacing_dict, metrics_fn,
            z_bucket=config.get("eval", {}).get("z_bucket", 4),
        )
        metrics["pid"] = batch["pid"][0]
        rows.append(metrics)
    df = pd.DataFrame(rows)
    out_dir.mkdir(parents=True, exist_ok=True)
    df.to_csv(out_dir / "metrics.csv", index=False)
    df.drop(columns=["pid"]).mean(numeric_only=True).to_frame().T.to_csv(
        out_dir / "mean_metrics.csv", index=False
    )
    logger.info(f"Wrote metrics to {out_dir}.")


def rescan_seg_eval(config: Config, split: str, out_dir: Path, model, params) -> None:
    """Labeled rescan: per-frame sliding-window seg metrics over the cine
    dataset (reference segmentation/rescan/eval.py).

    Frames of one study are batched into shared forwards (chunks of
    ``eval.frames_per_forward``, default 8) — the reference dispatches each
    frame alone at batch 1 (segmentation/train.py:204-210); a 50-frame study
    here is ~7 dispatches instead of 50. The tail chunk is wrap-padded to
    reuse the compiled shape; padded rows' metrics are dropped.
    """
    from cinema_tpu.data.datasets import CineSegmentationDataset
    from cinema_tpu.metrics import segmentation_metrics

    data_dir = Path(config.data.dir).expanduser()
    meta_df = pd.read_csv(data_dir / f"{split}_metadata.csv", dtype={"pid": str})
    _, val_transform = get_segmentation_transforms(config)
    dataset = CineSegmentationDataset(
        data_dir / split, meta_df, views=config.model.views, transform=val_transform
    )
    patch_size_dict, spacing_dict = patch_and_spacing_dicts(config)
    forward = make_seg_forward(model)
    chunk = int(config.get("eval", {}).get("frames_per_forward", 8))

    # group the frame-expanded index by study (same pid => same geometry)
    by_pid: Dict[str, List[int]] = {}
    for idx, (row_idx, _t) in enumerate(dataset.index_map):
        by_pid.setdefault(str(dataset.meta_df.iloc[row_idx]["pid"]), []).append(idx)

    chunks: List[Tuple[str, List[int], int]] = []
    for pid, indices in by_pid.items():
        for start in range(0, len(indices), chunk):
            ids = indices[start : start + chunk]
            n_real = len(ids)
            while len(ids) < chunk:  # wrap-pad to the compiled batch shape
                ids.append(indices[(start + len(ids)) % len(indices)])
            chunks.append((pid, ids, n_real))

    # worker-threaded NIfTI decode + transform, two chunks ahead of the
    # device so loading overlaps the forward (like BatchLoader's pipeline)
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    rows: List[Dict] = []
    with ThreadPoolExecutor(max(1, int(config.train.get("n_workers", 4)))) as pool:
        pending: deque = deque()
        it = iter(chunks)

        def submit(c):
            pending.append((c, [pool.submit(dataset.__getitem__, i) for i in c[1]]))

        for c in list(islice(it, 2)):
            submit(c)
        while pending:
            (pid, _ids, n_real), futs = pending.popleft()
            samples = [f.result() for f in futs]
            nxt = next(it, None)
            if nxt is not None:
                submit(nxt)
            batch = {
                k: np.stack([np.asarray(s[k]) for s in samples])
                for k in samples[0]
                if isinstance(samples[0][k], np.ndarray)
            }
            batch["pid"] = [s["pid"] for s in samples]
            _, frame_metrics = segmentation_eval_batch(
                forward, params, batch, patch_size_dict, spacing_dict, segmentation_metrics,
                z_bucket=config.get("eval", {}).get("z_bucket", 4),
                per_sample=True,
            )
            for i in range(n_real):
                m = frame_metrics[i]
                m["pid"] = pid
                m["frame"] = int(np.asarray(samples[i]["frame"]).reshape(-1)[0])
                rows.append(m)
    df = pd.DataFrame(rows)
    out_dir.mkdir(parents=True, exist_ok=True)
    df.to_csv(out_dir / "metrics.csv", index=False)
    df.drop(columns=["pid", "frame"]).mean(numeric_only=True).to_frame().T.to_csv(
        out_dir / "mean_metrics.csv", index=False
    )
    logger.info(f"Wrote metrics to {out_dir}.")


def landmark_seg_eval(config: Config, split: str, out_dir: Path, model, params) -> None:
    """Landmark heatmap eval route (reference eval.py:159-168)."""
    from cinema_tpu.data.datasets import LandmarkDetectionDataset
    from cinema_tpu.tasks.segmentation.landmark import landmark_eval_dataloader

    data_dir = Path(config.data.dir).expanduser()
    meta_df = pd.read_csv(data_dir / f"{split}_metadata.csv")
    view = config.model.views if isinstance(config.model.views, str) else config.model.views[0]
    dataset = LandmarkDetectionDataset(data_dir, meta_df, view)
    loader = BatchLoader(dataset, batch_size=1, n_workers=config.train.get("n_workers", 4))
    metrics = landmark_eval_dataloader(model, params, loader, config)
    out_dir.mkdir(parents=True, exist_ok=True)
    pd.DataFrame([metrics]).to_csv(out_dir / "mean_metrics.csv", index=False)
    logger.info(f"Landmark heatmap eval: {metrics}")


def landmark_reg_eval(config: Config, split: str, out_dir: Path, model, params) -> None:
    """Landmark coordinate-regression eval route (reference eval.py:100-113)."""
    from cinema_tpu.data.datasets import LandmarkRegressionDataset
    from cinema_tpu.tasks.regression.landmark import landmark_regression_eval_dataloader

    data_dir = Path(config.data.dir).expanduser()
    meta_df = pd.read_csv(data_dir / f"{split}_metadata.csv")
    view = config.model.views if isinstance(config.model.views, str) else config.model.views[0]
    dataset = LandmarkRegressionDataset(data_dir, meta_df, view)
    loader = BatchLoader(dataset, batch_size=1, n_workers=config.train.get("n_workers", 4))
    metrics = landmark_regression_eval_dataloader(model, params, loader, config)
    out_dir.mkdir(parents=True, exist_ok=True)
    pd.DataFrame([metrics]).to_csv(out_dir / "mean_metrics.csv", index=False)
    logger.info(f"Landmark regression eval: {metrics}")


def main(argv: Optional[list] = None) -> None:
    parser = argparse.ArgumentParser(description="Evaluate a cinema_tpu run folder.")
    parser.add_argument("--folder_path", type=Path, required=True)
    parser.add_argument("--split", type=str, default="test")
    parser.add_argument("--data", type=str, default="")
    args = parser.parse_args(argv)

    config, model, params = load_run(args.folder_path)
    data = args.data or config.data.name
    out_dir = args.folder_path / f"{data}_eval"

    if config.task == "segmentation":
        if data in ("acdc", "mnms", "mnms2"):
            edes_seg_eval(config, args.split, out_dir, model, params)
        elif data == "emidec":
            from cinema_tpu.data.datasets import EMIDECDataset
            from cinema_tpu.tasks.segmentation.emidec import emidec_segmentation_metrics

            volume_seg_eval(
                config, args.split, out_dir, model, params, EMIDECDataset, emidec_segmentation_metrics
            )
        elif data == "myops2020":
            from cinema_tpu.data.datasets import MYOPS2020Dataset
            from cinema_tpu.tasks.segmentation.myops2020 import myops2020_segmentation_metrics

            volume_seg_eval(
                config, args.split, out_dir, model, params, MYOPS2020Dataset, myops2020_segmentation_metrics
            )
        elif data == "kaggle":
            from cinema_tpu.tasks.segmentation.kaggle import evaluate_kaggle

            metrics = evaluate_kaggle(model, params, config, split=args.split)
            out_dir.mkdir(parents=True, exist_ok=True)
            pd.DataFrame([metrics]).to_csv(out_dir / "mean_metrics.csv", index=False)
        elif data == "rescan":
            if args.split == "test_retest_100":
                from cinema_tpu.tasks.segmentation.rescan_ef_eval import rescan_ef_eval

                rescan_ef_eval(config, model, params, args.split, out_dir)
            else:
                rescan_seg_eval(config, args.split, out_dir, model, params)
        elif data == "landmark":
            landmark_seg_eval(config, args.split, out_dir, model, params)
        else:
            raise ValueError(f"Unknown dataset: {data}")
    elif config.task == "classification":
        from cinema_tpu.tasks.classification import classification_eval_dataloader

        data_dir = Path(config.data.dir).expanduser()
        meta_df = pd.read_csv(data_dir / f"{args.split}_metadata.csv", dtype={"pid": str})
        class_col = config.data.class_column
        classes = list(config.data[class_col])
        meta_df = meta_df[meta_df[class_col].isin(classes)].reset_index(drop=True)
        _, val_transform = get_segmentation_transforms(config)
        dataset = EDESClassificationDataset(
            data_dir / args.split, meta_df, class_col, classes, config.model.views, val_transform
        )
        loader = BatchLoader(dataset, batch_size=1, n_workers=config.train.get("n_workers", 4))
        metrics = classification_eval_dataloader(model, params, loader, config)
        out_dir.mkdir(parents=True, exist_ok=True)
        pd.DataFrame([metrics]).to_csv(out_dir / "mean_metrics.csv", index=False)
    elif config.task == "regression":
        if data == "landmark":
            landmark_reg_eval(config, args.split, out_dir, model, params)
            return
        from cinema_tpu.tasks.regression import regression_eval_dataloader

        data_dir = Path(config.data.dir).expanduser()
        meta_df = pd.read_csv(data_dir / f"{args.split}_metadata.csv", dtype={"pid": str})
        reg_col = config.data.regression_column
        meta_df = meta_df.dropna(subset=[reg_col]).reset_index(drop=True)
        _, val_transform = get_segmentation_transforms(config)
        dataset = EDESRegressionDataset(
            data_dir / args.split,
            meta_df,
            reg_col,
            float(config.data[reg_col]["mean"]),
            float(config.data[reg_col]["std"]),
            config.model.views,
            val_transform,
        )
        loader = BatchLoader(dataset, batch_size=1, n_workers=config.train.get("n_workers", 4))
        metrics = regression_eval_dataloader(model, params, loader, config)
        out_dir.mkdir(parents=True, exist_ok=True)
        pd.DataFrame([metrics]).to_csv(out_dir / "mean_metrics.csv", index=False)
    else:
        raise ValueError(f"Unknown evaluation task: {config.task}")


def _make_dataset_eval_main(data: str, task: str):
    """Per-dataset eval console script (reference pyproject.toml:58-106
    declares one ``<data>_<task>_eval`` per dataset; all route through the
    same dispatcher here)."""

    def _main(argv: Optional[list] = None) -> None:
        parser = argparse.ArgumentParser(description=f"Evaluate a {data} {task} run folder.")
        parser.add_argument("--folder_path", type=Path, required=True)
        parser.add_argument("--split", type=str, default="test")
        args = parser.parse_args(argv)
        config = load_config(args.folder_path / "config.yaml")
        if config.task != task:
            raise ValueError(
                f"{data}_{task} eval called on a '{config.task}' run folder "
                f"({args.folder_path}); use the matching *_{{seg,clf,reg}}_eval script."
            )
        main(["--folder_path", str(args.folder_path), "--split", args.split, "--data", data])

    _main.__name__ = f"main_{data}_{task}"
    return _main


main_acdc_seg = _make_dataset_eval_main("acdc", "segmentation")
main_acdc_clf = _make_dataset_eval_main("acdc", "classification")
main_acdc_reg = _make_dataset_eval_main("acdc", "regression")
main_mnms_seg = _make_dataset_eval_main("mnms", "segmentation")
main_mnms_clf = _make_dataset_eval_main("mnms", "classification")
main_mnms_reg = _make_dataset_eval_main("mnms", "regression")
main_mnms2_seg = _make_dataset_eval_main("mnms2", "segmentation")
main_mnms2_clf = _make_dataset_eval_main("mnms2", "classification")
main_mnms2_reg = _make_dataset_eval_main("mnms2", "regression")
main_kaggle_seg = _make_dataset_eval_main("kaggle", "segmentation")
main_rescan_seg = _make_dataset_eval_main("rescan", "segmentation")
main_emidec_seg = _make_dataset_eval_main("emidec", "segmentation")
main_myops2020_seg = _make_dataset_eval_main("myops2020", "segmentation")
main_landmark_seg = _make_dataset_eval_main("landmark", "segmentation")
main_landmark_reg = _make_dataset_eval_main("landmark", "regression")


if __name__ == "__main__":
    main()
