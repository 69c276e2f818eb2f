"""Task datasets (reference: cinema/{segmentation,classification,regression}/dataset.py,
segmentation/rescan/dataset.py, mae/pretrain.py:49-154).

All datasets are map-style (``len``/``__getitem__``) over processed NIfTI
folders + pandas metadata, yielding channels-LAST numpy dicts. Batching is
handled by :class:`BatchLoader` (threaded prefetch, host-side), replacing
torch DataLoader workers.

File layout per patient (reference segmentation/dataset.py:36-54):
    data_dir/pid/pid_{view}_{ed|es}.nii.gz (+ _gt.nii.gz labels)
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Callable, Dict, List, Optional, Sequence, Union

import numpy as np
import pandas as pd

from cinema_tpu.data.nifti import load_nifti, load_nifti_frame, load_nifti_header
from cinema_tpu.log import get_logger

logger = get_logger(__name__)

Sample = Dict[str, np.ndarray]
Transform = Callable[[Sample, np.random.Generator], Sample]


def _as_views(views: Union[str, Sequence[str]]) -> List[str]:
    return [views] if isinstance(views, str) else list(views)


def _check_meta(meta_df: pd.DataFrame, cols=("pid", "n_slices")) -> None:
    for col in cols:
        if col not in meta_df.columns:
            raise ValueError(f"Column {col} is required in meta_df.")


def _load_view_image(pid_dir: Path, pid: str, view: str, frame_name: str) -> np.ndarray:
    arr, _ = load_nifti(pid_dir / f"{pid}_{view}_{frame_name}.nii.gz")
    return arr.astype(np.float32)


class SeededItemRNG:
    """Deterministic per-item augmentation RNG.

    Round-1 regression: every dataset drew OS-entropy Generators, so no run
    was reproducible despite the transform layer being built around explicit
    Generators. The rng for item ``idx`` derives from (seed, epoch, idx);
    BatchLoader advances the epoch via set_epoch, so re-running a seeded
    pipeline replays identical augmentations (replaces torch's
    DataLoader worker seeding + DistributedSampler.set_epoch).
    """

    seed: int = 0
    _epoch: int = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = int(epoch)

    def _item_rng(self, idx: int) -> np.random.Generator:
        return np.random.default_rng([int(self.seed), int(self._epoch), int(idx)])


class EDESSegmentationDataset(SeededItemRNG):
    """ED/ES segmentation pairs; idx//2 = patient, idx%2 = ED/ES
    (reference segmentation/dataset.py:33-137)."""

    def __init__(
        self,
        data_dir: Union[str, Path],
        meta_df: pd.DataFrame,
        views: Union[str, Sequence[str]],
        transform: Optional[Transform] = None,
    ) -> None:
        _check_meta(meta_df)
        self.data_dir = Path(data_dir)
        self.meta_df = meta_df.reset_index(drop=True)
        self.views = _as_views(views)
        self.transform = transform

    def __len__(self) -> int:
        return len(self.meta_df) * 2

    def __getitem__(self, idx: int) -> Sample:
        row = self.meta_df.iloc[idx // 2]
        is_ed = idx % 2 == 0
        pid = str(row["pid"])
        pid_dir = self.data_dir / pid
        frame_name = "ed" if is_ed else "es"
        data: Sample = {"pid": pid, "is_ed": np.asarray(is_ed)}
        for view in self.views:
            image = _load_view_image(pid_dir, pid, view, frame_name)  # (x, y, z)
            label, _ = load_nifti(pid_dir / f"{pid}_{view}_{frame_name}_gt.nii.gz")
            data[f"{view}_width"] = np.asarray(image.shape[0])
            data[f"{view}_height"] = np.asarray(image.shape[1])
            if view == "sax":
                data["n_slices"] = np.asarray(int(row["n_slices"]))
            else:
                image = image[..., 0]
                label = label[..., 0]
            data[f"{view}_image"] = image[..., None]  # channels-last
            data[f"{view}_label"] = label.astype(np.int8)
        if self.transform:
            data = self.transform(data, self._item_rng(idx))
        return data


class EDESClassificationDataset(SeededItemRNG):
    """ED+ES stacked as 2 channels with a class label
    (reference classification/dataset.py:32-133)."""

    def __init__(
        self,
        data_dir: Union[str, Path],
        meta_df: pd.DataFrame,
        class_col: str,
        classes: Sequence[str],
        views: Union[str, Sequence[str]],
        transform: Optional[Transform] = None,
    ) -> None:
        _check_meta(meta_df)
        self.data_dir = Path(data_dir)
        self.meta_df = meta_df.reset_index(drop=True)
        self.views = _as_views(views)
        self.transform = transform
        self.class_col = class_col
        self.classes = list(classes)

    def __len__(self) -> int:
        return len(self.meta_df)

    def __getitem__(self, idx: int) -> Sample:
        row = self.meta_df.iloc[idx]
        pid = str(row["pid"])
        pid_dir = self.data_dir / pid
        cls = row[self.class_col]
        data: Sample = {"pid": pid, "label": np.asarray(self.classes.index(cls))}
        for view in self.views:
            ed = _load_view_image(pid_dir, pid, view, "ed")
            es = _load_view_image(pid_dir, pid, view, "es")
            image = np.stack([ed, es], axis=-1)  # (x, y, z, 2) channels-last
            if view != "sax":
                image = image[:, :, 0]  # (x, y, 2)
            data[f"{view}_image"] = image
        if self.transform:
            data = self.transform(data, self._item_rng(idx))
        return data


class EDESRegressionDataset(SeededItemRNG):
    """ED+ES channels with z-normalised scalar target
    (reference regression/dataset.py:22-133)."""

    def __init__(
        self,
        data_dir: Union[str, Path],
        meta_df: pd.DataFrame,
        reg_col: str,
        reg_mean: float,
        reg_std: float,
        views: Union[str, Sequence[str]],
        transform: Optional[Transform] = None,
    ) -> None:
        _check_meta(meta_df)
        self.data_dir = Path(data_dir)
        self.meta_df = meta_df.reset_index(drop=True)
        self.views = _as_views(views)
        self.transform = transform
        self.reg_col = reg_col
        self.reg_mean = reg_mean
        self.reg_std = reg_std

    def __len__(self) -> int:
        return len(self.meta_df)

    def __getitem__(self, idx: int) -> Sample:
        row = self.meta_df.iloc[idx]
        pid = str(row["pid"])
        pid_dir = self.data_dir / pid
        value = (float(row[self.reg_col]) - self.reg_mean) / self.reg_std
        data: Sample = {"pid": pid, "label": np.asarray(value, np.float32)}
        for view in self.views:
            ed = _load_view_image(pid_dir, pid, view, "ed")
            es = _load_view_image(pid_dir, pid, view, "es")
            image = np.stack([ed, es], axis=-1)
            if view != "sax":
                image = image[:, :, 0]
            data[f"{view}_image"] = image
        if self.transform:
            data = self.transform(data, self._item_rng(idx))
        return data


class CineSegmentationDataset(SeededItemRNG):
    """Per-frame segmentation from 4D cine volumes, frame-expanded index
    (reference segmentation/rescan/dataset.py:22-130).

    meta_df needs pid, n_slices, n_frames columns; files are the rescan
    preprocess outputs ``pid/{view}_t.nii.gz`` (+ ``{view}_gt_t.nii.gz`` for
    labeled splits). Images are min-max normalised per frame like the
    reference; unlabeled (test_retest) rows pass edv/esv/ef through.
    """

    def __init__(
        self,
        data_dir: Union[str, Path],
        meta_df: pd.DataFrame,
        views: Union[str, Sequence[str]] = "sax",
        has_labels: bool = True,
        transform: Optional[Transform] = None,
        max_n_frames: Optional[int] = None,
    ) -> None:
        _check_meta(meta_df, cols=("pid", "n_slices", "n_frames"))
        self.data_dir = Path(data_dir)
        self.meta_df = meta_df.reset_index(drop=True)
        self.views = _as_views(views)
        if has_labels and set(self.views) != {"sax"}:
            raise ValueError(f"Only the SAX view has labels, got {self.views}.")
        self.has_labels = has_labels
        self.transform = transform
        self.index_map: List[tuple] = []
        for i, row in self.meta_df.iterrows():
            n_frames = int(row["n_frames"])
            if max_n_frames is not None:
                n_frames = min(n_frames, max_n_frames)
            for t in range(n_frames):
                self.index_map.append((i, t))

    def __len__(self) -> int:
        return len(self.index_map)

    def __getitem__(self, idx: int) -> Sample:
        row_idx, t = self.index_map[idx]
        row = self.meta_df.iloc[row_idx]
        pid = str(row["pid"])
        pid_dir = self.data_dir / pid
        data: Sample = {"pid": pid, "frame": np.asarray(t)}
        for view in self.views:
            image, _ = load_nifti_frame(pid_dir / f"{view}_t.nii.gz", t)
            image = image.astype(np.float32)
            v_min, v_max = float(image.min()), float(image.max())
            if v_max > v_min:
                image = (image - v_min) / (v_max - v_min)
            if view == "sax":
                data["n_slices"] = np.asarray(int(row["n_slices"]))
            else:
                image = image[..., 0]
            data[f"{view}_width"] = np.asarray(image.shape[0])
            data[f"{view}_height"] = np.asarray(image.shape[1])
            data[f"{view}_image"] = image[..., None]  # channels-last
            if self.has_labels:
                label, _ = load_nifti_frame(pid_dir / f"{view}_gt_t.nii.gz", t)
                data[f"{view}_label"] = label.astype(np.int8)
            else:
                for col in ("edv", "esv", "ef"):
                    if col in row:
                        data[col] = np.asarray(float(row[col]))
        if self.transform:
            data = self.transform(data, self._item_rng(idx))
        return data


def gaussian_heatmap(
    shape: Sequence[int],
    centers: np.ndarray,
    sigma: float = 3.0,
) -> np.ndarray:
    """Gaussian circle heatmaps (reference segmentation/landmark/dataset.py:19-38).

    Args:
        shape: (w, h).
        centers: (n, 2) landmark coordinates.
        sigma: gaussian width.

    Returns:
        (w, h, n) float32 heatmaps in [0, 1].
    """
    w, h = shape
    xs, ys = np.meshgrid(np.arange(w), np.arange(h), indexing="ij")
    maps = [
        np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * sigma**2)) for cx, cy in centers
    ]
    return np.stack(maps, axis=-1).astype(np.float32)


class LandmarkDetectionDataset(SeededItemRNG):
    """PNG images + landmark coords -> gaussian heatmap labels
    (reference segmentation/landmark/dataset.py)."""

    def __init__(
        self,
        data_dir: Union[str, Path],
        meta_df: pd.DataFrame,
        view: str,
        transform: Optional[Transform] = None,
        sigma: float = 3.0,
    ) -> None:
        self.data_dir = Path(data_dir)
        if "view" in meta_df.columns:
            # merged multi-view metadata (preprocess/landmark.py): keep only
            # this view's rows — training/eval are per view like the reference
            meta_df = meta_df[meta_df["view"] == view]
        self.meta_df = meta_df.reset_index(drop=True)
        self.view = view
        self.transform = transform
        self.sigma = sigma

    def __len__(self) -> int:
        return len(self.meta_df)

    def _load_image(self, row) -> np.ndarray:
        from PIL import Image

        path = self.data_dir / str(row["path"])
        return np.asarray(Image.open(path).convert("L"), dtype=np.float32).T  # (x, y)

    def _coords(self, row) -> np.ndarray:
        return np.array(
            [[row["x1"], row["y1"]], [row["x2"], row["y2"]], [row["x3"], row["y3"]]],
            dtype=np.float32,
        )

    def __getitem__(self, idx: int) -> Sample:
        row = self.meta_df.iloc[idx]
        image = self._load_image(row)
        coords = self._coords(row)
        heatmap = gaussian_heatmap(image.shape, coords, self.sigma)
        data: Sample = {
            f"{self.view}_image": image[..., None],
            f"{self.view}_label": heatmap,
            f"{self.view}_width": np.asarray(image.shape[0]),
            f"{self.view}_height": np.asarray(image.shape[1]),
        }
        if self.transform:
            data = self.transform(data, self._item_rng(idx))
        return data


class LandmarkRegressionDataset(LandmarkDetectionDataset):
    """PNG images + coords normalised to [0,1]
    (reference regression/landmark/dataset.py)."""

    def __getitem__(self, idx: int) -> Sample:
        row = self.meta_df.iloc[idx]
        image = self._load_image(row)
        coords = self._coords(row)
        scale = np.array([image.shape[0], image.shape[1]], np.float32)
        data: Sample = {
            f"{self.view}_image": image[..., None],
            "label": (coords / scale).reshape(-1).astype(np.float32),
            f"{self.view}_width": np.asarray(image.shape[0]),
            f"{self.view}_height": np.asarray(image.shape[1]),
        }
        if self.transform:
            data = self.transform(data, self._item_rng(idx))
        return data


def find_view_file(pid_dir: Path, pid: str, view: str) -> Optional[Path]:
    """Resolve a study's 4D view NIfTI: accepts both the `{pid}_{view}_t`
    naming of the bundled demos and the reference ingest's `{pid}_{view}`
    (examples/dicom_to_nifti.py:366-380 writes without the `_t` suffix)."""
    for name in (
        f"{pid}_{view}_t.nii.gz",
        f"{pid}_{view}_t.nii",
        f"{pid}_{view}.nii.gz",
        f"{pid}_{view}.nii",
    ):
        path = pid_dir / name
        if path.exists():
            return path
    return None


class UKBCineDataset(SeededItemRNG):
    """Streaming pretrain dataset: per item one random frame of each view's
    4D NIfTI via frame-seek reads (reference mae/pretrain.py:88-154)."""

    def __init__(
        self,
        data_dir: Union[str, Path],
        pids: Sequence[str],
        views: Sequence[str] = ("sax", "lax_2c", "lax_3c", "lax_4c"),
        transform: Optional[Transform] = None,
        seed: int = 0,
    ) -> None:
        self.data_dir = Path(data_dir)
        self.pids = list(pids)
        self.views = list(views)
        self.transform = transform
        self.seed = seed

    def __len__(self) -> int:
        return len(self.pids)

    def __getitem__(self, idx: int) -> Sample:
        pid = self.pids[idx]
        pid_dir = self.data_dir / pid
        rng = self._item_rng(idx)
        data: Sample = {"pid": pid}
        for view in self.views:
            path = find_view_file(pid_dir, pid, view)
            if path is None:
                raise FileNotFoundError(f"No 4D NIfTI for view {view} in {pid_dir}.")
            header = load_nifti_header(path)
            t = int(rng.integers(0, header.shape[-1]))
            frame, _ = load_nifti_frame(path, t)
            if view != "sax":
                frame = frame[:, :, 0]
            data[view] = frame.astype(np.float32)[..., None]
        if self.transform:
            data = self.transform(data, rng)
        return data


def collate(samples: List[Sample]) -> Sample:
    """Stack array fields; keep str fields as lists."""
    out: Sample = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], (str, bytes)):
            out[key] = vals  # type: ignore[assignment]
        else:
            out[key] = np.stack([np.asarray(v) for v in vals])
    return out


_WORKER_DATASET = None


def _worker_init(dataset) -> None:
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _worker_get(args):
    epoch, idx = args
    if hasattr(_WORKER_DATASET, "set_epoch"):
        _WORKER_DATASET.set_epoch(epoch)
    return _WORKER_DATASET[int(idx)]


class BatchLoader:
    """Prefetching batch iterator over a map-style dataset.

    Replaces torch DataLoader: shuffle per epoch, drop_last for training,
    ``n_workers`` threads pipeline __getitem__ (IO-bound NIfTI reads release
    the GIL in zlib/numpy). For CPU-bound augmentation pipelines (scipy
    affine/zoom hold the GIL), ``use_processes=True`` runs workers in
    spawned subprocesses (replacing torch DataLoader num_workers); the
    dataset is shipped once at pool creation and the epoch rides with each
    item request so seeded augmentations stay deterministic.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        n_workers: int = 4,
        seed: int = 0,
        prefetch: int = 2,
        use_processes: bool = False,
        process_shard: bool = False,
    ) -> None:
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.n_workers = max(1, n_workers)
        self.seed = seed
        self.prefetch = prefetch
        self.use_processes = use_processes
        # multi-host SPMD: each process loads only its strided shard of the
        # (identically shuffled) index order — torch DistributedSampler
        # semantics (reference cinema/mae/pretrain.py:327-330)
        self.process_shard = process_shard
        self._epoch = 0
        self._pool = None

    def _shard_info(self):
        if not self.process_shard:
            return 0, 1
        import jax

        return jax.process_index(), jax.process_count()

    def _process_pool(self):
        if self._pool is None:
            import multiprocessing
            from concurrent.futures import ProcessPoolExecutor

            # spawn: forking after the TPU backend initializes can deadlock
            self._pool = ProcessPoolExecutor(
                self.n_workers,
                mp_context=multiprocessing.get_context("spawn"),
                initializer=_worker_init,
                initargs=(self.dataset,),
            )
        return self._pool

    def __del__(self):
        if self._pool is not None:
            self._pool.shutdown(wait=False, cancel_futures=True)

    def __len__(self) -> int:
        n = len(self.dataset)
        _, world = self._shard_info()
        if world > 1:
            n = -(-n // world)  # ceil: wrap-padded equal shards
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(order)
        rank, world = self._shard_info()
        if world > 1:
            per_rank = -(-len(order) // world)
            order = np.resize(order, per_rank * world)[rank::world]
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self._epoch)  # deterministic augmentations
        self._epoch += 1
        batches = [
            order[i : i + self.batch_size] for i in range(0, len(order), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        epoch = self._epoch - 1  # value used for this iteration's rngs

        if self.n_workers <= 1 and not self.use_processes:
            for b in batches:
                yield collate([self.dataset[int(i)] for i in b])
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            # never block forever on a full queue: an abandoned consumer sets
            # stop and stops draining — re-check it while waiting
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                if self.use_processes:
                    pool = self._process_pool()
                    for b in batches:
                        if stop.is_set():
                            return
                        samples = list(pool.map(_worker_get, [(epoch, int(i)) for i in b]))
                        if not put_or_stop(collate(samples)):
                            return
                else:
                    from concurrent.futures import ThreadPoolExecutor

                    with ThreadPoolExecutor(self.n_workers) as pool:
                        for b in batches:
                            if stop.is_set():
                                return
                            samples = list(pool.map(lambda i: self.dataset[int(i)], b))
                            if not put_or_stop(collate(samples)):
                                return
            except Exception as e:  # surface worker errors to the consumer
                put_or_stop(e)
            finally:
                put_or_stop(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


class EMIDECDataset(SeededItemRNG):
    """EMIDEC delayed-enhancement MI dataset (reference segmentation/emidec/train.py:34-115).

    Layout: data_dir/pid/pid.nii.gz + pid_gt.nii.gz.
    """

    def __init__(
        self,
        data_dir: Union[str, Path],
        meta_df: pd.DataFrame,
        transform: Optional[Transform] = None,
    ) -> None:
        _check_meta(meta_df)
        self.data_dir = Path(data_dir)
        self.meta_df = meta_df.reset_index(drop=True)
        self.views = ["sax"]
        self.transform = transform

    def __len__(self) -> int:
        return len(self.meta_df)

    def __getitem__(self, idx: int) -> Sample:
        row = self.meta_df.iloc[idx]
        pid = str(row["pid"])
        pid_dir = self.data_dir / pid
        image, _ = load_nifti(pid_dir / f"{pid}.nii.gz")
        data: Sample = {
            "pid": pid,
            "sax_width": np.asarray(image.shape[0]),
            "sax_height": np.asarray(image.shape[1]),
            "n_slices": np.asarray(int(row["n_slices"])),
            "sax_image": image.astype(np.float32)[..., None],
        }
        gt_path = pid_dir / f"{pid}_gt.nii.gz"
        if gt_path.exists():
            label, _ = load_nifti(gt_path)
            data["sax_label"] = label.astype(np.int8)
        if self.transform:
            data = self.transform(data, self._item_rng(idx))
        return data


class MYOPS2020Dataset(SeededItemRNG):
    """MyoPS2020 multi-sequence dataset: bSSFP/LGE/T2 as 3 channels
    (reference segmentation/myops2020/train.py:34-120)."""

    def __init__(
        self,
        data_dir: Union[str, Path],
        meta_df: pd.DataFrame,
        transform: Optional[Transform] = None,
    ) -> None:
        _check_meta(meta_df)
        self.data_dir = Path(data_dir)
        self.meta_df = meta_df.reset_index(drop=True)
        self.views = ["sax"]
        self.transform = transform

    def __len__(self) -> int:
        return len(self.meta_df)

    def __getitem__(self, idx: int) -> Sample:
        row = self.meta_df.iloc[idx]
        pid = str(int(row["pid"]))
        pid_dir = self.data_dir / pid
        image_c0, _ = load_nifti(pid_dir / f"{pid}_c0.nii.gz")
        image_de, _ = load_nifti(pid_dir / f"{pid}_de.nii.gz")
        image_t2, _ = load_nifti(pid_dir / f"{pid}_t2.nii.gz")
        image = np.stack([image_c0, image_de, image_t2], axis=-1).astype(np.float32)
        data: Sample = {
            "pid": pid,
            "sax_width": np.asarray(image_c0.shape[0]),
            "sax_height": np.asarray(image_c0.shape[1]),
            "n_slices": np.asarray(int(row["n_slices"])),
            "sax_image": image,
        }
        gt_path = pid_dir / f"{pid}_gt.nii.gz"
        if gt_path.exists():
            label, _ = load_nifti(gt_path)
            data["sax_label"] = label.astype(np.int8)
        if self.transform:
            data = self.transform(data, self._item_rng(idx))
        return data


class KaggleVideoDataset(SeededItemRNG):
    """Kaggle cine video dataset for label-free EF eval
    (reference segmentation/kaggle/dataset.py:24-115).

    Yields the full video as (t, x, y[, z], 1) channels-last, zero-padded to
    ``max_n_frames``.
    """

    def __init__(
        self,
        data_dir: Union[str, Path],
        meta_df: pd.DataFrame,
        view: str,
        max_n_frames: int,
        transform: Optional[Transform] = None,
    ) -> None:
        if view not in {"sax", "lax_2c", "lax_4c"}:
            raise ValueError(f"Invalid view {view}.")
        self.data_dir = Path(data_dir)
        self.meta_df = meta_df.reset_index(drop=True)
        self.view = view
        self.max_n_frames = max_n_frames
        self.transform = transform

    def __len__(self) -> int:
        return len(self.meta_df)

    def __getitem__(self, idx: int) -> Sample:
        row = self.meta_df.iloc[idx]
        pid = str(int(row["pid"]))
        pid_dir = self.data_dir / pid
        video, _ = load_nifti(pid_dir / f"{pid}_{self.view}_t.nii.gz")  # (x, y, z, t)
        video = np.moveaxis(video, -1, 0)  # (t, x, y, z)
        if self.view != "sax":
            video = video[..., 0]
        video = video[: self.max_n_frames].astype(np.float32)
        edv = float(row["diastole_volume"])
        esv = float(row["systole_volume"])
        data: Sample = {
            "pid": pid,
            "n_slices": np.asarray(int(row["n_slices"])),
            "n_frames": np.asarray(int(row["n_frames"])),
            "edv": np.asarray(edv, np.float32),
            "esv": np.asarray(esv, np.float32),
            "ef": np.asarray((edv - esv) / edv * 100.0, np.float32),
        }
        if self.transform:
            tmp = {f"{self.view}_image": np.moveaxis(video, 0, -1)}  # spatial-first for transforms
            tmp = self.transform(tmp, self._item_rng(idx))
            video = np.moveaxis(tmp[f"{self.view}_image"], -1, 0)
        if video.shape[0] < self.max_n_frames:
            pad = np.zeros((self.max_n_frames - video.shape[0], *video.shape[1:]), video.dtype)
            video = np.concatenate([video, pad], axis=0)
        data[f"{self.view}_image"] = video[..., None]  # (t, x, y[, z], 1)
        return data


def device_prefetch(iterator, put_fn, depth: int = 2):
    """Keep ``depth`` batches in flight on the device.

    ``jax.device_put`` is asynchronous, so calling ``put_fn`` ahead of
    consumption overlaps host->HBM transfer with the running step —
    replacing the reference's synchronous per-step H2D copy
    (reference mae/pretrain.py:252) and torch's pin_memory prefetch.
    """
    from collections import deque

    buf = deque()
    for item in iterator:
        buf.append(put_fn(item))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
