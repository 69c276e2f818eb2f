"""Host-side data augmentation (re-implements the MONAI subset the reference
uses: cinema/segmentation/dataset.py:140-220, mae/pretrain.py:157-200).

Conventions:
- arrays are channels-LAST numpy: image (x, y[, z], ch), label (x, y[, z]);
- every transform is a callable ``(data: dict, rng) -> dict`` taking an
  explicit np.random.Generator — fully deterministic pipelines;
- geometric transforms applied to an ``*_image`` key are applied with the
  same sampled parameters to the matching ``*_label`` key (bilinear vs
  nearest), mirroring MONAI dict-transforms with shared randomness.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple, Union

import numpy as np
from scipy import ndimage

Data = Dict[str, np.ndarray]
Keys = Union[str, Sequence[str]]


def _as_keys(keys: Keys) -> Tuple[str, ...]:
    return (keys,) if isinstance(keys, str) else tuple(keys)


class Compose:
    """Apply transforms in order with a single RNG."""

    def __init__(self, transforms: Sequence) -> None:
        self.transforms = list(transforms)

    def __call__(self, data: Data, rng: np.random.Generator) -> Data:
        for t in self.transforms:
            data = t(data, rng)
        return data


class ScaleIntensityd:
    """Min-max rescale to [0, 1] (MONAI ScaleIntensityd defaults)."""

    def __init__(self, keys: Keys) -> None:
        self.keys = _as_keys(keys)

    def __call__(self, data: Data, rng: np.random.Generator) -> Data:
        for key in self.keys:
            if key not in data:
                continue
            x = data[key].astype(np.float32)
            lo, hi = x.min(), x.max()
            data[key] = (x - lo) / (hi - lo) if hi > lo else np.zeros_like(x)
        return data


class SpatialPadd:
    """End-pad spatial dims to at least ``spatial_size`` (MONAI method='end').

    Channels-last images pad spatial axes only; label arrays (no channel
    axis) pad all axes.
    """

    def __init__(self, keys: Keys, spatial_size: Sequence[int], has_channel: Optional[Dict[str, bool]] = None) -> None:
        self.keys = _as_keys(keys)
        self.spatial_size = tuple(spatial_size)
        self.has_channel = has_channel or {}

    def _spatial_rank(self, key: str, x: np.ndarray) -> bool:
        if key in self.has_channel:
            return self.has_channel[key]
        return x.ndim == len(self.spatial_size) + 1

    def __call__(self, data: Data, rng: np.random.Generator) -> Data:
        for key in self.keys:
            if key not in data:
                continue
            x = data[key]
            channel = self._spatial_rank(key, x)
            spatial = x.shape[:-1] if channel else x.shape
            pads = [(0, max(0, t - s)) for s, t in zip(spatial, self.spatial_size)]
            if channel:
                pads.append((0, 0))
            data[key] = np.pad(x, pads)
        return data


class RandAdjustContrastd:
    """Random gamma adjustment (MONAI RandAdjustContrastd semantics)."""

    def __init__(self, keys: Keys, prob: float, gamma: Tuple[float, float]) -> None:
        self.keys = _as_keys(keys)
        self.prob = prob
        self.gamma = tuple(gamma)

    def __call__(self, data: Data, rng: np.random.Generator) -> Data:
        if rng.uniform() >= self.prob:
            return data
        gamma = rng.uniform(self.gamma[0], self.gamma[1])
        for key in self.keys:
            if key not in data:
                continue
            x = data[key].astype(np.float32)
            lo = x.min()
            rng_ = x.max() - lo
            eps = 1e-7
            data[key] = ((x - lo) / (rng_ + eps)) ** gamma * (rng_ + eps) + lo
        return data


class RandGaussianNoised:
    """Additive gaussian noise (MONAI RandGaussianNoised, std default 0.1)."""

    def __init__(self, keys: Keys, prob: float, mean: float = 0.0, std: float = 0.1) -> None:
        self.keys = _as_keys(keys)
        self.prob = prob
        self.mean = mean
        self.std = std

    def __call__(self, data: Data, rng: np.random.Generator) -> Data:
        if rng.uniform() >= self.prob:
            return data
        for key in self.keys:
            if key not in data:
                continue
            x = data[key].astype(np.float32)
            data[key] = x + rng.normal(self.mean, self.std, size=x.shape).astype(np.float32)
        return data


def _rotation_matrix(nd: int, angles: Sequence[float]) -> np.ndarray:
    """Rotation matrix for 2D (1 angle) or 3D (3 angles, xyz order)."""
    if nd == 2:
        c, s = math.cos(angles[0]), math.sin(angles[0])
        return np.array([[c, -s], [s, c]])
    rx, ry, rz = (angles + [0.0, 0.0, 0.0])[:3]
    cx, sx = math.cos(rx), math.sin(rx)
    cy, sy = math.cos(ry), math.sin(ry)
    cz, sz = math.cos(rz), math.sin(rz)
    mx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    my = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    mz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return mx @ my @ mz


class RandAffined:
    """Random rotate/translate/scale about the image center, zero padding.

    Applies identical sampled parameters to image (linear interp) and label
    (nearest) keys, like MONAI RandAffined with mode=('bilinear','nearest').
    """

    def __init__(
        self,
        image_keys: Keys,
        label_keys: Keys = (),
        prob: float = 0.5,
        rotate_range: Sequence[float] = (),
        translate_range: Sequence[float] = (),
        scale_range: float = 0.0,
    ) -> None:
        self.image_keys = _as_keys(image_keys)
        self.label_keys = _as_keys(label_keys) if label_keys else ()
        self.prob = prob
        self.rotate_range = [r / 180.0 * math.pi for r in rotate_range]
        self.translate_range = list(translate_range)
        self.scale_range = scale_range

    def _apply(self, x: np.ndarray, matrix: np.ndarray, offset: np.ndarray, order: int) -> np.ndarray:
        if x.ndim == matrix.shape[0] + 1:  # channels-last
            out = np.stack(
                [
                    ndimage.affine_transform(
                        x[..., c], matrix, offset=offset, order=order, mode="constant", cval=0.0
                    )
                    for c in range(x.shape[-1])
                ],
                axis=-1,
            )
            return out.astype(x.dtype)
        return ndimage.affine_transform(
            x, matrix, offset=offset, order=order, mode="constant", cval=0.0
        ).astype(x.dtype)

    def __call__(self, data: Data, rng: np.random.Generator) -> Data:
        if rng.uniform() >= self.prob:
            return data
        ref_key = next((k for k in self.image_keys if k in data), None)
        if ref_key is None:
            return data
        x = data[ref_key]
        nd = len(self.translate_range) if self.translate_range else (x.ndim - 1)
        spatial = np.array(x.shape[:nd], dtype=np.float64)

        angles = [rng.uniform(-r, r) for r in self.rotate_range]
        translation = np.array(
            [rng.uniform(-t, t) for t in self.translate_range]
            if self.translate_range
            else [0.0] * nd
        )
        scale = 1.0 + rng.uniform(-self.scale_range, self.scale_range) if self.scale_range else 1.0

        rot = _rotation_matrix(nd, angles) if angles else np.eye(nd)
        matrix = rot * scale
        # output coord o maps to input coord: matrix @ (o - c) + c - t
        center = (spatial - 1) / 2.0
        offset = center - matrix @ center - translation

        for key in self.image_keys:
            if key in data:
                data[key] = self._apply(data[key].astype(np.float32), matrix, offset, order=1)
        for key in self.label_keys:
            if key in data:
                data[key] = self._apply(data[key], matrix, offset, order=0)
        return data


class RandCoarseDropoutd:
    """Zero out random rectangular holes (MONAI RandCoarseDropoutd)."""

    def __init__(self, keys: Keys, prob: float, spatial_size: Sequence[int], holes: int = 1, fill_value: float = 0.0) -> None:
        self.keys = _as_keys(keys)
        self.prob = prob
        self.spatial_size = tuple(spatial_size)
        self.holes = holes
        self.fill_value = fill_value

    def __call__(self, data: Data, rng: np.random.Generator) -> Data:
        if rng.uniform() >= self.prob:
            return data
        ref_key = next((k for k in self.keys if k in data), None)
        if ref_key is None:
            return data
        nd = len(self.spatial_size)
        spatial = data[ref_key].shape[:nd]
        for _ in range(self.holes):
            starts = [
                int(rng.integers(0, max(1, s - h + 1))) for s, h in zip(spatial, self.spatial_size)
            ]
            slices = tuple(slice(st, st + h) for st, h in zip(starts, self.spatial_size))
            for key in self.keys:
                if key in data:
                    data[key] = data[key].copy()
                    data[key][slices] = self.fill_value
        return data


class RandSpatialCropd:
    """Random fixed-size crop (MONAI RandSpatialCropd, random_size=False)."""

    def __init__(self, keys: Keys, roi_size: Sequence[int], has_channel: Optional[Dict[str, bool]] = None) -> None:
        self.keys = _as_keys(keys)
        self.roi_size = tuple(roi_size)
        self.has_channel = has_channel or {}

    def __call__(self, data: Data, rng: np.random.Generator) -> Data:
        ref_key = next((k for k in self.keys if k in data), None)
        if ref_key is None:
            return data
        x = data[ref_key]
        channel = self.has_channel.get(ref_key, x.ndim == len(self.roi_size) + 1)
        spatial = x.shape[:-1] if channel else x.shape
        starts = [
            int(rng.integers(0, s - r + 1)) if s > r else 0 for s, r in zip(spatial, self.roi_size)
        ]
        slices = tuple(slice(st, st + min(r, s)) for st, r, s in zip(starts, self.roi_size, spatial))
        for key in self.keys:
            if key not in data:
                continue
            y = data[key]
            ch = self.has_channel.get(key, y.ndim == len(self.roi_size) + 1)
            data[key] = y[slices + (slice(None),)] if ch else y[slices]
        return data


class RandZoomd:
    """Random zoom keeping the original size (MONAI RandZoomd keep_size=True)."""

    def __init__(
        self,
        keys: Keys,
        prob: float,
        min_zoom: float = 0.9,
        max_zoom: float = 1.1,
        order: int = 1,
    ) -> None:
        self.keys = _as_keys(keys)
        self.prob = prob
        self.min_zoom = min_zoom
        self.max_zoom = max_zoom
        self.order = order

    def __call__(self, data: Data, rng: np.random.Generator) -> Data:
        if rng.uniform() >= self.prob:
            return data
        zoom = rng.uniform(self.min_zoom, self.max_zoom)
        for key in self.keys:
            if key not in data:
                continue
            x = data[key].astype(np.float32)
            nd = x.ndim - 1  # channels-last
            zoomed = np.stack(
                [ndimage.zoom(x[..., c], zoom, order=self.order) for c in range(x.shape[-1])],
                axis=-1,
            )
            out = np.zeros_like(x)
            # center crop or pad back to original size
            src_slices, dst_slices = [], []
            for s, z in zip(x.shape[:nd], zoomed.shape[:nd]):
                if z >= s:
                    start = (z - s) // 2
                    src_slices.append(slice(start, start + s))
                    dst_slices.append(slice(0, s))
                else:
                    start = (s - z) // 2
                    src_slices.append(slice(0, z))
                    dst_slices.append(slice(start, start + z))
            out[tuple(dst_slices) + (slice(None),)] = zoomed[tuple(src_slices) + (slice(None),)]
            data[key] = out
        return data


def get_segmentation_transforms(config) -> Tuple[Compose, Compose]:
    """Train/val pipelines mirroring the reference
    (segmentation/dataset.py:140-220)."""
    views = config.model.views
    views = [views] if isinstance(views, str) else list(views)

    def view_cfg(section, v):
        return section.sax if v == "sax" else section.lax

    train, val = [], []
    for view in views:
        patch_size = tuple(view_cfg(config.data, view).patch_size)
        tcfg = view_cfg(config.transform, view)
        train += [
            RandAdjustContrastd(f"{view}_image", config.transform.prob, tuple(config.transform.gamma)),
            # NOTE: noise (std 0.1) BEFORE min-max scaling is the reference's
            # order (segmentation/dataset.py:170-172); on uint8-scale inputs
            # it is a near-no-op, kept as-is for augmentation parity
            RandGaussianNoised(f"{view}_image", config.transform.prob),
            ScaleIntensityd(f"{view}_image"),
            RandAffined(
                image_keys=f"{view}_image",
                label_keys=f"{view}_label",
                prob=config.transform.prob,
                rotate_range=list(tcfg.rotate_range),
                translate_range=list(tcfg.translate_range),
                scale_range=config.transform.scale_range,
            ),
        ]
        if tcfg.get("dropout_size"):
            train.append(
                RandCoarseDropoutd(
                    f"{view}_image", config.transform.prob, tuple(tcfg.dropout_size)
                )
            )
        train += [
            RandSpatialCropd((f"{view}_image", f"{view}_label"), patch_size),
            SpatialPadd((f"{view}_image", f"{view}_label"), patch_size),
        ]
        val += [
            ScaleIntensityd(f"{view}_image"),
            SpatialPadd((f"{view}_image", f"{view}_label"), patch_size),
        ]
    return Compose(train), Compose(val)


def get_pretrain_transforms(config) -> Compose:
    """MAE pretrain pipeline (reference mae/pretrain.py:157-200)."""
    scale = config.transform.scale_range
    return Compose(
        [
            RandZoomd("sax", config.transform.prob, 1 - scale, 1 + scale),
            RandZoomd(("lax_2c", "lax_3c", "lax_4c"), config.transform.prob, 1 - scale, 1 + scale),
            ScaleIntensityd(("sax", "lax_2c", "lax_3c", "lax_4c")),
            SpatialPadd("sax", tuple(config.data.sax.patch_size)),
            SpatialPadd(("lax_2c", "lax_3c", "lax_4c"), tuple(config.data.lax.patch_size)),
        ]
    )
