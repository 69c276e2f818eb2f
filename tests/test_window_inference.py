"""Tests for sliding-window ops, inference, losses, and metrics."""

import pytest as _pytest

pytestmark = _pytest.mark.slow  # full-model tier; fast tier runs -m "not slow"

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cinema_tpu.inference import pad_to_multiple, sliding_window_forward
from cinema_tpu.losses import (
    classification_loss,
    cross_entropy,
    landmark_coordinate_loss,
    landmark_heatmap_loss,
    segmentation_loss,
    wing_loss,
)
from cinema_tpu.metrics import (
    classification_metrics,
    coefficient_of_variance,
    dice_score,
    ejection_fraction,
    get_ef_region,
    get_volumes,
    hausdorff_distance_95,
    heatmap_argmax,
    heatmap_soft_argmax,
    iou_score,
    segmentation_metrics,
)
from cinema_tpu.ops.window import aggregate_patches, crop_start, get_patch_grid, patch_grid_sample


def test_patch_grid_matches_reference_example():
    # image 10, patch 5, overlap 2 -> starts [0, 3, 5] (reference transform.py:36-42)
    grid = get_patch_grid((10,), (5,), (2,))
    np.testing.assert_array_equal(grid[:, 0], [0, 3, 5])


def test_patch_grid_2d_and_errors():
    grid = get_patch_grid((8, 6), (4, 6), (2, 3))
    assert grid.shape[1] == 2
    assert set(grid[:, 0]) == {0, 2, 4}
    assert set(grid[:, 1]) == {0}
    with pytest.raises(ValueError):
        get_patch_grid((4,), (5,), (1,))


def test_sample_aggregate_round_trip():
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.normal(size=(10, 8, 2)).astype(np.float32))
    grid = get_patch_grid((10, 8), (5, 4), (2, 2))
    patches = patch_grid_sample(image, grid, (5, 4))
    assert patches.shape == (len(grid), 5, 4, 2)
    # aggregating the extracted patches reproduces the image exactly
    back = aggregate_patches(patches, grid, (10, 8))
    np.testing.assert_allclose(np.asarray(back), np.asarray(image), atol=1e-6)


def test_crop_start():
    x = jnp.ones((4, 5, 6))
    out = crop_start(x, (2, 3, 4))
    assert out.shape == (2, 3, 4)
    with pytest.raises(ValueError):
        crop_start(x, (2, 3))


def test_sliding_window_forward_identity_model():
    """A model that returns its input lets us check exact aggregation."""

    def forward_fn(image_dict):
        return {v: img for v, img in image_dict.items()}

    rng = np.random.default_rng(1)
    image = jnp.asarray(rng.normal(size=(1, 12, 8, 3)).astype(np.float32))
    out = sliding_window_forward(forward_fn, {"sax": image}, {"sax": (8, 8)})
    assert out["sax"].shape == (1, 12, 8, 3)
    # softmax-average then log of an identity model == log(avg softmax(img))
    assert np.isfinite(np.asarray(out["sax"])).all()
    # argmax is preserved where patches do not overlap disagreementfully
    np.testing.assert_array_equal(
        np.argmax(np.asarray(out["sax"][0, :4]), axis=-1),
        np.argmax(np.asarray(image[0, :4]), axis=-1),
    )


def test_sliding_window_no_patching_passthrough():
    calls = []

    def forward_fn(image_dict):
        calls.append(jax.tree_util.tree_map(lambda x: x.shape, image_dict))
        return {v: img * 2 for v, img in image_dict.items()}

    image = jnp.ones((1, 8, 8, 2))
    out = sliding_window_forward(forward_fn, {"sax": image}, {"sax": (8, 8)})
    np.testing.assert_array_equal(np.asarray(out["sax"]), 2 * np.asarray(image))
    assert len(calls) == 1


def test_sliding_window_multi_view_tiling():
    def forward_fn(image_dict):
        n = image_dict["sax"].shape[0]
        assert image_dict["lax"].shape[0] == n  # tiled
        return {v: img[..., :2] * 1.0 for v, img in image_dict.items()}

    sax = jnp.ones((1, 12, 8, 2))
    lax = jnp.ones((1, 8, 8, 2))
    out = sliding_window_forward(
        forward_fn, {"sax": sax, "lax": lax}, {"sax": (8, 8), "lax": (8, 8)}
    )
    assert out["sax"].shape == (1, 12, 8, 2)
    assert out["lax"].shape == (1, 8, 8, 2)


def test_sliding_window_errors():
    fn = lambda d: d  # noqa: E731
    with pytest.raises(ValueError, match="smaller"):
        sliding_window_forward(fn, {"a": jnp.ones((1, 4, 4, 1))}, {"a": (8, 8)})
    with pytest.raises(ValueError, match="one view"):
        sliding_window_forward(
            fn,
            {"a": jnp.ones((1, 12, 8, 1)), "b": jnp.ones((1, 12, 8, 1))},
            {"a": (8, 8), "b": (8, 8)},
        )
    # batch > 1 with patching is supported: frames fold into the patch batch
    out = sliding_window_forward(
        lambda d: {"a": d["a"]}, {"a": jnp.ones((2, 12, 8, 1))}, {"a": (8, 8)}
    )
    assert out["a"].shape == (2, 12, 8, 1)


def test_sliding_window_sigmoid_aggregation():
    def forward_fn(image_dict):
        return dict(image_dict)

    rng = np.random.default_rng(2)
    image = jnp.asarray(rng.normal(size=(1, 12, 8, 3)).astype(np.float32))
    out = sliding_window_forward(forward_fn, {"a": image}, {"a": (8, 8)}, aggregation="sigmoid")
    # in non-overlapping regions, logit(sigmoid(x)) == x
    np.testing.assert_allclose(np.asarray(out["a"][0, :4]), np.asarray(image[0, :4]), atol=1e-4)


def test_pad_to_multiple():
    img = np.ones((10, 7, 2), np.float32)
    padded, orig = pad_to_multiple(img, (8, 8))
    assert padded.shape == (16, 8, 2)
    assert orig == (10, 7)


@pytest.mark.parametrize("n_frames", [3, 8, 11, 50])
def test_video_forward_chunking(n_frames):
    """video_forward pads any frame count to the chunk size — including
    videos shorter than the pad amount (wrap-indexing, n < n_pad)."""
    from cinema_tpu.inference import video_forward

    video = jnp.asarray(
        np.random.default_rng(0).normal(size=(n_frames, 4, 4, 1)), jnp.float32
    )
    out = video_forward(lambda x: x * 2.0 + 1.0, video, chunk=8)
    assert out.shape == video.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(video) * 2.0 + 1.0, atol=1e-6)


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 4, 5)).astype(np.float32)  # (batch, pos, classes)
    labels = rng.integers(0, 5, size=(2, 4))
    labels[0, 0] = -1
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels), ignore_index=-1))
    want = torch.nn.functional.cross_entropy(
        torch.from_numpy(np.moveaxis(logits, -1, 1)), torch.from_numpy(labels), ignore_index=-1
    ).item()
    assert got == pytest.approx(want, rel=1e-5)
    # label smoothing parity
    labels2 = rng.integers(0, 5, size=(2, 4))
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels2), label_smoothing=0.1))
    want = torch.nn.functional.cross_entropy(
        torch.from_numpy(np.moveaxis(logits, -1, 1)), torch.from_numpy(labels2), label_smoothing=0.1
    ).item()
    assert got == pytest.approx(want, rel=1e-5)


def test_segmentation_loss_perfect_prediction():
    labels = jnp.asarray(np.random.default_rng(0).integers(0, 3, size=(2, 8, 8)))
    logits = jax.nn.one_hot(labels, 3) * 100.0
    loss, metrics = segmentation_loss(logits, labels)
    assert float(metrics["cross_entropy"]) < 1e-3
    assert float(metrics["mean_dice_loss"]) < 1e-3


def test_wing_loss_values():
    # below w: w*log(1+err/eps); above: err - c
    w, eps = 10.0, 2.0
    c = w - w * np.log(1 + w / eps)
    assert float(wing_loss(jnp.array([0.0]), jnp.array([0.0]))) == 0.0
    assert float(wing_loss(jnp.array([4.0]), jnp.array([0.0]))) == pytest.approx(
        w * np.log(1 + 4 / eps), rel=1e-5
    )
    assert float(wing_loss(jnp.array([50.0]), jnp.array([0.0]))) == pytest.approx(50 - c, rel=1e-5)


def test_landmark_losses_finite():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    labels = jnp.asarray(rng.uniform(size=(2, 16, 16, 3)).astype(np.float32))
    loss, m = landmark_heatmap_loss(logits, labels)
    assert np.isfinite(float(loss))
    # BCE parity vs torch
    want = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(np.asarray(logits)), torch.from_numpy(np.asarray(labels))
    ).item()
    assert float(m["bce_loss"]) == pytest.approx(want, rel=1e-5)

    coords = jnp.asarray(rng.normal(size=(2, 6)).astype(np.float32) * 50)
    loss, m = landmark_coordinate_loss(coords, coords + 1.0)
    assert np.isfinite(float(loss))


def test_dice_iou_volumes():
    labels = np.zeros((1, 4, 4), np.int32)
    labels[0, :2] = 1
    pred = labels.copy()
    pred[0, 0, 0] = 0  # one voxel wrong
    t = jax.nn.one_hot(jnp.asarray(labels), 2)
    p = jax.nn.one_hot(jnp.asarray(pred), 2)
    dice = dice_score(p, t)
    assert float(dice[0, 1]) == pytest.approx(2 * 7 / (7 + 8))
    iou = iou_score(p, t)
    assert float(iou[0, 1]) == pytest.approx(7 / 8)
    vols = get_volumes(t, (1.0, 1.0))
    assert float(vols[0, 1]) == pytest.approx(8 / 1000)


def test_hausdorff_95():
    a = np.zeros((1, 16, 16, 2), bool)
    b = np.zeros((1, 16, 16, 2), bool)
    a[0, 4:8, 4:8, 1] = True
    b[0, 4:8, 4:8, 1] = True
    np.testing.assert_allclose(hausdorff_distance_95(a, b, (1.0, 1.0)), [[0.0]])
    # shifted square: distance 2
    c = np.zeros_like(b)
    c[0, 6:10, 4:8, 1] = True
    hd = hausdorff_distance_95(a, c, (1.0, 1.0))
    assert 1.0 <= hd[0, 0] <= 2.5
    # empty mask -> nan
    empty = np.zeros_like(b)
    assert np.isnan(hausdorff_distance_95(a, empty, (1.0, 1.0))[0, 0])
    # spacing scales distances
    hd2 = hausdorff_distance_95(a, c, (2.0, 2.0))
    assert hd2[0, 0] == pytest.approx(2 * hd[0, 0])


def test_segmentation_metrics_suite():
    rng = np.random.default_rng(0)
    labels = jnp.asarray(rng.integers(0, 4, size=(2, 16, 16, 4)))
    logits = jax.nn.one_hot(labels, 4) * 10.0 + jnp.asarray(
        rng.normal(size=(2, 16, 16, 4, 4)).astype(np.float32)
    )
    m = segmentation_metrics(logits, labels, (1.0, 1.0, 10.0))
    assert m["mean_dice_score"].shape == (2,)
    assert m["mean_dice_score"].min() > 0.9
    assert "class_3_hausdorff_distance_95" in m
    assert np.isfinite(m["class_1_true_volume"]).all()


def test_heatmap_argmax_round_trip():
    """Synthetic gaussian circles recover their centers (reference test pattern)."""
    w = h = 32
    centers = np.array([[5, 7], [20, 12], [28, 25]])
    xs, ys = np.meshgrid(np.arange(w), np.arange(h), indexing="ij")
    maps = [np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * 9.0)) for cx, cy in centers]
    heatmap = jnp.asarray(np.stack(maps, axis=-1)[None].astype(np.float32))
    coords = np.asarray(heatmap_argmax(heatmap))
    np.testing.assert_array_equal(coords[0], centers.reshape(-1))
    soft = np.asarray(heatmap_soft_argmax(heatmap, beta=1000.0))
    np.testing.assert_allclose(soft[0], centers.reshape(-1), atol=1)


def test_classification_metrics_binary_and_multi():
    true = np.array([0, 1, 1, 0, 1])
    pred = np.array([0, 1, 0, 0, 1])
    probs = np.array([[0.9, 0.1], [0.2, 0.8], [0.6, 0.4], [0.7, 0.3], [0.1, 0.9]])
    m = classification_metrics(true, pred, probs)
    assert m["accuracy"] == pytest.approx(0.8)
    assert 0 <= m["roc_auc"] <= 1
    assert "specificity" in m and "sensitivity" in m

    true3 = np.array([0, 1, 2, 1])
    pred3 = np.array([0, 1, 2, 2])
    probs3 = np.array(
        [[0.8, 0.1, 0.1], [0.1, 0.8, 0.1], [0.1, 0.1, 0.8], [0.2, 0.3, 0.5]]
    )
    m3 = classification_metrics(true3, pred3, probs3)
    assert m3["accuracy"] == pytest.approx(0.75)
    assert "roc_auc" in m3 and "specificity" not in m3


def test_ef_helpers():
    assert float(ejection_fraction(100.0, 40.0)) == pytest.approx(60.0)
    assert get_ef_region(35) == 0
    assert get_ef_region(50) == 1
    assert get_ef_region(65) == 2
    cv = coefficient_of_variance(np.array([100.0, 50.0]), np.array([100.0, 50.0]))
    assert cv == 0.0


def test_classification_loss_smoothing():
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32))
    labels = jnp.asarray([0, 1, 2, 1])
    loss, _ = classification_loss(logits, labels)
    want = torch.nn.functional.cross_entropy(
        torch.from_numpy(np.asarray(logits)), torch.from_numpy(np.asarray(labels)).long(),
        label_smoothing=0.1,
    ).item()
    assert float(loss) == pytest.approx(want, rel=1e-5)


def test_eval_z_bucketing_shares_shapes_and_matches():
    """z-bucketed eval must produce near-identical metrics and feed the
    forward identical padded shapes for nearby slice counts."""
    import numpy as np

    from cinema_tpu.tasks.segmentation import segmentation_eval_batch

    rng = np.random.default_rng(0)
    seen_shapes = []

    def fake_forward(params, image_dict):
        img = image_dict["sax"]
        seen_shapes.append(tuple(img.shape))
        return {"sax": jnp.concatenate([img, -img], axis=-1)}  # 2-class logits

    def make_batch(z):
        img = rng.random((1, 16, 16, z, 1)).astype(np.float32)
        return {
            "sax_image": img,
            "sax_label": (img[..., 0] > 0.5).astype(np.int8),
            "sax_width": np.asarray([16]),
            "sax_height": np.asarray([16]),
            "n_slices": np.asarray([z]),
        }

    patch = {"sax": (16, 16, 4)}
    spacing = {"sax": (1.0, 1.0, 10.0)}
    from cinema_tpu.metrics import segmentation_metrics

    b5, b6 = make_batch(5), make_batch(6)
    _, m5 = segmentation_eval_batch(fake_forward, None, b5, patch, spacing, segmentation_metrics, z_bucket=4)
    shapes_b5 = list(seen_shapes)
    seen_shapes.clear()
    _, m6 = segmentation_eval_batch(fake_forward, None, b6, patch, spacing, segmentation_metrics, z_bucket=4)
    # both bucket to z=8 -> identical patch-stack shapes -> one compilation
    assert shapes_b5 == seen_shapes

    # unbucketed metrics must be close (boundary-averaging drift only)
    _, m5_exact = segmentation_eval_batch(fake_forward, None, b5, patch, spacing, segmentation_metrics)
    for k in m5:
        if "hausdorff" in k:
            continue
        np.testing.assert_allclose(m5[k], m5_exact[k], atol=0.05, err_msg=k)


# --------------------------------------------------- serial-loop parity
def _reference_serial_window(forward_fn, image_dict, patch_size_dict, aggregation):
    """The reference's EXACT inference semantics, transcribed: serial
    batch-1 patch loop (segmentation/train.py:204-210), numpy scatter-add
    sum + count then divide (transform.py:86-124), prob-space average for
    non-patched views, log / logit restore."""
    views = list(image_dict.keys())
    need_patch = {
        v: tuple(image_dict[v].shape[1:-1]) != tuple(patch_size_dict[v]) for v in views
    }
    view_to_patch = next(v for v, n in need_patch.items() if n)
    image = np.asarray(image_dict[view_to_patch])  # (B, *spatial, ch)
    batch = image.shape[0]
    patch_size = tuple(patch_size_dict[view_to_patch])
    image_size = image.shape[1:-1]

    # reference get_patch_grid: overlap = patch // 2, tail-aligned
    axes = []
    for img_dim, p in zip(image_size, patch_size):
        step = p - p // 2
        idx = list(range(0, img_dim - p + 1, step))
        if idx[-1] != img_dim - p:
            idx.append(img_dim - p)
        axes.append(idx)
    import itertools

    grid = list(itertools.product(*axes))

    def to_probs(x):
        x = np.asarray(x, np.float64)
        if aggregation == "softmax":
            e = np.exp(x - x.max(axis=-1, keepdims=True))
            return e / e.sum(axis=-1, keepdims=True)
        return 1.0 / (1.0 + np.exp(-x))

    outs = []
    for b in range(batch):
        acc = None
        count = np.zeros(image_size)
        other_probs = {}
        for start in grid:
            sl = tuple(slice(s, s + p) for s, p in zip(start, patch_size))
            patch_dict = {
                v: jnp.asarray(image[b][sl][None])
                if v == view_to_patch
                else image_dict[v][b : b + 1]
                for v in views
            }
            logits = forward_fn(patch_dict)
            probs = to_probs(logits[view_to_patch][0])
            if acc is None:
                acc = np.zeros((*image_size, probs.shape[-1]))
            acc[sl] += probs
            count[sl] += 1.0
            for v in views:
                if v != view_to_patch:
                    other_probs.setdefault(v, []).append(to_probs(logits[v][0]))
        avg = acc / count[..., None]
        row = {}
        if aggregation == "softmax":
            restore = np.log
        else:
            restore = lambda p: np.log(np.clip(p, 1e-7, 1 - 1e-7)) - np.log1p(
                -np.clip(p, 1e-7, 1 - 1e-7)
            )
        row[view_to_patch] = restore(avg)
        for v, plist in other_probs.items():
            row[v] = restore(np.mean(plist, axis=0))
        outs.append(row)
    return {
        v: np.stack([o[v] for o in outs]) for v in outs[0]
    }


@pytest.mark.parametrize("aggregation", ["softmax", "sigmoid"])
def test_sliding_window_matches_reference_serial_loop(aggregation):
    """Off-size study (z overflows the patch) through a REAL tiny ConvUNetR:
    our one-batched-forward path must reproduce the reference's serial
    per-patch loop exactly (softmax-average + log / sigmoid + logit
    restore), including a multi-frame batch."""
    from cinema_tpu.models.convunetr import ConvUNetR

    model = ConvUNetR(
        image_size_dict={"sax": (16, 16, 4)},
        in_chans_dict={"sax": 1},
        out_chans=3,
        enc_patch_size_dict={"sax": (4, 4, 1)},
        enc_scale_factor_dict={"sax": (2, 2, 1)},
        enc_conv_chans=(4, 8),
        enc_conv_n_blocks=1,
        enc_embed_dim=16,
        enc_depth=1,
        enc_n_heads=2,
        dec_chans=(4, 8, 12, 16),
        dec_patch_size_dict={"sax": (4, 4, 1)},
        dec_scale_factor_dict={"sax": (2, 2, 1)},
    )
    rng = np.random.default_rng(0)
    # z=10 > patch z=4 -> z starts [0, 2, 4, 6]; two frames in the batch
    images = {"sax": jnp.asarray(rng.normal(size=(2, 16, 16, 10, 1)), jnp.float32)}
    params = model.init(jax.random.PRNGKey(0), {"sax": images["sax"][:, :, :, :4]})
    forward = lambda d: model.apply(params, d)

    got = sliding_window_forward(forward, images, {"sax": (16, 16, 4)}, aggregation)
    want = _reference_serial_window(forward, images, {"sax": (16, 16, 4)}, aggregation)
    np.testing.assert_allclose(
        np.asarray(got["sax"]), want["sax"], atol=1e-4, rtol=1e-4
    )


def test_patch_grid_overlap_validation():
    with pytest.raises(ValueError, match="overlap"):
        get_patch_grid((10,), (5,), (5,))
    with pytest.raises(ValueError, match="overlap"):
        get_patch_grid((10,), (5,), (6,))
