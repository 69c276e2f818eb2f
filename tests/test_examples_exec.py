"""Execution tests for every inference example script.

Each example's ``main()`` runs end-to-end on CPU against a tiny synthetic
checkpoint (built + exported through the torch-layout safetensors bridge,
exactly the format ``from_finetuned`` consumes) and synthetic NIfTI/PNG
inputs, asserting the expected artifacts. The reference's examples are its
de-facto user API (reference cinema/examples/inference/*); round 3 only
import-smoke-tested ours.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model tier; fast tier runs -m "not slow"

from cinema_tpu.config import apply_overrides, load_config, save_config
from cinema_tpu.data.nifti import save_nifti
from cinema_tpu.factory import (
    get_convunetr_model,
    get_convvit_model,
    get_mae_model,
    init_params,
)
from cinema_tpu.train.checkpoint import save_params_safetensors

REPO = Path(__file__).parent.parent
CONFIGS = REPO / "cinema_tpu" / "configs"
EXAMPLES = REPO / "examples" / "inference"

_CONVUNETR_TINY = [
    "model.convunetr.size=tiny",
    "model.convunetr.enc_conv_chans=[4,8]",
    "model.convunetr.enc_conv_n_blocks=1",
    "model.convunetr.dec_chans=[4,8,12,16,24]",
    "model.convunetr.dropout=0.0",
    "model.convunetr.drop_path=0.0",
]
_CONVVIT_TINY = [
    "model.convvit.size=tiny",
    "model.convvit.enc_conv_chans=[4,8]",
    "model.convvit.enc_conv_n_blocks=1",
    "model.convvit.drop_path=0.0",
]


CKPT_CACHE = Path(__file__).parent / "fixtures" / "example_ckpts"


def _cached_ckpt(config, model, name: str):
    """Persistent tiny-checkpoint cache (round-4 Weak #6: building 7 jitted
    inits per module fixture cost ~7 min of the slow tier on a 1-core host).

    Keyed on the abstract param tree (shapes/dtypes/paths) AND the rendered
    config, so any model or config change — including shape-preserving
    edits to fields the example scripts consume — regenerates the entry;
    entries live in tests/fixtures/ and are committed, making first runs
    fast too."""
    import hashlib
    import shutil

    import jax
    import yaml

    abstract = jax.eval_shape(lambda: init_params(model))
    tree_repr = str(
        jax.tree_util.tree_map(lambda x: (tuple(x.shape), str(x.dtype)), abstract)
    )
    cfg_repr = yaml.safe_dump(config.to_dict(), sort_keys=True)
    digest = hashlib.sha256((tree_repr + cfg_repr).encode()).hexdigest()[:12]
    cache = CKPT_CACHE / f"{name}-{digest}"
    st, yaml = cache / f"{name}.safetensors", cache / f"{name}.yaml"
    if not (st.exists() and yaml.exists()):
        for stale in CKPT_CACHE.glob(f"{name}-*"):
            shutil.rmtree(stale, ignore_errors=True)
        cache.mkdir(parents=True, exist_ok=True)
        save_params_safetensors(init_params(model), st)
        save_config(config, yaml)
    return st, yaml


def _run_example(script: str, argv: list[str], capsys=None) -> str:
    """Import the example module and run its main() with the given argv."""
    spec = importlib.util.spec_from_file_location(f"example_{script}", EXAMPLES / f"{script}.py")
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    old_argv = sys.argv
    sys.argv = [script] + [str(a) for a in argv]
    try:
        module.main()
    finally:
        sys.argv = old_argv
    return capsys.readouterr().out if capsys is not None else ""


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    """Tiny checkpoints + synthetic inputs shared by all example tests."""
    root = tmp_path_factory.mktemp("examples")
    rng = np.random.default_rng(0)
    fx = {"root": root}

    # --- inputs -----------------------------------------------------------
    sax_t = rng.uniform(0, 255, size=(12, 12, 3, 3)).astype(np.float32)
    save_nifti(root / "sax_t.nii.gz", sax_t, spacing=(1, 1, 10, 1))
    lax_t = rng.uniform(0, 255, size=(12, 12, 1, 3)).astype(np.float32)
    save_nifti(root / "lax_4c_t.nii.gz", lax_t, spacing=(1, 1, 10, 1))
    save_nifti(root / "ed.nii.gz", sax_t[..., 0], spacing=(1, 1, 10))
    save_nifti(root / "es.nii.gz", sax_t[..., 1], spacing=(1, 1, 10))

    from PIL import Image

    png = rng.integers(0, 255, size=(14, 14), dtype=np.uint8)
    Image.fromarray(png, mode="L").save(root / "landmark.png")

    study = root / "study00"
    study.mkdir()
    save_nifti(study / "study00_sax_t.nii.gz", sax_t[..., :2], spacing=(1, 1, 10, 1))
    save_nifti(study / "study00_lax_2c_t.nii.gz", lax_t[..., :2], spacing=(1, 1, 10, 1))

    # --- checkpoints --------------------------------------------------------
    def build(config_path, kind, name, overrides):
        cfg = apply_overrides(load_config(config_path), overrides)
        if kind == "convunetr":
            model = get_convunetr_model(cfg, remat=False)
        elif kind == "convvit":
            model = get_convvit_model(cfg, remat=False)
        else:
            model = get_mae_model(cfg, remat=False)
        fx[name] = _cached_ckpt(cfg, model, name)

    build(
        CONFIGS / "segmentation" / "acdc.yaml", "convunetr", "seg_sax",
        ["data.sax.patch_size=[16,16,4]", *_CONVUNETR_TINY],
    )
    build(
        CONFIGS / "segmentation" / "mnms2.yaml", "convunetr", "seg_lax",
        ["model.views=lax_4c", "data.lax.patch_size=[16,16]", *_CONVUNETR_TINY],
    )
    build(
        CONFIGS / "segmentation" / "landmark.yaml", "convunetr", "lmk_heat",
        ["data.lax.patch_size=[16,16]", *_CONVUNETR_TINY],
    )
    build(
        CONFIGS / "classification" / "acdc.yaml", "convvit", "clf",
        ["data.sax.patch_size=[16,16,4]", *_CONVVIT_TINY],
    )
    build(
        CONFIGS / "regression" / "acdc.yaml", "convvit", "reg",
        ["data.sax.patch_size=[16,16,4]", *_CONVVIT_TINY],
    )
    build(
        CONFIGS / "regression" / "landmark.yaml", "convvit", "lmk_coord",
        ["data.lax.patch_size=[16,16]", *_CONVVIT_TINY],
    )
    build(
        CONFIGS / "mae.yaml", "mae", "mae",
        [
            "model.size=tiny",
            "model.views=[sax,lax_2c]",
            "model.enc_conv_chans=[4,8]",
            "model.enc_conv_n_blocks=1",
            "data.sax.patch_size=[16,16,4]",
            # lax must give >1 ViT token so mask 0.75 keeps >= 1 visible
            "data.lax.patch_size=[32,32]",
            "grad_ckpt=false",
        ],
    )
    return fx


def test_segmentation_sax_executes(fixtures, capsys):
    model, config = fixtures["seg_sax"]
    out = fixtures["root"] / "out_seg_sax"
    text = _run_example(
        "segmentation_sax",
        ["--model", model, "--config", config, "--image", fixtures["root"] / "sax_t.nii.gz", "--out", out],
        capsys,
    )
    assert "LVEF" in text
    assert (out / "segmentation_sax_t.nii.gz").exists()
    assert (out / "ventricle_volumes.png").exists()
    # cine GIF parity (reference segmentation_sax.py:19-77): animated, one
    # GIF frame per cine frame
    from PIL import Image

    gif = Image.open(out / "segmentation_sax.gif")
    assert getattr(gif, "n_frames", 1) == 3


def test_segmentation_lax_4c_executes(fixtures, capsys):
    model, config = fixtures["seg_lax"]
    out = fixtures["root"] / "out_seg_lax"
    _run_example(
        "segmentation_lax_4c",
        ["--model", model, "--config", config, "--image", fixtures["root"] / "lax_4c_t.nii.gz", "--out", out],
        capsys,
    )
    assert (out / "segmentation_lax_4c_t.nii.gz").exists()
    assert (out / "lax_4c_areas.png").exists()
    from PIL import Image

    assert getattr(Image.open(out / "segmentation_lax_4c.gif"), "n_frames", 1) == 3


@pytest.mark.parametrize("script", ["classification_cvd", "classification_sex", "classification_vendor"])
def test_classification_examples_execute(fixtures, capsys, script):
    model, config = fixtures["clf"]
    text = _run_example(
        script,
        ["--model", model, "--config", config, "--ed", fixtures["root"] / "ed.nii.gz", "--es", fixtures["root"] / "es.nii.gz"],
        capsys,
    )
    assert "class probabilities" in text
    assert "predicted class index" in text


@pytest.mark.parametrize("script", ["regression_ef", "regression_bmi", "regression_age"])
def test_regression_examples_execute(fixtures, capsys, script):
    model, config = fixtures["reg"]
    text = _run_example(
        script,
        ["--model", model, "--config", config, "--ed", fixtures["root"] / "ed.nii.gz", "--es", fixtures["root"] / "es.nii.gz"],
        capsys,
    )
    assert "normalised prediction" in text


def test_landmark_heatmap_executes(fixtures, capsys):
    model, config = fixtures["lmk_heat"]
    text = _run_example(
        "landmark_heatmap",
        ["--model", model, "--config", config, "--image", fixtures["root"] / "landmark.png"],
        capsys,
    )
    assert "landmark coordinates" in text
    assert text.count("landmark ") >= 3


def test_landmark_coordinate_executes(fixtures, capsys):
    model, config = fixtures["lmk_coord"]
    text = _run_example(
        "landmark_coordinate",
        ["--model", model, "--config", config, "--image", fixtures["root"] / "landmark.png"],
        capsys,
    )
    assert "landmark coordinates" in text


def test_mae_reconstruction_executes(fixtures, capsys):
    model, config = fixtures["mae"]
    out = fixtures["root"] / "out_mae"
    text = _run_example(
        "mae",
        ["--model", model, "--config", config, "--study_dir", fixtures["root"] / "study00", "--out", out],
        capsys,
    )
    assert "loss=" in text
    assert (out / "recon_sax.npy").exists()
    assert (out / "recon_lax_2c.npy").exists()
    # reconstruction viz grid parity (reference mae.py:14-56)
    assert (out / "mae_reconstruction.png").exists()


def test_mae_feature_extraction_executes(fixtures, capsys):
    model, config = fixtures["mae"]
    out = fixtures["root"] / "out_feats" / "features.npz"
    text = _run_example(
        "mae_feature_extraction",
        ["--model", model, "--config", config, "--study_dir", fixtures["root"] / "study00", "--out", out],
        capsys,
    )
    assert "Saved features" in text
    feats = np.load(out)
    assert "cls" in feats
    assert "sax" in feats
