"""Execution tests for the self-contained training tutorials in
examples/train/ (the reference ships equivalent minimalist loops,
reference cinema/examples/train/*.py): each must train on synthetic data
and export a safetensors checkpoint end-to-end."""

import importlib
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from cinema_tpu.config import apply_overrides, load_config
from cinema_tpu.data.nifti import save_nifti

pytestmark = pytest.mark.slow  # full-model tier; fast tier runs -m "not slow"

EXAMPLES = Path(__file__).parent.parent / "examples" / "train"
PATHOLOGIES = ["DCM", "HCM", "MINF", "NOR", "RV"]


def _load_tutorial(name):
    sys.path.insert(0, str(EXAMPLES))
    try:
        mod = importlib.import_module(name)
        return importlib.reload(mod)  # fresh under parametrized runs
    finally:
        sys.path.pop(0)


@pytest.fixture(scope="module")
def acdc_dir(tmp_path_factory):
    """Synthetic ACDC-like processed directory (15 patients, ef column)."""
    root = tmp_path_factory.mktemp("tut_acdc")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(15):
        pid = f"patient{i:03d}"
        pid_dir = root / "train" / pid
        pid_dir.mkdir(parents=True)
        n_slices = int(rng.integers(4, 6))
        for frame in ["ed", "es"]:
            image = rng.uniform(0, 255, size=(20, 20, n_slices)).astype(np.float32)
            label = rng.integers(0, 4, size=(20, 20, n_slices)).astype(np.uint8)
            save_nifti(pid_dir / f"{pid}_sax_{frame}.nii.gz", image, spacing=(1, 1, 10))
            save_nifti(pid_dir / f"{pid}_sax_{frame}_gt.nii.gz", label, spacing=(1, 1, 10))
        rows.append(
            {
                "pid": pid,
                "n_slices": n_slices,
                "pathology": PATHOLOGIES[i % 5],
                "ef": float(rng.uniform(20, 70)),
            }
        )
    pd.DataFrame(rows).to_csv(root / "train_metadata.csv", index=False)
    return root


_TINY_COMMON = [
    "data.sax.patch_size=[16,16,4]",
    "transform.sax.translate_range=[2,2,0]",
    "train.batch_size_per_device=2",
    "train.n_warmup_epochs=0",
    "train.eval_interval=1",
    "train.early_stopping.patience=2",
]


def test_segmentation_tutorial(acdc_dir, tmp_path):
    tut = _load_tutorial("segmentation")
    config = apply_overrides(
        load_config(tut.CONFIG),
        [
            f"data.dir={acdc_dir}",
            *_TINY_COMMON,
            "transform.sax.dropout_size=[4,4,1]",
            "model.convunetr.size=tiny",
            "model.convunetr.enc_conv_chans=[4,8]",
            "model.convunetr.enc_conv_n_blocks=1",
            "model.convunetr.dec_chans=[4,8,12,16,24]",
            "model.convunetr.dropout=0.0",
            "model.convunetr.drop_path=0.0",
            f"logging.dir={tmp_path}",
        ],
    )
    tut.run(config, n_epochs=1)
    assert (tmp_path / "best.safetensors").exists()


def test_classification_tutorial(acdc_dir, tmp_path):
    tut = _load_tutorial("classification")
    config = apply_overrides(
        load_config(tut.CONFIG),
        [
            f"data.dir={acdc_dir}",
            *_TINY_COMMON,
            "model.convvit.size=tiny",
            "model.convvit.enc_conv_chans=[4,8]",
            "model.convvit.enc_conv_n_blocks=1",
            "model.convvit.dropout=0.0",
            f"logging.dir={tmp_path}",
        ],
    )
    tut.run(config, n_epochs=1)
    assert (tmp_path / "best.safetensors").exists()


def test_regression_tutorial(acdc_dir, tmp_path):
    tut = _load_tutorial("regression")
    config = apply_overrides(
        load_config(tut.CONFIG),
        [
            f"data.dir={acdc_dir}",
            *_TINY_COMMON,
            "model.convvit.size=tiny",
            "model.convvit.enc_conv_chans=[4,8]",
            "model.convvit.enc_conv_n_blocks=1",
            "model.convvit.dropout=0.0",
            f"logging.dir={tmp_path}",
        ],
    )
    tut.run(config, n_epochs=1)
    assert (tmp_path / "best.safetensors").exists()


def test_pretrain_tutorial(tmp_path_factory, tmp_path):
    root = tmp_path_factory.mktemp("tut_ukb")
    rng = np.random.default_rng(0)
    for i in range(4):
        pid = f"study{i:03d}"
        pid_dir = root / pid
        pid_dir.mkdir(parents=True)
        video = rng.uniform(0, 255, size=(16, 16, 4, 3)).astype(np.float32)
        save_nifti(pid_dir / f"{pid}_sax_t.nii.gz", video, spacing=(1, 1, 10, 1))
    tut = _load_tutorial("pretrain")
    config = apply_overrides(
        load_config(tut.CONFIG),
        [
            f"data.dir={root}",
            "model.views=[sax]",
            "model.size=tiny",
            "model.enc_conv_chans=[4,8]",
            "model.enc_conv_n_blocks=1",
            "data.sax.patch_size=[16,16,4]",
            "transform.sax.translate_range=[2,2,0]",
            "train.batch_size_per_device=2",
            "train.n_warmup_epochs=0",
            f"logging.dir={tmp_path}",
        ],
    )
    tut.run(config, n_epochs=1)
    assert (tmp_path / "last.safetensors").exists()
