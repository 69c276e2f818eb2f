"""DICOM-sourced preprocessing entry points: Kaggle DSB, rescan, UKB.

Thin console-script shims (names pinned by pyproject.toml) over the full
pipelines, which are built on the from-scratch DICOM reader
(cinema_tpu.data.dicom) and the oriented-volume toolkit
(cinema_tpu.data.volume):

- cinema_tpu.data.preprocess.kaggle  (reference cinema/data/kaggle/preprocess.py)
- cinema_tpu.data.preprocess.rescan  (reference cinema/data/rescan/preprocess.py)
- cinema_tpu.data.preprocess.ukb_dicom (reference cinema/examples/dicom_to_nifti.py)
"""

from __future__ import annotations

from cinema_tpu.data.preprocess.kaggle import main as main_kaggle
from cinema_tpu.data.preprocess.rescan import main as main_rescan
from cinema_tpu.data.preprocess.ukb_dicom import main as main_dicom_to_nifti

__all__ = ["main_kaggle", "main_rescan", "main_dicom_to_nifti"]
