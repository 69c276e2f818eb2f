"""DICOM-sourced preprocessing stubs: Kaggle DSB, UKB DICOM->NIfTI, rescan.

The reference pipelines for these datasets (cinema/data/kaggle/preprocess.py,
cinema/examples/dicom_to_nifti.py, cinema/data/rescan/preprocess.py) parse
DICOM series via pydicom/SimpleITK. This environment ships neither, and a
from-scratch DICOM parser is scheduled for the next round (see README
roadmap). The NIfTI halves of the pipeline (spacing resample, LV-center
crops from LAX/SAX plane intersections, intensity normalisation) already
exist in cinema_tpu.data.geometry — only series parsing is missing.
"""

from __future__ import annotations

_MESSAGE = (
    "{name} preprocessing requires DICOM series parsing, which is not yet "
    "implemented in cinema_tpu (pydicom/SimpleITK are unavailable in this "
    "environment). The geometry pipeline (plane intersections, resampling, "
    "cropping, normalisation) is available in cinema_tpu.data.geometry; a "
    "native DICOM reader is planned. If your data is already in NIfTI form, "
    "use the per-dataset NIfTI preprocessors instead."
)


def main_kaggle() -> None:
    raise NotImplementedError(_MESSAGE.format(name="Kaggle second-annual-DSB"))


def main_rescan() -> None:
    raise NotImplementedError(_MESSAGE.format(name="Rescan (pickle/DICOM)"))


def main_dicom_to_nifti() -> None:
    raise NotImplementedError(_MESSAGE.format(name="UKB DICOM->NIfTI"))
