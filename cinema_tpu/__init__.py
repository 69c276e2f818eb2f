"""cinema_tpu: TPU-native (JAX/Flax/Pallas) framework for cine cardiac MRI
foundation models, with the capabilities of the CineMA reference stack.

Public surface mirrors the reference package root (cinema/__init__.py:3-34).
"""

from cinema_tpu.constants import (
    ALL_VIEWS,
    BACKGROUND_LABEL,
    LABEL_TO_NAME,
    LV_LABEL,
    MYO_LABEL,
    NORMAL_EF,
    REDUCED_EF,
    RV_LABEL,
    UKB_LAX_SLICE_SIZE,
    UKB_N_FRAMES,
    UKB_N_SUBJECTS,
    UKB_SAX_SLICE_SIZE,
    UKB_SPACING,
)
from cinema_tpu.metrics import heatmap_soft_argmax
from cinema_tpu.models.convunetr import ConvUNetR
from cinema_tpu.models.convvit import ConvViT
from cinema_tpu.models.mae import CineMA
from cinema_tpu.models.unet import UNet
from cinema_tpu.ops.patch import patchify, unpatchify

__version__ = "0.1.0"

__all__ = [
    "CineMA",
    "ConvUNetR",
    "ConvViT",
    "UNet",
    "heatmap_soft_argmax",
    "patchify",
    "unpatchify",
    "UKB_SPACING",
    "UKB_LAX_SLICE_SIZE",
    "UKB_SAX_SLICE_SIZE",
    "UKB_N_FRAMES",
    "UKB_N_SUBJECTS",
    "ALL_VIEWS",
    "BACKGROUND_LABEL",
    "LABEL_TO_NAME",
    "RV_LABEL",
    "MYO_LABEL",
    "LV_LABEL",
    "REDUCED_EF",
    "NORMAL_EF",
]
