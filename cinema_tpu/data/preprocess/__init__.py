"""Offline preprocessing CLIs (reference: cinema/data/*/preprocess.py).

Raw challenge downloads -> resampled, LV-centered, intensity-normalised
uint8 NIfTI folders + metadata.csv, the layout consumed by the task
datasets. Host-side numpy/scipy code.
"""
