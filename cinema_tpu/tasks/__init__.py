"""Task x dataset entry points (reference L5: cinema/{segmentation,classification,regression}/<dataset>/)."""
