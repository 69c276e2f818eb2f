"""Data engine: NIfTI IO, geometry, transforms, datasets, loaders."""
