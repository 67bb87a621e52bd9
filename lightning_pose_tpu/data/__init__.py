"""Data layer: label datasets, on-device heatmap/bbox math, augmentation,
host video decode pipeline, and data modules."""
