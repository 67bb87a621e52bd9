"""Utility layer: IO/paths/label parsing, PCA machinery, prediction handling."""
