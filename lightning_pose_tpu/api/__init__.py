"""High-level API: Model handle and config validation."""
