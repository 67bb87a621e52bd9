"""Model layer: Flax backbones, heads, and pose tracker assemblies."""
