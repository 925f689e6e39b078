"""s2spark — a PySpark-native S2 spatial-join + tiling engine (from scratch)."""

__version__ = "0.1.0"
