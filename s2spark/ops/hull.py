"""Distributed convex hull: per-group spherical hulls
(S2ConvexHullQuery, s2convex_hull_query.h:16-27) with the group as
the parallel axis — footprint summarization for point clouds, tracks,
or polygon vertex sets at table scale.

Each group's points flow through one applyInPandas call into the
exact monotone-chain kernel (kernels/hull.py); output rows are
(group, seq, point_key) hull vertices in canonical CCW order (rotated
to start at the smallest key), entirely integer-valued so the driver
oracle can value-check them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def convex_hull_by_group(points: DataFrame, group_col: str,
                         key_col: str) -> DataFrame:
    """points: (group_col, key_col, x, y, z) -> (group_col, seq,
    point_key); hull-spanning groups (full-sphere hull) emit a single
    row with seq = -1, point_key = -1."""
    schema = f"{group_col} long, seq int, point_key long"

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels import hull as hk
        g = int(pdf[group_col].iloc[0])
        pdf = pdf.sort_values(key_col, ignore_index=True)
        pts = pdf[["x", "y", "z"]].to_numpy(np.float64)
        idx = hk.hull_indices(pts)
        if idx is None:
            return pd.DataFrame([(g, -1, -1)],
                                columns=[group_col, "seq", "point_key"])
        keys = pdf[key_col].to_numpy(np.int64)
        rows = [(g, i, int(keys[j])) for i, j in enumerate(idx)]
        return pd.DataFrame(rows, columns=[group_col, "seq",
                                           "point_key"])

    return points.groupBy(group_col).applyInPandas(run, schema)
