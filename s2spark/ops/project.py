"""Distributed map-projection operators (S2::Projection /
S2EdgeTessellator surface, s2projections.h:16-26,
s2edge_tessellator.h:16-27): project point tables into planar map
coordinates and tessellate per-entity tracks into projected chains
with a guaranteed error tolerance — the web-map rendering path."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import (ArrayType, DoubleType, StructField,
                               StructType)


def project_points(df: DataFrame, projection,
                   out_x: str = "px", out_y: str = "py") -> DataFrame:
    """Append planar (px, py) columns for unit-vector (x,y,z) rows —
    one Arrow-batched kernel call per batch."""
    schema = StructType([StructField("px", DoubleType()),
                         StructField("py", DoubleType())])

    @pandas_udf(schema)
    def proj(x: pd.Series, y: pd.Series, z: pd.Series) -> pd.DataFrame:
        pts = np.column_stack([x.to_numpy(np.float64),
                               y.to_numpy(np.float64),
                               z.to_numpy(np.float64)])
        xy = projection.project(pts)
        return pd.DataFrame({"px": xy[:, 0], "py": xy[:, 1]})

    return (df.withColumn("_p", proj("x", "y", "z"))
            .withColumn(out_x, F.col("_p.px"))
            .withColumn(out_y, F.col("_p.py"))
            .drop("_p"))


def tessellate_track(events: DataFrame, entity: str,
                     order_cols: list[str], projection,
                     tolerance_rad: float) -> DataFrame:
    """Per-entity track -> projected polyline with tessellated
    geodesic segments: (entity, seg, xs array<double>, ys
    array<double>); chain midpoints stay within tolerance of the true
    geodesics (kernels/projections.py)."""
    schema = (f"{entity} long, seg int, xs array<double>, "
              f"ys array<double>")

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..kernels.projections import tessellate_projected
        g = pdf[entity].iloc[0]
        pdf = pdf.sort_values(order_cols, ignore_index=True)
        v = pdf[["x", "y", "z"]].to_numpy(np.float64)
        rows = []
        for k in range(len(v) - 1):
            chain = tessellate_projected(v[k], v[k + 1], projection,
                                         tolerance_rad)
            rows.append((g, k, chain[:, 0].tolist(),
                         chain[:, 1].tolist()))
        return pd.DataFrame(rows, columns=[entity, "seg", "xs", "ys"])

    return (events.select(entity, *order_cols, "x", "y", "z")
            .groupBy(entity).applyInPandas(run, schema))
