"""Raster-tile ↔ vector-cell mapping (north star): each geotagged
image's pixel grid is split into g x g raster tiles; every raster
tile's center maps to the S2 cell containing it, producing the
(image, tile) -> cell association table used to join imagery against
vector layers (coverings, polygons, tile stats).

Plan shape: pure-SQL explode of the (tx, ty) grid (no data motion),
then ONE vectorized kernel UDF row batch -> cell ids; the result is a
plain relational table that joins against everything else by the
usual Hilbert-prefix keys.  Inverse direction (cell -> raster tiles)
is the same table grouped the other way.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.pandas.functions import pandas_udf
from pyspark.sql.types import LongType

from .. import functions as s2f
from ..kernels import cellid


def tangent_offset_cells(x, y, z, du, dv, level) -> np.ndarray:
    """Vectorized: unit centers (x,y,z) + tangent-plane offsets
    (du, dv) in radians -> cell id at `level`.

    Tangent basis: e1 = normalize(c x ref), e2 = c x e1, with ref =
    +z (or +x near the poles) — deterministic per row.
    """
    from ..kernels.pointutil import tangent_frame
    c = np.column_stack([x, y, z]).astype(np.float64)
    e1, e2 = tangent_frame(c)
    p = c + du[:, None] * e1 + dv[:, None] * e2
    p /= np.linalg.norm(p, axis=1, keepdims=True)
    leaf = cellid.from_xyz(p[:, 0], p[:, 1], p[:, 2])
    return cellid.parent(leaf, np.int64(level))


def make_raster_cell_udf(level: int):
    @pandas_udf(LongType())
    def raster_cell(x, y, z, du, dv):
        out = tangent_offset_cells(
            x.to_numpy(np.float64), y.to_numpy(np.float64),
            z.to_numpy(np.float64), du.to_numpy(np.float64),
            dv.to_numpy(np.float64), level)
        return pd.Series(cellid.as_i64(out))

    return raster_cell


def raster_cell_map(images: DataFrame, grid: int = 4,
                    extent_rad: float = 2e-4, level: int = 14,
                    image_id: str = "image_id") -> DataFrame:
    """(image_id, tx, ty, rcell): the raster-tile -> cell association.

    `extent_rad` is the half-width of the image footprint on the
    ground (2e-4 rad ≈ 1.3 km); raster tile (tx, ty) covers the
    [tx, tx+1) x [ty, ty+1) / grid fraction of it and is keyed by its
    center point's level-`level` cell.
    """
    g = F.explode(F.sequence(F.lit(0), F.lit(grid - 1)))
    step = 2.0 * extent_rad / grid
    off = -extent_rad + step / 2.0
    w = (images.select(image_id, "x", "y", "z", g.alias("tx"))
         .select(image_id, "x", "y", "z", "tx", g.alias("ty"))
         .withColumn("_du", F.lit(off) + F.col("tx") * F.lit(step))
         .withColumn("_dv", F.lit(off) + F.col("ty") * F.lit(step)))
    cell = make_raster_cell_udf(level)(
        F.col("x"), F.col("y"), F.col("z"), F.col("_du"), F.col("_dv"))
    return w.select(image_id, "tx", "ty", cell.alias("rcell"))


def cells_to_raster_tiles(mapping: DataFrame) -> DataFrame:
    """Inverse direction: per vector cell, the raster tiles that fall
    in it (count + distinct images)."""
    return (mapping.groupBy("rcell")
            .agg(F.count(F.lit(1)).alias("n_tiles"),
                 F.count_distinct("image_id").alias("n_images")))
