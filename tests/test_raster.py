"""Raster-tile ↔ vector-cell mapping invariants."""

import math

import numpy as np
from pyspark.sql import functions as F

from s2spark import dataset
from s2spark.kernels import cellid, metrics
from s2spark.ops import raster
from tests.conftest import SF_DIR

GRID = 4
EXTENT = 2e-4
LEVEL = 14


def test_raster_cell_map_properties(spark):
    img = dataset.synth_images(spark, 300)
    m = raster.raster_cell_map(img, grid=GRID, extent_rad=EXTENT,
                               level=LEVEL)
    rows = m.collect()
    assert len(rows) == 300 * GRID * GRID          # full grid per image
    ids = np.array([r["rcell"] for r in rows], dtype=np.int64)
    assert cellid.is_valid(ids).all()
    assert (cellid.level(ids) == LEVEL).all()
    # every raster cell center is within footprint + cell diag of the
    # image location
    centers = {r["image_id"]: None for r in rows}
    src = {r["image_id"]: (r["x"], r["y"], r["z"])
           for r in img.select("image_id", "x", "y", "z").collect()}
    cx, cy, cz = cellid.to_point(ids)
    max_ang = (EXTENT * math.sqrt(2.0)
               + metrics.MAX_DIAG.get_value(LEVEL))
    max_chord2 = (2 * math.sin(min(max_ang, math.pi) / 2)) ** 2
    for k, r in enumerate(rows):
        x, y, z = src[r["image_id"]]
        d2 = (x - cx[k]) ** 2 + (y - cy[k]) ** 2 + (z - cz[k]) ** 2
        assert d2 <= max_chord2, (r["image_id"], r["tx"], r["ty"])


def test_raster_map_deterministic_and_kernel_equal(spark):
    img = dataset.synth_images(spark, 50)
    m1 = {(r["image_id"], r["tx"], r["ty"]): r["rcell"]
          for r in raster.raster_cell_map(img).collect()}
    m2 = {(r["image_id"], r["tx"], r["ty"]): r["rcell"]
          for r in raster.raster_cell_map(img).collect()}
    assert m1 == m2
    # independent scalar recomputation of a sample row
    some = img.select("image_id", "x", "y", "z").limit(5).collect()
    for r in some:
        got = raster.tangent_offset_cells(
            np.array([r["x"]]), np.array([r["y"]]), np.array([r["z"]]),
            np.array([-2e-4 + 2e-4 / 4]), np.array([-2e-4 + 2e-4 / 4]),
            14)
        assert m1[(r["image_id"], 0, 0)] == int(
            cellid.as_i64(got)[0])


def test_inverse_direction_counts(spark):
    img = dataset.synth_images(spark, 200)
    m = raster.raster_cell_map(img)
    inv = raster.cells_to_raster_tiles(m)
    total = inv.agg(F.sum("n_tiles")).collect()[0][0]
    assert total == 200 * GRID * GRID
