"""ShapeIndexRegion / ShapeIndexBufferedRegion coverings
(s2shape_index_region.h:73-115, s2shape_index_buffered_region.h:36-57
+ .cc:90-127): region-protocol equivalence with Loop for polygon-only
collections, the buffered-point == cap identity the reference
documents, and coverage guarantees under buffering."""

import numpy as np
import pytest

from s2spark.kernels import cellid as ci
from s2spark.kernels.coverer import RegionCoverer
from s2spark.kernels.layers import GeometryCollection
from s2spark.kernels.loops import Loop, parse_vertices
from s2spark.kernels.region import Cap, Cell, latlng_to_point
from s2spark.kernels.shape_region import (ShapeIndexBufferedRegion,
                                          ShapeIndexRegion)


def _loop(text):
    return Loop(parse_vertices(text))


def _covering_set(region, max_cells=16):
    rc = RegionCoverer(max_cells=max_cells)
    return set(int(c) for c in ci.as_i64(
        np.asarray(rc.get_covering(region), dtype=np.uint64)))


def _leaf_covered(leaf: int, covering: set) -> bool:
    for c in covering:
        cu = np.array([np.uint64(c)])
        lo_min = int(ci.as_i64(ci.range_min(cu))[0])
        lo_max = int(ci.as_i64(ci.range_max(cu))[0])
        if lo_min <= leaf <= lo_max:
            return True
    return False


SQUARE = "0:0, 0:10, 10:10, 10:0"


def test_polygon_only_matches_loop_region_protocol():
    lp = _loop(SQUARE)
    reg = ShapeIndexRegion(GeometryCollection(region=[lp]))
    rng = np.random.default_rng(7)
    # cells at assorted levels centered on assorted lat/lngs
    for _ in range(60):
        lat = float(rng.uniform(-30, 40))
        lng = float(rng.uniform(-20, 30))
        lev = int(rng.integers(2, 12))
        p = latlng_to_point(np.radians(lat), np.radians(lng))
        cid = int(ci.as_i64(ci.parent(ci.from_xyz(
            np.array([p[0]]), np.array([p[1]]),
            np.array([p[2]])), lev))[0])
        cell = Cell(cid)
        assert reg.contains_cell(cell) == lp.contains_cell(cell)
        assert reg.may_intersect_cell(cell) == \
            lp.may_intersect_cell(cell)


def test_covering_of_mixed_collection_covers_all_vertices():
    col = GeometryCollection(
        points=np.asarray([latlng_to_point(np.radians(25),
                                           np.radians(25))]),
        lines=[parse_vertices("15:15, 16:16, 17:15")],
        region=[_loop(SQUARE)])
    cov = _covering_set(ShapeIndexRegion(col), max_cells=24)
    probes = [latlng_to_point(np.radians(25), np.radians(25)),
              parse_vertices("15:15")[0], parse_vertices("16:16")[0],
              parse_vertices("5:5")[0], parse_vertices("0:0")[0]]
    for p in probes:
        leaf = int(ci.as_i64(ci.from_xyz(
            np.array([p[0]]), np.array([p[1]]),
            np.array([p[2]])))[0])
        assert _leaf_covered(leaf, cov)


def test_buffered_point_equals_cap_covering():
    # the reference doc: a buffered point region IS the cap of that
    # radius (s2shape_index_buffered_region.h:45-48)
    p = latlng_to_point(np.radians(12.0), np.radians(34.0))
    for r in (0.01, 0.1, 0.7):
        buf = ShapeIndexBufferedRegion(
            GeometryCollection(points=np.asarray([p])), r)
        cap = Cap.from_point_angle(tuple(p), r)
        assert _covering_set(buf) == _covering_set(cap)


def test_buffered_covering_contains_samples_within_radius():
    line = parse_vertices("0:0, 0:5, 5:5")
    col = GeometryCollection(lines=[line])
    r = 0.02
    cov = _covering_set(ShapeIndexBufferedRegion(col, r),
                        max_cells=24)
    rng = np.random.default_rng(3)
    # samples: perturb line vertices by < r in a random tangent dir
    for _ in range(80):
        v = line[int(rng.integers(0, len(line)))]
        t = rng.normal(size=3)
        t -= np.dot(t, v) * v
        t /= np.linalg.norm(t)
        ang = float(rng.uniform(0, r * 0.95))
        q = v * np.cos(ang) + t * np.sin(ang)
        leaf = int(ci.as_i64(ci.from_xyz(
            np.array([q[0]]), np.array([q[1]]),
            np.array([q[2]])))[0])
        assert _leaf_covered(leaf, cov)


def test_buffered_zero_radius_covers_geometry():
    col = GeometryCollection(
        points=np.asarray([latlng_to_point(0.3, 0.4)]),
        lines=[parse_vertices("40:40, 41:41")])
    cov = _covering_set(ShapeIndexBufferedRegion(col, 0.0))
    for p in [latlng_to_point(0.3, 0.4), parse_vertices("40:40")[0],
              parse_vertices("41:41")[0]]:
        leaf = int(ci.as_i64(ci.from_xyz(
            np.array([p[0]]), np.array([p[1]]),
            np.array([p[2]])))[0])
        assert _leaf_covered(leaf, cov)


def test_buffered_contains_cell_deep_inside():
    p = latlng_to_point(np.radians(5.0), np.radians(5.0))
    buf = ShapeIndexBufferedRegion(
        GeometryCollection(points=np.asarray([p])), 0.2)
    # a tiny cell at the point itself is deep inside the buffer
    cid = int(ci.as_i64(ci.parent(ci.from_xyz(
        np.array([p[0]]), np.array([p[1]]), np.array([p[2]])),
        12))[0])
    assert buf.contains_cell(Cell(cid))
    # a cell centered far outside is not contained and not
    # intersecting
    q = latlng_to_point(np.radians(-60.0), np.radians(120.0))
    far = int(ci.as_i64(ci.parent(ci.from_xyz(
        np.array([q[0]]), np.array([q[1]]), np.array([q[2]])),
        8))[0])
    assert not buf.contains_cell(Cell(far))
    assert not buf.may_intersect_cell(Cell(far))


def test_buffered_polygon_interior_distance_zero():
    lp = _loop(SQUARE)
    buf = ShapeIndexBufferedRegion(
        GeometryCollection(region=[lp]), 0.01)
    inside = latlng_to_point(np.radians(5.0), np.radians(5.0))
    cid = int(ci.as_i64(ci.parent(ci.from_xyz(
        np.array([inside[0]]), np.array([inside[1]]),
        np.array([inside[2]])), 10))[0])
    assert buf.may_intersect_cell(Cell(cid))
    assert buf.contains_point(inside)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
