"""Multi-loop polygons with holes (even-odd) + loop relation matrix."""

import numpy as np
from pyspark.sql import functions as F

from s2spark import dataset
from s2spark.kernels.loops import Loop
from s2spark.ops import pip
from tests.conftest import SF_DIR


def _circle(lat, lng, radius, n=24):
    import math
    c = np.array([math.cos(math.radians(lng)) * math.cos(math.radians(lat)),
                  math.sin(math.radians(lng)) * math.cos(math.radians(lat)),
                  math.sin(math.radians(lat))])
    ref = np.array([0.0, 0.0, 1.0]) if abs(c[2]) < 0.9 else \
        np.array([1.0, 0.0, 0.0])
    u = np.cross(c, ref)
    u /= np.linalg.norm(u)
    v = np.cross(c, u)
    ang = 2 * np.pi * np.arange(n) / n
    pts = (np.cos(radius) * c[None, :]
           + np.sin(radius) * (np.cos(ang)[:, None] * u[None, :]
                               + np.sin(ang)[:, None] * v[None, :]))
    return Loop(pts / np.linalg.norm(pts, axis=1, keepdims=True))


def test_polygon_with_hole_even_odd(spark):
    outer = _circle(20, 50, 0.4)
    hole = _circle(20, 50, 0.15)
    polygons = {7: [outer, hole]}
    ev = dataset.geotagged_events(spark, SF_DIR) \
        .select("event_id", "cell_id", "x", "y", "z")
    rows = ev.collect()
    xyz = np.array([[r["x"], r["y"], r["z"]] for r in rows])
    ids = np.array([r["event_id"] for r in rows])
    in_outer = outer.contains_points(xyz)
    in_hole = hole.contains_points(xyz)
    expected = {(int(i), 7) for i in ids[in_outer & ~in_hole]}
    got = {(r["event_id"], r["polygon_id"])
           for r in pip.polygon_pip_join(ev, spark, polygons,
                                         point_id="event_id").collect()}
    assert got == expected
    assert in_hole.any() and (in_outer & ~in_hole).any(), \
        "fixture must exercise both ring and hole"


def test_loop_relations_matrix():
    a = _circle(0, 0, 0.5)          # big disc
    b = _circle(0, 0, 0.2)          # nested inside a
    c = _circle(0, 25, 0.45)        # overlapping a (boundary crossing)
    d = _circle(0, 90, 0.2)         # far away
    rel = pip.loop_relations({0: a, 1: b, 2: c, 3: d})
    m = {(r.loop_a, r.loop_b): r.relation for r in rel.itertuples()}
    assert m[(0, 1)] == "contains"
    assert m[(0, 2)] == "intersects"
    assert m[(0, 3)] == "disjoint"
    # b: radius .2 at dist .436 from c (radius .45): boundaries cross
    assert m[(1, 2)] == "intersects"
    assert m[(1, 3)] == "disjoint"
    assert m[(2, 3)] == "disjoint"
