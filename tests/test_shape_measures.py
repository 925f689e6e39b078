"""Shape / collection measures (s2centroids.h, s2shape_measures.h,
s2shape_index_measures.h): true-centroid identities, the signed-area
hole rule, and the max-dimension centroid selection."""

import math

import numpy as np
import pytest

from s2spark.kernels.layers import GeometryCollection
from s2spark.kernels.loops import Loop, parse_vertices
from s2spark.kernels.region import latlng_to_point
from s2spark.kernels.shape_measures import (collection_measures,
                                            loop_centroid,
                                            loop_perimeter,
                                            loop_signed_area,
                                            polyline_centroid,
                                            polyline_length,
                                            true_centroid_edge,
                                            true_centroid_triangle)


def ll(lat, lng):
    return np.asarray(latlng_to_point(np.radians(lat),
                                      np.radians(lng)))


def test_edge_centroid_quarter_circle():
    # edge from (1,0,0) to (0,1,0): length pi/2, centroid direction
    # along the 45-degree bisector, magnitude = length * cos(45 deg)
    # averaged... verify against dense numerical integration
    a, b = np.array([1.0, 0, 0]), np.array([0.0, 1, 0])
    got = true_centroid_edge(a, b)
    ts = np.linspace(0, math.pi / 2, 20001)
    pts = np.stack([np.cos(ts), np.sin(ts), np.zeros_like(ts)],
                   axis=1)
    want = pts.mean(axis=0) * (math.pi / 2)
    assert np.allclose(got, want, atol=1e-6)


def test_triangle_centroid_signed_by_orientation():
    a, b, c = ll(0, 0), ll(0, 10), ll(10, 5)
    fwd = true_centroid_triangle(a, b, c)
    rev = true_centroid_triangle(a, c, b)
    assert np.allclose(fwd, -rev, atol=1e-15)
    # magnitude scales with area; direction points into the triangle
    area = Loop(np.stack([a, b, c])).get_area()
    centroid_dir = fwd / np.linalg.norm(fwd)
    mid = (a + b + c) / 3.0
    assert np.dot(centroid_dir, mid / np.linalg.norm(mid)) > 0.99
    # |centroid| = area * |mean interior position| (just under 1)
    assert 0.99 * area < np.linalg.norm(fwd) < area


def test_polyline_length_and_centroid():
    v = np.stack([ll(0, 0), ll(0, 90), ll(90, 90)])
    assert polyline_length(v) == pytest.approx(math.pi, abs=1e-12)
    c = polyline_centroid(v)
    # integral of position over both quarter arcs
    assert np.linalg.norm(c) > 0


def test_signed_area_hole_rule():
    shell = parse_vertices("0:0, 0:10, 10:10, 10:0")
    # "2:2, 6:2, 6:6, 2:6" traverses CW: its interior-on-left area is
    # the near-4pi complement, i.e. a HOLE of the small square
    hole_cw = parse_vertices("2:2, 6:2, 6:6, 2:6")
    a_shell = loop_signed_area(shell)
    a_hole = loop_signed_area(hole_cw)
    assert a_shell > 0 and a_hole < 0
    col = GeometryCollection(region=[shell, hole_cw])
    m = collection_measures(col)
    assert m["area"] == pytest.approx(a_shell + a_hole, abs=1e-14)
    assert m["area"] == pytest.approx(
        Loop(shell).get_area()
        - Loop(hole_cw[::-1].copy()).get_area(), abs=1e-9)
    # perimeter counts shells AND holes
    assert m["perimeter"] == pytest.approx(
        loop_perimeter(shell) + loop_perimeter(hole_cw), abs=1e-14)


def test_full_sphere_area():
    from s2spark.kernels.builder import FULL
    m = collection_measures(GeometryCollection(region=FULL))
    assert m["area"] == pytest.approx(4 * math.pi)
    assert m["dim"] == 2


def test_collection_dimension_rules():
    assert collection_measures(GeometryCollection())["dim"] == -1
    p = GeometryCollection(points=np.asarray([ll(1, 1)]))
    assert collection_measures(p)["dim"] == 0
    assert collection_measures(p)["num_points"] == 1
    line = GeometryCollection(lines=[parse_vertices("0:0, 0:1")])
    assert collection_measures(line)["dim"] == 1
    # polyline vertices are NOT points
    assert collection_measures(line)["num_points"] == 0


def test_max_dimension_centroid_selection():
    # with a polygon present, the centroid ignores points/lines
    shell = parse_vertices("0:0, 0:10, 10:10, 10:0")
    both = GeometryCollection(points=np.asarray([ll(80, 80)]),
                              lines=[parse_vertices("40:40, 41:41")],
                              region=[shell])
    only_poly = GeometryCollection(region=[shell])
    ma, mb = collection_measures(both), collection_measures(only_poly)
    assert np.allclose(ma["centroid"], mb["centroid"], atol=0)
    assert np.allclose(mb["centroid"], loop_centroid(shell), atol=0)


def test_loop_centroid_matches_triangle_fan():
    shell = parse_vertices("0:0, 0:10, 10:10, 10:0")
    want = (true_centroid_triangle(shell[0], shell[1], shell[2])
            + true_centroid_triangle(shell[0], shell[2], shell[3]))
    assert np.allclose(loop_centroid(shell), want, atol=0)
    # magnitude ~ area, direction through the interior
    area = Loop(shell).get_area()
    assert 0.98 * area < np.linalg.norm(loop_centroid(shell)) < area


def test_degenerate_chain_measures():
    sib = parse_vertices("1:1, 2:2")
    pt = parse_vertices("3:3")
    col = GeometryCollection(region=[sib, pt])
    m = collection_measures(col)
    assert m["dim"] == 2
    assert m["area"] == pytest.approx(0.0, abs=1e-15)
    assert m["perimeter"] == pytest.approx(
        2.0 * polyline_length(sib), abs=1e-15)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_polyline_length_centroid_great_circles():
    """s2polyline_measures_test.cc:36-62: random great circles split
    into random segments must have length 2π and vector centroid 0 —
    independent of the segmentation."""
    import math

    from s2spark.kernels.pointutil import get_frame
    from s2spark.kernels.shape_measures import (polyline_centroid,
                                                polyline_length)
    rng = np.random.default_rng(17)
    for _ in range(100):
        z = rng.normal(size=3)
        z /= np.linalg.norm(z)
        m = get_frame(z[None])[0]
        x, y = m[:, 0], m[:, 1]
        thetas = []
        theta = 0.0
        while theta < 2 * math.pi:
            thetas.append(theta)
            theta += rng.uniform(0.0, 1.0) ** 10
        line = np.array([math.cos(t) * x + math.sin(t) * y
                         for t in thetas] + [x])
        assert abs(polyline_length(line) - 2 * math.pi) <= 2e-14
        assert np.linalg.norm(polyline_centroid(line)) <= 2e-14


def test_collection_measures_reference_fixtures():
    """s2shape_index_measures_test.cc:42-175: dimension / num_points /
    length / perimeter / area / centroid over mixed collections (the
    "# # full | full" double-full case is out of model — one
    GeometryCollection holds ONE even/odd region — so the single-full
    4π case pins that branch instead)."""
    import math

    from s2spark.kernels.builder import FULL
    from s2spark.kernels.layers import GeometryCollection as GC
    from s2spark.kernels.loops import parse_vertices as pv
    from s2spark.kernels.shape_measures import collection_measures

    def m(points=None, lines=None, region=None):
        return collection_measures(GC(points, lines, region))

    # dimension
    assert m()["dim"] == -1
    assert m(points=pv("0:0"))["dim"] == 0
    assert m(points=pv("0:0"), lines=[pv("1:1, 1:2")])["dim"] == 1
    assert m(points=pv("0:0"), lines=[pv("1:1, 2:2")],
             region=[pv("3:3, 3:4, 4:3")])["dim"] == 2
    # num_points
    assert m()["num_points"] == 0
    assert m(points=pv("0:0, 1:0"))["num_points"] == 2
    assert m(lines=[pv("1:1, 1:2")],
             region=[pv("0:3, 0:5, 2:5")])["num_points"] == 0
    # length (sums polylines only)
    assert m()["length"] == 0.0
    got = m(points=pv("4:4"), lines=[pv("0:0, 1:0"), pv("1:0, 2:0")],
            region=[pv("5:5, 5:6, 6:5")])
    assert abs(math.degrees(got["length"]) - 2.0) < 1e-12
    # perimeter (polygon chains)
    assert m()["perimeter"] == 0.0
    got = m(points=pv("4:4"), lines=[pv("0:0, 1:0"), pv("2:0, 3:0")],
            region=[pv("0:1, 0:2, 0:3")])
    assert abs(math.degrees(got["perimeter"]) - 4.0) < 1e-9
    # area
    assert m()["area"] == 0.0
    assert m(region=FULL)["area"] == 4 * math.pi
    # centroid
    assert np.allclose(m()["centroid"], (0, 0, 0))
    assert np.allclose(m(points=pv("0:0, 0:90"))["centroid"],
                       (1, 1, 0), atol=1e-15)
    got = m(points=pv("5:5, 6:6"), lines=[pv("0:0, 0:90")])
    assert np.allclose(got["centroid"], (1, 1, 0), atol=1e-14)
    got = m(points=pv("5:5"), lines=[pv("6:6, 7:7")],
            region=[pv("0:0, 0:90, 90:0")])
    assert np.allclose(got["centroid"],
                       (math.pi / 4, math.pi / 4, math.pi / 4),
                       atol=1e-14)
