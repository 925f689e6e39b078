"""S2ChainInterpolationQuery reference battery
(s2chain_interpolation_query_test.cc:38-309)."""

import math

import numpy as np

from s2spark.kernels.chain_interp import ChainInterpolationQuery
from s2spark.kernels.edges import _angle
from s2spark.kernels.loops import parse_vertices
from s2spark.kernels.validation import VShape

EPS = 1e-8


def _pt(lat_deg, lng_deg):
    from s2spark.kernels.coords import latlng_to_xyz
    x, y, z = latlng_to_xyz(np.array([float(lat_deg)]),
                            np.array([float(lng_deg)]))
    return np.array([x[0], y[0], z[0]])


def _lat_deg(p) -> float:
    return math.degrees(math.asin(max(-1.0, min(1.0, float(p[2])))))


def test_simple_polylines():
    lat_b, lat_c = 1.0, 2.5
    total = lat_c
    a, b, c = _pt(0, 0), _pt(lat_b, 0), _pt(lat_c, 0)
    q_empty = ChainInterpolationQuery(VShape(1, []))
    q_ac = ChainInterpolationQuery(VShape(1, [np.array([a, c])]))
    q_abc = ChainInterpolationQuery(VShape(1, [np.array([a, b, c])]))
    q_bb = ChainInterpolationQuery(VShape(1, [np.array([b, b])]))
    q_cc = ChainInterpolationQuery(VShape(1, [np.array([c])]))
    uninit = ChainInterpolationQuery()

    distances = [-1.0, 0.0, 1.0e-8, lat_b / 2, lat_b - 1.0e-7, lat_b,
                 lat_b + 1.0e-5, lat_b + 0.5, lat_c - 10.e-7, lat_c,
                 lat_c + 10.e-16, 1.e6]
    assert not uninit.at_fraction(0).is_valid()
    inf_res = q_ac.at_distance(math.inf)
    assert inf_res.is_valid()
    assert math.degrees(_angle(inf_res.point, c)) <= EPS
    assert math.degrees(q_empty.get_length()) <= EPS
    assert abs(math.degrees(q_ac.get_length()) - total) <= EPS
    assert abs(math.degrees(q_abc.get_length()) - total) <= EPS
    assert math.degrees(q_bb.get_length()) <= EPS
    assert math.degrees(q_cc.get_length()) <= EPS

    for d in distances:
        f = d / total
        lat = max(0.0, min(d, total))
        truth_pt = _pt(lat, 0)
        truth_edge = 0 if d < lat_b else 1
        assert not q_empty.at_fraction(f).is_valid()
        r_ac, r_abc = q_ac.at_fraction(f), q_abc.at_fraction(f)
        r_bb, r_cc = q_bb.at_fraction(f), q_cc.at_fraction(f)
        assert r_ac.is_valid() and r_abc.is_valid() and r_bb.is_valid()
        assert not r_cc.is_valid()
        assert _angle(r_ac.point, truth_pt) <= math.radians(EPS) * 60
        assert _angle(r_abc.point, truth_pt) <= math.radians(EPS) * 60
        assert _angle(r_bb.point, b) <= math.radians(EPS)
        assert r_ac.edge_id == 0
        assert r_bb.edge_id == 0
        assert r_abc.edge_id == truth_edge, d


def test_distance():
    distances = [-1.0, -1.0e-8, 0.0, 1.0e-8, 0.2, 0.5, 1.0 - 1.0e-8,
                 1.0, 1.0 + 1.e-8, 1.2, 1.2, 1.2 + 1.0e-10, 1.5,
                 1.999999, 2.0, 2.00000001, 1.e6]
    verts = parse_vertices(
        "0:0, 0:0, 1.0e-7:0, 0.1:0, 0.2:0, 0.2:0, 0.6:0, 0.999999:0, "
        "0.999999:0, 1:0, 1:0, 1.000001:0, 1.000001:0, 1.1:0, 1.2:0, "
        "1.2000001:0, 1.7:0, 1.99999999:0, 2:0")
    total = math.degrees(_angle(verts[0], verts[-1]))
    shape = VShape(1, [verts])
    q = ChainInterpolationQuery(shape)
    n_edges = len(verts) - 1
    assert abs(math.degrees(q.get_length()) - total) <= EPS
    for d in distances:
        r = q.at_distance(math.radians(d))
        assert r.is_valid()
        lat = _lat_deg(r.point)
        if d < 0:
            assert lat == 0.0
            assert r.edge_id == 0
            assert math.degrees(r.distance) == 0.0
        elif d > 2:
            assert abs(lat - 2) <= EPS
            assert r.edge_id == n_edges - 1
            assert abs(math.degrees(r.distance) - total) < 1e-12
        else:
            assert abs(lat - d) <= EPS
            assert 0 <= r.edge_id < n_edges
            assert _lat_deg(verts[r.edge_id]) <= lat + 1e-12
            assert lat <= _lat_deg(verts[r.edge_id + 1]) + 1e-12
            assert abs(math.degrees(r.distance) - d) <= EPS


def test_chains():
    shape = VShape(2, [parse_vertices("0:0, 1:0"),
                       parse_vertices("2:0, 3:0")])
    q = ChainInterpolationQuery(shape)
    q0 = ChainInterpolationQuery(shape, 0)
    q1 = ChainInterpolationQuery(shape, 1)
    r, r0, r1 = q.at_fraction(0.25), q0.at_fraction(0.25), \
        q1.at_fraction(0.25)
    assert r.is_valid() and r0.is_valid() and r1.is_valid()
    assert abs(_lat_deg(r.point) - 1) <= EPS
    assert abs(_lat_deg(r0.point) - 0.5) <= EPS
    assert abs(_lat_deg(r1.point) - 2.5) <= EPS


def test_get_length_at_edge():
    q = ChainInterpolationQuery(VShape(1, []))
    assert q.get_length_at_edge_end(0) == 0.0

    verts = np.array([_pt(0, 0), _pt(0, 1), _pt(0, 3), _pt(0, 6)])
    q = ChainInterpolationQuery(VShape(1, [verts]))
    assert abs(math.degrees(q.get_length()) - 6.0) < 1e-12
    assert q.get_length_at_edge_end(-100) == math.inf
    for eid, want in ((0, 1.0), (1, 3.0), (2, 6.0)):
        assert abs(math.degrees(q.get_length_at_edge_end(eid))
                   - want) < 1e-12
    assert q.get_length_at_edge_end(100) == math.inf

    # polygon with two lax loops; per-chain queries span only their
    # chain's edge range (s2chain_interpolation_query_test.cc:242-295)
    loops = [np.array([_pt(1, 1), _pt(2, 1), _pt(2, 3), _pt(1, 3)]),
             np.array([_pt(0, 0), _pt(0, 4), _pt(3, 4), _pt(3, 0)])]
    shape = VShape(2, loops)
    tol = 0.01
    q0 = ChainInterpolationQuery(shape, 0)
    assert abs(math.degrees(q0.get_length()) - 6.0) <= tol
    assert q0.get_length_at_edge_end(-100) == math.inf
    for eid, want in ((0, 1.0), (1, 3.0), (2, 4.0), (3, 6.0)):
        assert abs(math.degrees(q0.get_length_at_edge_end(eid))
                   - want) <= tol
    for eid in (4, 5, 6, 7, 100):
        assert q0.get_length_at_edge_end(eid) == math.inf
    q1 = ChainInterpolationQuery(shape, 1)
    assert abs(math.degrees(q1.get_length()) - 14.0) <= tol
    for eid in (-100, 0, 1, 2, 3, 100):
        assert q1.get_length_at_edge_end(eid) == math.inf
    for eid, want in ((4, 4.0), (5, 7.0), (6, 11.0), (7, 14.0)):
        assert abs(math.degrees(q1.get_length_at_edge_end(eid))
                   - want) <= tol


def _slice_str(points) -> str:
    out = []
    for p in points:
        lat = _lat_deg(p)
        lng = math.degrees(math.atan2(float(p[1]), float(p[0])))
        out.append((round(lat, 6), round(lng, 6)))
    return ", ".join(f"{a:g}:{b:g}" for a, b in out)


def test_slice():
    assert ChainInterpolationQuery().slice(0, 1) == []
    q = ChainInterpolationQuery(
        VShape(1, [parse_vertices("0:0, 0:1, 0:2")]))
    assert _slice_str(q.slice(0, 1)) == "0:0, 0:1, 0:2"
    assert _slice_str(q.slice(0, 0.5)) == "0:0, 0:1"
    assert _slice_str(q.slice(1, 0.5)) == "0:2, 0:1"
    assert _slice_str(q.slice(0.25, 0.75)) == "0:0.5, 0:1, 0:1.5"
