"""S2ContainsVertexQuery battery — s2contains_vertex_query_test.cc
verbatim (Undetermined, Contained/NotContainedWithDuplicates, and the
AngleContainsVertex compatibility sweeps) against
validation._contains_vertex."""

import numpy as np

from s2spark.kernels import pointutil, predicates
from s2spark.kernels.validation import _contains_vertex


def pt(s):
    lat, lng = (float(x) for x in s.split(":"))
    phi, lam = np.radians(lat), np.radians(lng)
    return (float(np.cos(phi) * np.cos(lam)),
            float(np.cos(phi) * np.sin(lam)), float(np.sin(phi)))


class Query:
    """AddEdge(target, +1/-1) adapter over _contains_vertex's
    edge-tuple interface: +1 = outgoing (v, w), -1 = incoming."""

    def __init__(self, v):
        self.v = v
        self.edges = []

    def add_edge(self, w, sign):
        if sign > 0:
            self.edges.append((0, 0, self.v, w))
        else:
            self.edges.append((0, 0, w, self.v))

    def result(self):
        dup, sign = _contains_vertex(self.v, self.edges)
        return dup, sign


def test_undetermined():
    q = Query(pt("1:2"))
    q.add_edge(pt("3:4"), 1)
    q.add_edge(pt("3:4"), -1)
    dup, sign = q.result()
    assert sign == 0 and not dup


def test_contained_with_duplicates():
    q = Query(pt("0:0"))
    q.add_edge(pt("3:-3"), -1)
    q.add_edge(pt("1:-5"), 1)
    q.add_edge(pt("2:-4"), 1)
    q.add_edge(pt("1:-5"), -1)
    dup, sign = q.result()
    assert sign == 1 and not dup
    # incoming/outgoing to 1:-5 cancel; one more isn't a duplicate
    q.add_edge(pt("1:-5"), -1)
    dup, _ = q.result()
    assert not dup
    # 3:-3 twice incoming IS a duplicate
    q.add_edge(pt("3:-3"), -1)
    dup, _ = q.result()
    assert dup


def test_not_contained_with_duplicates():
    q = Query(pt("1:1"))
    q.add_edge(pt("1:-5"), 1)
    q.add_edge(pt("2:-4"), -1)
    q.add_edge(pt("3:-3"), 1)
    q.add_edge(pt("1:-5"), -1)
    dup, sign = q.result()
    assert sign == -1 and not dup
    q.add_edge(pt("1:-5"), -1)
    dup, _ = q.result()
    assert not dup
    q.add_edge(pt("3:-3"), 1)
    dup, _ = q.result()
    assert dup


def _regular_points(center, radius_rad, n):
    return pointutil.make_regular_loop(center, radius_rad, n)


def test_compatible_with_angle_contains_vertex():
    points = _regular_points(np.asarray(pt("89:1")), np.radians(5), 10)
    n = len(points)
    for i in range(n):
        a = tuple(points[i])
        b = tuple(points[(i + 1) % n])
        c = tuple(points[(i + 2) % n])
        q = Query(b)
        q.add_edge(a, -1)
        q.add_edge(c, 1)
        dup, sign = q.result()
        assert (sign > 0) == bool(
            predicates.angle_contains_vertex(a, b, c))
        assert not dup


def test_compatible_with_angle_contains_vertex_degenerate():
    a = (1.0, 0.0, 0.0)
    b = (0.0, 1.0, 0.0)
    q = Query(b)
    q.add_edge(a, -1)
    q.add_edge(a, 1)
    dup, sign = q.result()
    assert (sign > 0) == bool(predicates.angle_contains_vertex(a, b, a))
    assert not dup
