"""Polygon approximate predicates vs the reference's own fixtures
(s2polygon.cc:657-680 ApproxContains/Disjoint/Equals;
s2loop_test.cc:980-1006 BoundaryNear table;
s2polygon.cc:1430-1475 depth-matched polygon wrappers)."""

import math

import numpy as np
import pytest

from s2spark.kernels import polygon_approx as pa
from s2spark.kernels.builder import FULL
from s2spark.kernels.loops import Loop


def lp(text: str) -> Loop:
    return Loop.from_text(text)


DEG = math.pi / 180.0


# --- boundary matching: the reference's BoundaryNear table verbatim
# (s2loop_test.cc:980-1006; TestNear checks BOTH directions) ---

NEAR_CASES = [
    ("0:0, 0:10, 5:5", "0:0.1, -0.1:9.9, 5:5.2", 0.5 * DEG, True),
    ("0:0, 0:3, 0:7, 0:10, 3:7, 5:5",
     "0:0, 0:10, 2:8, 5:5, 4:4, 3:3, 1:1", 1e-3, True),
    # all vertices close to some edge, but not equivalent
    ("0:0, 0:2, 2:2, 2:0", "0:0, 1.9999:1, 0:2, 2:2, 2:0",
     0.5 * DEG, False),
    # the backtracking pair a greedy matcher fails on
    ("0.1:0, 0.1:1, 0.1:2, 0.1:3, 0.1:4, 1:4, 2:4, 3:4, "
     "2:4.1, 1:4.1, 2:4.2, 3:4.2, 4:4.2, 5:4.2",
     "0:0, 0:1, 0:2, 0:3, 0.1:2, 0.1:1, 0.2:2, 0.2:3, "
     "0.2:4, 1:4.1, 2:4, 3:4, 4:4, 5:4", 1.5 * DEG, True),
    ("0.1:0, 0.1:1, 0.1:2, 0.1:3, 0.1:4, 1:4, 2:4, 3:4, "
     "2:4.1, 1:4.1, 2:4.2, 3:4.2, 4:4.2, 5:4.2",
     "0:0, 0:1, 0:2, 0:3, 0.1:2, 0.1:1, 0.2:2, 0.2:3, "
     "0.2:4, 1:4.1, 2:4, 3:4, 4:4, 5:4", 0.5 * DEG, False),
]


@pytest.mark.parametrize("a_txt,b_txt,err,want", NEAR_CASES)
def test_boundary_near_reference_table(a_txt, b_txt, err, want):
    a, b = lp(a_txt), lp(b_txt)
    assert pa.boundary_near(a, b, err) is want
    assert pa.boundary_near(b, a, err) is want  # symmetric


def test_boundary_approx_equals():
    a = lp("0:0, 0:10, 5:5")
    # same loop, rotated start, vertices nudged ~1e-9 rad
    vb = np.roll(a.vertices, -1, axis=0) + 1e-10
    vb /= np.linalg.norm(vb, axis=1, keepdims=True)
    assert pa.boundary_approx_equals(a, Loop(vb), 1e-8)
    assert not pa.boundary_approx_equals(a, Loop(vb), 1e-12)
    # different vertex count -> False even if boundary is near
    assert not pa.boundary_approx_equals(
        a, lp("0:0, 0:5, 0:10, 5:5"), 1e-3)
    assert pa.boundary_near(a, lp("0:0, 0:5, 0:10, 5:5"), 1e-3)


# --- approx contains / disjoint / equals ---

def _top_edge_lat_deg() -> float:
    """Latitude (deg) of the bulge apex of A's top geodesic edge
    (5:5)-(5:-5) at lng 0 — geodesics bulge poleward, so the edge's
    midpoint sits ABOVE lat 5."""
    from s2spark.kernels.region import _latitude
    va = lp("-5:-5, -5:5, 5:5, 5:-5").vertices
    mid = va[2] + va[3]
    mid /= np.linalg.norm(mid)
    return math.degrees(_latitude(mid))


def test_approx_contains_absorbs_protrusion():
    """B pokes ~2e-9 deg outside A (just beyond the geodesic bulge of
    A's top edge): exact containment fails, the tolerance snap
    collapses the sliver (s2polygon.cc:657-661)."""
    a = lp("-5:-5, -5:5, 5:5, 5:-5")
    apex = _top_edge_lat_deg() + 0.01
    b = Loop.from_text(f"2:-0.5, 2:0.5, {apex!r}:0")
    assert not pa.approx_contains(a, b, 1e-9)
    # at tol > the 0.01-deg protrusion, A's top edge snaps THROUGH
    # the apex site (edge-to-site snap) and the sliver vanishes
    assert pa.approx_contains(a, b, 2e-3)
    # and a clearly-outside B stays not-contained at any sane tol
    c = lp("2:-2, 2:2, 7:0")
    assert not pa.approx_contains(a, c, 1e-6)
    # trivially-contained stays contained
    assert pa.approx_contains(a, lp("-1:-1, -1:1, 1:1, 1:-1"), 1e-15)


def test_approx_disjoint_absorbs_sliver_overlap():
    a = lp("-5:-5, -5:5, 5:5, 5:-5")
    # B dips ~1e-8 deg below the bulge apex of A's top edge over a
    # +-1e-4 deg lng window: a 4-vertex sliver overlap
    lo = _top_edge_lat_deg() - 0.01
    b = Loop.from_text(
        f"{lo!r}:-0.5, {lo!r}:0.5, 8:0.5, 8:-0.5")
    assert not pa.approx_disjoint(a, b, 1e-9)
    assert pa.approx_disjoint(a, b, 2e-3)
    far = lp("20:20, 20:25, 25:25, 25:20")
    assert pa.approx_disjoint(a, far, 1e-15)
    big_overlap = lp("0:-2, 0:2, 8:2, 8:-2")
    assert not pa.approx_disjoint(a, big_overlap, 1e-6)


def test_approx_equals_perturbed_vertices():
    a = lp("-5:-5, -5:5, 5:5, 5:-5")
    v = a.vertices + np.array([1e-10, -1e-10, 1e-10])
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    b = Loop(v)
    assert pa.approx_equals(a, b, 1e-6)
    assert not pa.approx_equals(a, lp("-5:-5, -5:5, 6:5, 5:-5"), 1e-6)
    # identical polygons are approx-equal at the default merge radius
    assert pa.approx_equals(a, Loop(a.vertices.copy()))


def test_full_empty_regions():
    assert pa.approx_equals(FULL, FULL, 1e-9)
    assert pa.approx_equals([], [], 1e-9)
    assert not pa.approx_equals(FULL, [], 1e-9)
    assert pa.approx_contains(FULL, lp("0:0, 0:1, 1:1"), 1e-12)
    assert pa.approx_disjoint([], lp("0:0, 0:1, 1:1"), 1e-12)
    assert pa.polygon_boundary_near(FULL, FULL, 1e-9)
    assert not pa.polygon_boundary_near(FULL, [], 1e-9)


def test_polygon_wrappers_depth_matching():
    """Loops match only at equal nesting depth, in any order
    (s2polygon.cc:1430-1475)."""
    shell_a = lp("-10:-10, -10:10, 10:10, 10:-10")
    hole_a = lp("-2:-2, 2:-2, 2:2, -2:2")  # CW = hole by parity
    shell_b = lp("-10:-10.0000001, -10:10, 10:10, 10:-10")
    hole_b = lp("-2:-2.0000001, 2:-2, 2:2, -2:2")
    assert pa.polygon_boundary_near([shell_a, hole_a],
                                    [hole_b, shell_b], 1e-6)
    assert not pa.polygon_boundary_near([shell_a, hole_a],
                                        [shell_b], 1e-6)
    # same-size-but-swapped-depth loops must NOT cross-match: compare
    # {shell, hole} against {shell', hole'} where hole' ~ shell size
    # at different depth
    other = [shell_b, lp("-3:-3, 3:-3, 3:3, -3:3")]
    assert not pa.polygon_boundary_near([shell_a, hole_a], other, 1e-6)


def test_reference_cell_pattern_approx_contains():
    """The s2polygon_test.cc:410-447 pattern at fixed cells: the
    exact intersection of a cell polygon with its child may leak
    outside by tiny amounts; ApproxContains at the merge radius must
    always hold."""
    from s2spark.kernels import cellid as ck
    from s2spark.kernels.builder import overlay_geometry
    from s2spark.kernels.region import Cell

    def cell_loop(cid: int) -> Loop:
        c = Cell(cid)
        return Loop(np.array([c.get_vertex(k) for k in range(4)]))

    rng = np.random.default_rng(19)
    for _ in range(10):
        v = rng.normal(size=3)
        v /= np.linalg.norm(v)
        leaf = int(ck.as_i64(ck.from_xyz(*[np.array([x]) for x in v]))[0])
        cid = int(ck.as_i64(ck.parent(np.array([leaf]), 10))[0])
        parent = cell_loop(cid)
        child = cell_loop(int(ck.as_i64(
            ck.child(np.array([cid]), 0))[0]))
        # parent and child share PARTIAL collinear edges — pre-snap
        # first so the coincident sub-edges are bit-identical (the
        # reference's InitToIntersection snap rounding does the same)
        tol = pa.INTERSECTION_MERGE_RADIUS * 100
        p2, c2 = pa._presnap(parent, child, tol)
        chains = overlay_geometry(p2, c2, "intersection")
        inter = [Loop(c) for c in chains if len(c) >= 3]
        assert inter, cid
        assert pa.approx_contains(parent, inter, tol)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
