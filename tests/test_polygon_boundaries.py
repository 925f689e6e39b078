"""BuildPolygonBoundaries parity with the reference test table
(s2shapeutil_build_polygon_boundaries_test.cc:45-176), including the
12-component ComplexTest1 nesting."""

import pytest

from s2spark.kernels.loops import parse_vertices
from s2spark.kernels.shapeutil import build_polygon_boundaries


def comp(*loop_texts):
    return [parse_vertices(t) for t in loop_texts]


def faces_of(components):
    return build_polygon_boundaries(components)


def sorted_faces(faces):
    return sorted(sorted(f) for f in faces)


def test_no_components():
    assert faces_of([]) == []


def test_one_loop():
    faces = faces_of([comp("0:0, 1:0, 0:1", "0:0, 0:1, 1:0")])
    assert len(faces) == 2


def test_two_loops_same_component():
    faces = faces_of([comp("0:0, 1:0, 0:1", "0:0, 0:1, 1:0",
                           "1:0, 0:1, 1:1")])
    assert len(faces) == 3


def test_two_nested_loops():
    faces = faces_of([comp("0:0, 3:0, 0:3", "0:0, 0:3, 3:0"),
                      comp("1:1, 2:0, 0:2", "1:1, 0:2, 2:0")])
    assert len(faces) == 3
    # faces[0] = the polygon bounded by a1 with b's outer loop nested
    # inside (children first, then the indexed loop)
    assert faces[0] == [(1, 0), (0, 1)]


def test_two_loops_different_components():
    faces = faces_of([comp("0:0, 1:0, 0:1", "0:0, 0:1, 1:0"),
                      comp("0:2, 1:2, 0:3", "0:2, 0:3, 1:2")])
    assert len(faces) == 3
    # the depth-0 face holds both outer loops
    assert faces[2] == [(0, 0), (1, 0)]


def test_one_degenerate_loop():
    faces = faces_of([comp("0:0, 1:0, 0:0")])
    assert len(faces) == 1


def test_two_degenerate_loops():
    faces = faces_of([comp("0:0, 1:0, 0:0"), comp("2:0, 3:0, 2:0")])
    assert len(faces) == 1
    assert len(faces[0]) == 2


def test_complex_nesting():
    # the reference's ComplexTest1: 4-quadrant square with nested
    # islands/lakes and degenerate components at several depths
    components = [
        comp("0:0, 25:0, 50:0, 50:25, 50:50, 25:50, 0:50, 0:50",
             "0:0, 0:25, 25:25, 25:0",
             "0:25, 0:50, 25:50, 25:25",
             "25:0, 25:25, 50:25, 50:0",
             "25:25, 25:50, 50:50, 50:25"),
        comp("0:-10, 10:-10"),
        comp("5:5, 20:5, 20:10, 5:10",
             "5:5, 5:10, 10:10, 10:5",
             "10:5, 10:10, 15:10, 15:5",
             "15:5, 15:10, 20:10, 20:5"),
        comp("5:15, 20:15, 20:20, 5:20", "5:15, 5:20, 20:20, 20:15"),
        comp("2:5, 2:10, 2:5"),
        comp("11:6, 14:6, 14:9, 11:9", "11:6, 11:9, 14:9, 14:6"),
        comp("16:6, 19:9, 16:6"),
        comp("30:5, 45:5, 45:20, 30:20", "30:5, 30:20, 45:20, 45:5"),
        comp("30:30, 40:30, 30:30"),
        comp("30:35, 40:35, 30:35"),
        comp("30:40, 40:40, 30:40"),
        comp("30:45, 40:45, 30:45"),
    ]
    # expected faces in (component, loop) coordinates, translated
    # from the reference's expected_faces (shape pointers)
    a0, a1, a2, a3, a4 = [(0, i) for i in range(5)]
    b0 = (1, 0)
    a1_a0, a1_a1, a1_a2, a1_a3 = [(2, i) for i in range(4)]
    a1_b0, a1_b1 = (3, 0), (3, 1)
    a1_c0 = (4, 0)
    a1_a2_a0, a1_a2_a1 = (5, 0), (5, 1)
    a1_a3_a0 = (6, 0)
    a3_a0, a3_a1 = (7, 0), (7, 1)
    a4_a0, a4_b0, a4_c0, a4_d0 = (8, 0), (9, 0), (10, 0), (11, 0)
    expected = [
        [a0, b0],
        [a1, a1_a0, a1_b0, a1_c0],
        [a1_a1],
        [a1_a2, a1_a2_a0],
        [a1_a2_a1],
        [a1_a3, a1_a3_a0],
        [a1_b1],
        [a2],
        [a3, a3_a0],
        [a3_a1],
        [a4, a4_a0, a4_b0, a4_c0, a4_d0],
    ]
    faces = faces_of(components)
    assert len(faces) == len(expected)
    assert sorted_faces(faces) == sorted_faces(expected)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
