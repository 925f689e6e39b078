"""Loop containment tests ported from s2loop_test.cc fixtures
(s2loop_test.cc:85-236 named loops; :492-530 containment cases)."""

import math

import numpy as np
import pytest

from s2spark.kernels import cellid as c
from s2spark.kernels import cellunion as cu
from s2spark.kernels import coverer as cov
from s2spark.kernels.loops import ORIGIN, Loop, Polygon
from s2spark.kernels.region import Cell

# named fixtures (s2loop_test.cc:140-197)
LOOPS = {
    "north_hemi": "0:-180, 0:-90, 0:0, 0:90",
    "north_hemi3": "0:-180, 0:-60, 0:60",
    "south_hemi": "0:90, 0:0, 0:-90, 0:-180",
    "west_hemi": "0:-180, -90:0, 0:0, 90:0",
    "east_hemi": "90:0, 0:0, -90:0, 0:-180",
    "near_hemi": "0:-90, -90:0, 0:90, 90:0",
    "far_hemi": "90:0, 0:90, -90:0, 0:-90",
    "candy_cane": "-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70",
    "small_ne_cw": "35:20, 45:20, 40:25",
    "arctic_80": "80:-150, 80:-30, 80:90",
    "antarctic_80": "-80:120, -80:0, -80:-120",
    "line_triangle": "0:1, 0:2, 0:3",
}


def L(name):
    return Loop.from_text(LOOPS[name])


def pt(lat, lng):
    rad = math.radians
    return (math.cos(rad(lng)) * math.cos(rad(lat)),
            math.sin(rad(lng)) * math.cos(rad(lat)), math.sin(rad(lat)))


class TestLoopContains:
    def test_hemispheres(self):
        # s2loop_test.cc:507-514, including vertex-rotation invariance
        north, south = L("north_hemi"), L("south_hemi")
        west, east = L("west_hemi"), L("east_hemi")
        for _ in range(4):
            assert north.contains_point((0, 0, 1))
            assert not north.contains_point((0, 0, -1))
            assert not south.contains_point((0, 0, 1))
            assert south.contains_point((0, 0, -1))
            assert not west.contains_point((0, 1, 0))
            assert west.contains_point((0, -1, 0))
            assert east.contains_point((0, 1, 0))
            assert not east.contains_point((0, -1, 0))
            north = Loop(np.roll(north.vertices, -1, axis=0))
            south = Loop(np.roll(south.vertices, -1, axis=0))
            west = Loop(np.roll(west.vertices, -1, axis=0))
            east = Loop(np.roll(east.vertices, -1, axis=0))

    def test_candy_cane(self):
        # s2loop_test.cc:499
        assert L("candy_cane").contains_point(pt(5, 71))

    def test_arctic_antarctic(self):
        arctic, antarctic = L("arctic_80"), L("antarctic_80")
        assert arctic.contains_point((0, 0, 1))
        assert not arctic.contains_point((0, 0, -1))
        assert antarctic.contains_point((0, 0, -1))
        assert not antarctic.contains_point((0, 0, 1))
        north = L("north_hemi")
        # north_hemi contains arctic_80 (sampled) and is disjoint from
        # antarctic_80 (s2loop_test.cc relation matrix)
        samples = np.array([pt(85, lng) for lng in range(-180, 180, 30)])
        assert north.contains_points(samples).all()
        assert arctic.contains_points(samples).all()
        south_samples = np.array([pt(-85, lng) for lng in range(-180, 180, 30)])
        assert not north.contains_points(south_samples).any()
        assert antarctic.contains_points(south_samples).all()

    def test_small_cw_loop(self):
        # small_ne_cw is clockwise: contains almost everything
        small = L("small_ne_cw")
        assert small.contains_point((0, 0, -1))
        assert small.contains_point((0, 0, 1))
        assert not small.contains_point(pt(40, 22))

    def test_cell_vertex_contained_by_exactly_one_cell_loop(self):
        # s2loop_test.cc:522-560: each cell vertex is contained by exactly
        # one of the adjacent cell-boundary loops (vertex-model parity).
        for level in range(0, 3):
            cells = []
            cur = c.child_begin(c.from_face(np.array([0])), level)
            # iterate all cells at this level over all faces
            n_cells = 6 * 4 ** level
            ids = []
            for _ in range(n_cells):
                ids.append(int(cur[0]))
                cur = c.next_cell(cur)
            loops = []
            vertices = []
            for cid in ids:
                cell = Cell(cid)
                vs = [cell.get_vertex(k) for k in range(4)]
                loops.append(Loop(np.array(vs)))
                vertices.extend(vs)
            # deduplicate vertices
            uniq = {}
            for v in vertices:
                uniq[v] = None
            for v in list(uniq)[:: max(1, len(uniq) // 24)]:
                count = sum(lp.contains_point(v) for lp in loops)
                assert count == 1, (level, v, count)

    def test_origin_inside_consistency(self):
        for name, text in LOOPS.items():
            loop = Loop.from_text(text)
            assert loop.origin_inside == loop.contains_point(ORIGIN), name

    def test_degenerate_line_triangle(self):
        # degenerate loop relies on exact/symbolic predicates
        tri = L("line_triangle")
        assert isinstance(tri.origin_inside, bool)
        p = pt(0, 2)  # on the degenerate "boundary"
        tri.contains_point(p)  # must not crash; verdict deterministic
        assert tri.contains_point(p) == tri.contains_point(p)


class TestLoopArea:
    def test_hemisphere_area(self):
        assert abs(L("north_hemi").get_area() - 2 * math.pi) < 1e-9
        assert abs(L("south_hemi").get_area() - 2 * math.pi) < 1e-9

    def test_small_loop_area(self):
        arctic = L("arctic_80")
        # spherical cap at 80 deg lat has area 2*pi*(1-sin80); triangle is
        # smaller but same order
        assert 0 < arctic.get_area() < 2 * math.pi * (1 - math.sin(
            math.radians(80))) * 1.5

    def test_cw_loop_area_is_complement(self):
        small = L("small_ne_cw")
        assert small.get_area() > 4 * math.pi - 0.1


class TestLoopCovering:
    def test_loop_covering_covers_interior(self):
        rc = cov.RegionCoverer(max_cells=16)
        arctic = L("arctic_80")
        covering = rc.get_covering(arctic)
        assert covering.size <= 16
        samples = np.array([pt(85, lng) for lng in range(-180, 180, 20)]
                           + [pt(89, 10), pt(81, -100)])
        leaf = c.from_xyz(samples[:, 0], samples[:, 1], samples[:, 2])
        assert cu.intersects_cell(covering, leaf).all()
        # every covering cell may-intersect the loop
        for cid in covering:
            assert arctic.may_intersect_cell(Cell(int(cid)))

    def test_interior_covering_contained(self):
        rc = cov.RegionCoverer(max_cells=12)
        arctic = L("arctic_80")
        interior = rc.get_interior_covering(arctic)
        for cid in interior:
            assert arctic.contains_cell(Cell(int(cid)))
        # interior covering cells' centers are inside
        if interior.size:
            x, y, z = c.to_point(interior)
            pts = np.stack([x, y, z], axis=1)
            assert arctic.contains_points(pts).all()


class TestPolygon:
    def test_annulus(self):
        # XOR semantics: each loop contains its own region; a hole is a
        # nested loop (contained in the shell), wound the same way
        outer = Loop.from_text("-10:-10, -10:10, 10:10, 10:-10")
        hole = Loop.from_text("-2:-2, -2:2, 2:2, 2:-2")
        poly = Polygon([outer, hole])
        assert poly.contains_points(np.array([pt(5, 5)]))[0]
        assert not poly.contains_points(np.array([pt(0, 0)]))[0]
        assert not poly.contains_points(np.array([pt(50, 50)]))[0]


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_text_format_round_trip():
    """Writer <-> parser round trip (s2text_format.cc:322-345): with
    roundtrip precision the re-parsed vertices are bit-identical."""
    from s2spark.kernels.loops import parse_vertices, to_text
    src = "0:178, -1:180, 0:-179, 1:-180"
    v = parse_vertices(src)
    back = parse_vertices(to_text(v, roundtrip=True))
    assert (v == back).all()
    # default precision round-trips the fixture's decimal form
    assert to_text(parse_vertices("80:-150, 80:-30, 80:90")) \
        == "80:-150, 80:-30, 80:90"
