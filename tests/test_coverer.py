"""Covering + cell-union tests mirroring s2region_coverer_test.cc and
s2cell_union_test.cc property oracles."""

import math

import numpy as np
import pytest

from s2spark.kernels import cellid as c
from s2spark.kernels import cellunion as cu
from s2spark.kernels import coverer as cov
from s2spark.kernels import metrics
from s2spark.kernels.region import Cap, Cell, LatLngRect


def random_cells(rng, n, level=None):
    lv = rng.randint(0, 31, n) if level is None else np.full(n, level)
    leaf = c.from_face_ij(rng.randint(0, 6, n), rng.randint(0, 2**30, n),
                          rng.randint(0, 2**30, n))
    return c.parent(leaf, lv)


def random_cap(rng, min_area=1e-5, max_area=4 * math.pi):
    # random center + area-uniform radius
    z = rng.uniform(-1, 1)
    theta = rng.uniform(0, 2 * math.pi)
    r = math.sqrt(1 - z * z)
    center = (r * math.cos(theta), r * math.sin(theta), z)
    area = min_area * (max_area / min_area) ** rng.uniform()
    angle = math.acos(max(-1.0, min(1.0, 1 - area / (2 * math.pi))))
    return Cap.from_point_angle(center, angle)


class TestCellUnion:
    def test_normalize_siblings_collapse(self):
        f = c.from_face(np.array([2]))
        kids = c.child(np.repeat(f, 4), np.arange(4))
        out = cu.normalize(kids)
        assert out.tolist() == [int(f[0])]

    def test_normalize_drops_contained(self):
        f = c.from_face(np.array([1]))
        child = c.child(f, 2)
        grand = c.child(child, 1)
        out = cu.normalize(np.concatenate([f, child, grand]))
        assert out.tolist() == [int(f[0])]

    def test_normalize_recursive_collapse(self):
        # all 16 grandchildren collapse to the face cell
        f = c.from_face(np.array([4]))
        kids = c.child(np.repeat(f, 4), np.arange(4))
        grands = np.concatenate(
            [c.child(np.repeat(kids[i:i + 1], 4), np.arange(4))
             for i in range(4)])
        out = cu.normalize(grands)
        assert out.tolist() == [int(f[0])]

    def test_union_intersection_difference_properties(self):
        rng = np.random.RandomState(11)
        for _ in range(25):
            x = cu.normalize(random_cells(rng, 8))
            y = cu.normalize(random_cells(rng, 8))
            u = cu.union(x, y)
            inter = cu.intersection(x, y)
            dxy = cu.difference(x, y)
            dyx = cu.difference(y, x)
            assert cu.is_normalized(u)
            assert cu.is_normalized(inter)
            # leaf-count identity: |x| + |y| = |x∪y| + |x∩y|
            assert (cu.leaf_cells_covered(x) + cu.leaf_cells_covered(y)
                    == cu.leaf_cells_covered(u) + cu.leaf_cells_covered(inter))
            # difference identity: |x∪y| = |x∩y| + |x−y| + |y−x|
            assert (cu.leaf_cells_covered(u)
                    == cu.leaf_cells_covered(inter) + cu.leaf_cells_covered(dxy)
                    + cu.leaf_cells_covered(dyx))
            # containment
            assert cu.contains_union(u, x) and cu.contains_union(u, y)
            if inter.size:
                assert cu.contains_union(x, inter)
                assert cu.contains_union(y, inter)

    def test_contains_intersects_probes(self):
        rng = np.random.RandomState(12)
        x = cu.normalize(random_cells(rng, 10))
        probes = random_cells(rng, 500)
        got_c = cu.contains_cell(x, probes)
        got_i = cu.intersects_cell(x, probes)
        # brute-force oracle
        for k in range(probes.size):
            p = probes[k:k + 1]
            exp_c = bool(c.contains(x, np.repeat(p, x.size)).any())
            exp_i = bool((c.contains(x, np.repeat(p, x.size))
                          | c.contains(np.repeat(p, x.size), x)).any())
            assert bool(got_c[k]) == exp_c, k
            assert bool(got_i[k]) == exp_i, k

    def test_expand_level_contains_original(self):
        rng = np.random.RandomState(13)
        x = cu.normalize(random_cells(rng, 5, level=8))
        ex = cu.expand_level(x, 8)
        assert cu.contains_union(ex, x)
        assert cu.is_normalized(ex)

    def test_denormalize_levels(self):
        f = c.from_face(np.array([0]))
        out = cu.denormalize(f, 2, 2)
        levels = c.level(out)
        assert (levels == 2).all()
        assert out.size == 16
        assert cu.leaf_cells_covered(out) == cu.leaf_cells_covered(f)


class TestCoverer:
    def test_random_cells_max_cells_1(self):
        # s2region_coverer_test.cc:73-89: covering of a cell == [cell]
        rng = np.random.RandomState(21)
        rc = cov.RegionCoverer(max_cells=1)
        for cid in random_cells(rng, 50):
            covering = rc.get_covering(cov.CellUnionRegion([int(cid)]))
            assert covering.tolist() == [int(cid)]

    def test_cap_covering_properties(self):
        rng = np.random.RandomState(22)
        rc = cov.RegionCoverer(max_cells=8)
        for _ in range(30):
            cap = random_cap(rng)
            covering = rc.get_covering(cap)
            assert 0 < covering.size
            assert cu.is_normalized(covering) or covering.size <= 8
            # every covering cell may intersect the cap
            for cid in covering:
                assert cap.may_intersect_cell(Cell(int(cid))), \
                    (cap.center, cap.radius2, int(cid))
            # the covering covers the cap: sample points inside the cap
            pts = self._sample_cap_points(rng, cap, 50)
            leaf = c.from_xyz(pts[:, 0], pts[:, 1], pts[:, 2])
            assert cu.intersects_cell(covering, leaf).all()

    def test_interior_covering_contained(self):
        rng = np.random.RandomState(23)
        rc = cov.RegionCoverer(max_cells=8)
        for _ in range(15):
            cap = random_cap(rng, min_area=1e-3)
            interior = rc.get_interior_covering(cap)
            for cid in interior:
                assert cap.contains_cell(Cell(int(cid)))

    def test_determinism(self):
        # s2region_coverer_test.cc:144-147
        rng = np.random.RandomState(24)
        for _ in range(10):
            cap = random_cap(rng)
            rc1 = cov.RegionCoverer(max_cells=8)
            rc2 = cov.RegionCoverer(max_cells=8)
            a = rc1.get_covering(cap)
            b = rc2.get_covering(cap)
            assert a.tolist() == b.tolist()

    def test_min_max_level_mod_constraints(self):
        rng = np.random.RandomState(25)
        for _ in range(15):
            cap = random_cap(rng, min_area=1e-6, max_area=1e-1)
            min_level = rng.randint(0, 10)
            max_level = min_level + rng.randint(0, 10)
            level_mod = rng.randint(1, 4)
            rc = cov.RegionCoverer(max_cells=8, min_level=min_level,
                                   max_level=max_level, level_mod=level_mod)
            covering = rc.get_covering(cap)
            levels = c.level(covering)
            assert (levels >= min_level).all()
            assert (levels <= max_level).all()
            assert (((levels - min_level) % level_mod) == 0).all()

    def test_rect_covering(self):
        rc = cov.RegionCoverer(max_cells=8)
        rect = LatLngRect.from_degrees(40.0, -74.5, 41.0, -73.5)
        covering = rc.get_covering(rect)
        assert 0 < covering.size <= 8
        # corners + center are covered
        for lat, lng in [(40.0, -74.5), (41.0, -73.5), (40.5, -74.0),
                         (40.0, -73.5), (41.0, -74.5)]:
            leaf = c.from_latlng(np.array([lat]), np.array([lng]))
            assert cu.intersects_cell(covering, leaf)[0], (lat, lng)

    def test_canonicalize(self):
        rng = np.random.RandomState(26)
        rc = cov.RegionCoverer(max_cells=8)
        ids = random_cells(rng, 30)
        out = rc.canonicalize_covering(ids)
        assert rc.is_canonical(out)
        # canonicalized covering still covers the originals
        assert cu.contains_union(out, cu.normalize(ids))

    def test_cap_bound_accuracy(self):
        # covering a tiny cap should use deep cells (sanity on metrics)
        rc = cov.RegionCoverer(max_cells=8)
        cap = Cap.from_latlng_radius(47.0, 8.0, metrics.meters_to_radians(100))
        covering = rc.get_covering(cap)
        assert (c.level(covering) >= 13).all()
        assert covering.size <= 8

    @staticmethod
    def _sample_cap_points(rng, cap: Cap, n: int) -> np.ndarray:
        """Deterministic points inside the cap (uniform in the cap)."""
        axis = np.array(cap.center)
        h = cap.radius2 / 2.0  # height of cap = r2/2
        zs = 1.0 - rng.uniform(0, 1, n) * h
        thetas = rng.uniform(0, 2 * math.pi, n)
        rs = np.sqrt(np.maximum(1 - zs * zs, 0))
        local = np.stack([rs * np.cos(thetas), rs * np.sin(thetas), zs], axis=1)
        # rotate local +z onto axis
        z = np.array([0.0, 0.0, 1.0])
        v = np.cross(z, axis)
        s = np.linalg.norm(v)
        cth = float(np.dot(z, axis))
        if s < 1e-12:
            return local if cth > 0 else -local
        vx = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
        rot = np.eye(3) + vx + vx @ vx * ((1 - cth) / (s * s))
        return local @ rot.T


class TestRegionCompositions:
    """RegionUnion / RegionIntersection (s2region_union.cc:81-100,
    s2region_intersection.cc:77-95) as coverable regions."""

    def _two_caps(self, overlap: bool):
        a = Cap.from_latlng_radius(10.0, 20.0, 0.05)
        lng = 20.0 + (2.0 if overlap else 60.0)
        b = Cap.from_latlng_radius(10.0, lng, 0.05)
        return a, b

    def test_union_covering_covers_both_caps(self):
        a, b = self._two_caps(overlap=False)
        rc = cov.RegionCoverer(max_cells=16)
        covering = rc.get_covering(cov.RegionUnion([a, b]))
        rng = np.random.RandomState(3)
        for cap in (a, b):
            pts = TestCoverer._sample_cap_points(rng, cap, 200)
            leaves = c.from_xyz(pts[:, 0], pts[:, 1], pts[:, 2])
            assert cu.contains_cell(covering, leaves).all()
        # every covering cell may-intersect the union
        for cid in covering:
            cell = Cell(int(cid))
            assert a.may_intersect_cell(cell) or b.may_intersect_cell(cell)

    def test_union_contains_cell_any_semantics(self):
        a, b = self._two_caps(overlap=False)
        u = cov.RegionUnion([a, b])
        inner = Cell(int(c.from_latlng(np.array([10.0]),
                                       np.array([20.0]))[0]))
        assert a.contains_cell(inner) == u.contains_cell(inner)
        far = Cell(int(c.parent(c.from_latlng(np.array([-60.0]),
                                              np.array([150.0])), 5)[0]))
        assert not u.contains_cell(far)
        assert not u.may_intersect_cell(far)

    def test_intersection_covering_contains_common_points(self):
        a, b = self._two_caps(overlap=True)
        rc = cov.RegionCoverer(max_cells=16)
        covering = rc.get_covering(cov.RegionIntersection([a, b]))
        rng = np.random.RandomState(7)
        pts = TestCoverer._sample_cap_points(rng, a, 2000)
        in_both = np.array([b.contains_point(p) for p in pts])
        pts = pts[in_both]
        assert pts.size  # the caps do overlap
        leaves = c.from_xyz(pts[:, 0], pts[:, 1], pts[:, 2])
        assert cu.contains_cell(covering, leaves).all()
        # every covering cell must may-intersect BOTH caps
        for cid in covering:
            cell = Cell(int(cid))
            assert a.may_intersect_cell(cell)
            assert b.may_intersect_cell(cell)

    def test_intersection_of_disjoint_caps_is_empty(self):
        a, b = self._two_caps(overlap=False)
        r = cov.RegionIntersection([a, b])
        rc = cov.RegionCoverer(max_cells=16)
        assert rc.get_covering(r).size == 0

    def test_intersection_contains_cell_all_semantics(self):
        a, b = self._two_caps(overlap=True)
        r = cov.RegionIntersection([a, b])
        # a cell inside cap A only is NOT contained in the intersection
        cell_a = Cell(int(c.from_latlng(np.array([10.0]),
                                        np.array([20.0]))[0]))
        if a.contains_cell(cell_a) and not b.contains_cell(cell_a):
            assert not r.contains_cell(cell_a)
        # nested composition: union inside intersection
        nested = cov.RegionIntersection([cov.RegionUnion([a, b]), a])
        assert nested.may_intersect_cell(cell_a)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
