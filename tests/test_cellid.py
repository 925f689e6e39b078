"""Golden-fixture tests for s2spark.kernels.cellid.

Fixture values ported from the reference's own unit tests
(/root/reference/src/s2/s2cell_id_test.cc) — bit-exact expectations.
"""

import numpy as np
import pytest

from s2spark.kernels import cellid as c


def U(*vals):
    return np.array(vals, dtype=np.uint64)


def dbg(s):
    return c.from_debug_string(s)


class TestBasics:
    def test_face_cells(self):
        # FromFacePosLevel(face, 0, 0) == FromFace(face) (test.cc:95-99)
        fc = c.from_face(np.arange(6))
        fpl = c.from_face_pos_level(np.arange(6), np.zeros(6, dtype=np.int64),
                                    np.zeros(6, dtype=np.int64))
        assert (fc == fpl).all()
        assert (c.face(fc) == np.arange(6)).all()
        assert (c.level(fc) == 0).all()
        assert c.is_face(fc).all()
        assert c.is_valid(fc).all()

    def test_parent_child_relationships(self):
        # test.cc:101-125
        cid = c.from_face_pos_level(np.array([3]), np.array([0x12345678]),
                                    np.array([c.MAX_LEVEL - 4]))
        assert c.is_valid(cid).all()
        assert c.face(cid)[0] == 3
        assert c.pos(cid)[0] == 0x12345700
        assert c.level(cid)[0] == c.MAX_LEVEL - 4
        assert not c.is_leaf(cid)[0]

        assert c.pos(c.child_begin(cid, c.level(cid) + 2))[0] == 0x12345610
        assert c.pos(c.child_begin(cid))[0] == 0x12345640
        assert c.pos(c.parent1(cid))[0] == 0x12345400
        assert c.pos(c.parent(cid, c.level(cid) - 2))[0] == 0x12345000

        assert c.child_begin(cid)[0] < cid[0]
        assert c.child_end(cid)[0] > cid[0]
        nxt4 = c.next_cell(c.next_cell(c.next_cell(c.next_cell(
            c.child_begin(cid)))))
        assert c.child_end(cid)[0] == nxt4[0]
        assert c.range_min(cid)[0] == c.child_begin(cid, c.MAX_LEVEL)[0]
        # range_max().next() == child_end(kMaxLevel); next() on a leaf adds 2
        assert c.next_cell(c.range_max(cid))[0] == c.child_end(cid, c.MAX_LEVEL)[0]
        # cells are the Hilbert position of their center
        assert 2 * int(cid[0]) == int(c.range_min(cid)[0]) + int(c.range_max(cid)[0])

    def test_containment(self):
        cid = c.from_face_pos_level(np.array([3]), np.array([0x12345678]),
                                    np.array([20]))
        ch = c.child(c.child(cid, 1), 3)
        assert c.contains(cid, ch).all()
        assert not c.contains(ch, cid).any()
        assert c.intersects(cid, ch).all()
        assert c.intersects(ch, cid).all()
        sib = c.next_cell(cid)
        assert not c.contains(cid, sib).any()
        assert not c.intersects(cid, sib).any()

    def test_common_ancestor_level(self):
        # test.cc:260-297 (representative cases)
        f0 = c.from_face(np.array([0]))
        f5 = c.from_face(np.array([5]))
        assert c.common_ancestor_level(f0, f0)[0] == 0
        assert c.common_ancestor_level(
            c.child_begin(f0, 30), c.child_begin(f0, 30))[0] == 30
        assert c.common_ancestor_level(f0, f5)[0] == -1
        a = c.child_begin(c.child_begin(f0, 2), 5)
        b = c.next_cell(c.child_begin(f0, 2))
        assert c.common_ancestor_level(a, c.child_begin(b, 5))[0] == 1


class TestTokens:
    def test_roundtrip_all_levels(self):
        rng = np.random.RandomState(7)
        leaf = c.from_face_ij(rng.randint(0, 6, 10000),
                              rng.randint(0, 2**30, 10000),
                              rng.randint(0, 2**30, 10000))
        ids = c.parent(leaf, rng.randint(0, 31, 10000))
        toks = c.to_token(ids)
        assert max(len(t) for t in toks) <= 16
        assert (c.from_token(toks) == ids).all()

    def test_special_tokens(self):
        assert c.to_token(U(0)) == ["X"]
        assert c.from_token(["X"])[0] == 0
        # sentinel = ~0
        sent = U(0xFFFFFFFFFFFFFFFF)
        assert c.from_token(c.to_token(sent))[0] == sent[0]
        # invalid face 7
        f7 = (np.uint64(7) << np.uint64(61)) + c.lsb_for_level(0)
        assert c.from_token(c.to_token(U(int(f7))))[0] == f7

    def test_malformed_tokens(self):
        # test.cc:336-341
        bad = c.from_token(["876b e99", "876bee99\n", "876[ee99", " 876bee99"])
        assert (bad == 0).all()

    def test_known_token(self):
        # "89c25" (test.cc:791) parses and round-trips
        cid = c.from_token(["89c25"])
        assert cid[0] != 0
        assert c.to_token(cid) == ["89c25"]


class TestInverses:
    def test_leaf_latlng_roundtrip(self):
        # test.cc:299-310 (200k in reference; 50k here, seeded)
        rng = np.random.RandomState(42)
        ids = c.from_face_ij(rng.randint(0, 6, 50000),
                             rng.randint(0, 2**30, 50000),
                             rng.randint(0, 2**30, 50000))
        assert c.is_leaf(ids).all()
        assert (c.level(ids) == c.MAX_LEVEL).all()
        lat, lng = c.to_latlng(ids)
        assert (c.from_latlng(lat, lng) == ids).all()

    def test_ffij_roundtrip(self):
        rng = np.random.RandomState(1)
        f = rng.randint(0, 6, 50000)
        i = rng.randint(0, 2**30, 50000)
        j = rng.randint(0, 2**30, 50000)
        ids = c.from_face_ij(f, i, j)
        f2, i2, j2 = c.to_face_ij_orientation(ids)
        assert (f2 == f).all() and (i2 == i).all() and (j2 == j).all()


class TestDebugStrings:
    def test_output_operator(self):
        # test.cc:773-777: 0xbb04000000000000 -> "5/31200"
        assert c.to_debug_string(U(0xbb04000000000000)) == ["5/31200"]
        assert dbg("5/31200") == 0xbb04000000000000

    def test_faces(self):
        for f in range(6):
            assert dbg(f"{f}/") == int(c.from_face(np.array([f]))[0])


class TestNeighbors:
    def test_face1_edge_neighbors(self):
        # test.cc:570-577: edge neighbors of face 1 are faces [5,3,2,0]
        nbrs = c.get_edge_neighbors(c.from_face(np.array([1])))[0]
        assert c.is_face(nbrs).all()
        assert c.face(nbrs).tolist() == [5, 3, 2, 0]

    def test_corner_cell_edge_neighbors_all_levels(self):
        # test.cc:579-593
        kMaxIJ = c.MAX_SIZE - 1
        for level in range(1, c.MAX_LEVEL + 1):
            cid = c.parent(c.from_face_ij([1], [0], [0]), level)
            nbrs = c.get_edge_neighbors(cid)[0]
            size = 1 << (c.MAX_LEVEL - level)
            expected = [
                c.parent(c.from_face_ij([5], [kMaxIJ], [kMaxIJ]), level)[0],
                c.parent(c.from_face_ij([1], [size], [0]), level)[0],
                c.parent(c.from_face_ij([1], [0], [size]), level)[0],
                c.parent(c.from_face_ij([0], [kMaxIJ], [0]), level)[0],
            ]
            assert nbrs.tolist() == [int(e) for e in expected], level

    def test_vertex_neighbors_face2_center(self):
        # test.cc:595-604: S2CellId(S2Point(0,0,1)) at level 5
        cid = c.from_xyz(np.array([0.0]), np.array([0.0]), np.array([1.0]))
        nbrs = sorted(c.append_vertex_neighbors(cid, 5)[0].tolist())
        expected = sorted(
            int(c.parent(c.from_face_ij([2], [(1 << 29) - (i < 2)],
                                        [(1 << 29) - (i == 0 or i == 3)]), 5)[0])
            for i in range(4))
        assert nbrs == expected

    def test_cube_corner_vertex_neighbors(self):
        # test.cc:607-614: corner of faces 0,4,5 has exactly 3 neighbors
        cid = c.from_face_pos_level(np.array([0]), np.array([0]),
                                    np.array([c.MAX_LEVEL]))
        nbrs = sorted(c.append_vertex_neighbors(cid, 0)[0].tolist())
        assert len(nbrs) == 3
        expected = sorted(int(c.from_face(np.array([f]))[0]) for f in (0, 4, 5))
        assert nbrs == expected

    def test_corner_cell_has_7_neighbors(self):
        # test.cc:634-647
        cid = np.array([dbg("3/0000")], dtype=np.uint64)
        out = c.append_all_neighbors(cid, int(c.level(cid)[0]))[0]
        got = sorted(out.tolist())
        expected = sorted(dbg(s) for s in
                          ["1/2221", "1/2222", "2/3330", "2/3333", "2/3333",
                           "3/0001", "3/0002", "3/0003"])
        assert got == expected

    def test_all_top_level_face_neighbors(self):
        # test.cc:649-660
        cid = np.array([dbg("3/")], dtype=np.uint64)
        out = sorted(c.append_all_neighbors(cid, 0)[0].tolist())
        expected = sorted(dbg(s) for s in
                          ["1/", "2/", "2/", "2/", "4/", "5/", "5/", "5/"])
        assert out == expected

    def test_zurich_neighbors(self):
        # test.cc:662-675
        cid = np.array([dbg("2/033020001100")], dtype=np.uint64)
        out = sorted(c.append_all_neighbors(cid, int(c.level(cid)[0]))[0].tolist())
        expected = sorted(dbg(s) for s in [
            "2/033020001030", "2/033020001033", "2/033020001101",
            "2/033020001102", "2/033020001103", "2/033031110010",
            "2/033031110011", "2/033031110322"])
        assert out == expected

    def test_all_neighbors_properties(self):
        # Property oracle mirroring test.cc:546-567: for nbr_level == level,
        # the distinct all-neighbors are 8 (7 at a cube corner), all at
        # nbr_level, none a descendant of the cell, and each shares a
        # boundary (its edge- or vertex-neighbor set contains the cell's
        # ancestor/itself).
        rng = np.random.RandomState(3)
        for _ in range(60):
            f = rng.randint(0, 6)
            i = rng.randint(0, 2**30)
            j = rng.randint(0, 2**30)
            lev = rng.randint(1, 29)
            cid = c.parent(c.from_face_ij([f], [i], [j]), lev)
            got = c.append_all_neighbors(cid, lev)[0]
            distinct = set(got.tolist())
            assert len(distinct) in (7, 8)
            garr = np.array(sorted(distinct), dtype=np.uint64)
            assert (c.level(garr) == lev).all()
            assert not c.contains(cid, garr).any()
            # symmetry: the cell appears among each neighbor's all-neighbors
            for g in garr:
                back = set(c.append_all_neighbors(
                    np.array([g], dtype=np.uint64), lev)[0].tolist())
                assert int(cid[0]) in back


class TestCenter:
    def test_center_si_ti(self):
        # test.cc:133-160: center si/ti of FromFacePosLevel(3, 0x12345678, lev)
        for lev, low_bits in [(c.MAX_LEVEL, 1), (c.MAX_LEVEL - 1, 2)]:
            cid = c.from_face_pos_level(np.array([3]), np.array([0x12345678]),
                                        np.array([lev]))
            _, si, ti = c.get_center_si_ti(cid)
            assert si[0] & ((1 << (c.MAX_LEVEL - lev + 1)) - 1) == low_bits
            assert ti[0] & ((1 << (c.MAX_LEVEL - lev + 1)) - 1) == low_bits

    def test_to_point_consistency(self):
        # center point of a cell must map back to the cell at its level
        rng = np.random.RandomState(9)
        leaf = c.from_face_ij(rng.randint(0, 6, 2000),
                              rng.randint(0, 2**30, 2000),
                              rng.randint(0, 2**30, 2000))
        ids = c.parent(leaf, rng.randint(0, 31, 2000))
        x, y, z = c.to_point(ids)
        back = c.parent(c.from_xyz(x, y, z), c.level(ids))
        assert (back == ids).all()


class TestMaximumTile:
    def test_range_to_cells_roundtrip(self):
        rng = np.random.RandomState(5)
        for _ in range(50):
            a = c.from_face_ij(rng.randint(0, 6, 2),
                               rng.randint(0, 2**30, 2),
                               rng.randint(0, 2**30, 2))
            lo, hi = int(a.min()), int(a.max())
            if lo == hi:
                continue
            cells = c.range_to_cells(lo, hi)
            # cells exactly tile the leaf range [lo, hi): contiguous in
            # leaf-iterator order (next() on a leaf advances by 2)
            assert int(c.range_min(cells[:1])[0]) == lo
            cur = lo
            for cell in cells:
                arr = np.array([cell], dtype=np.uint64)
                assert int(c.range_min(arr)[0]) == cur
                cur = int(c.next_cell(c.range_max(arr))[0])
            assert cur == hi


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_expanded_by_distance_uv():
    """Mirror of the reference's randomized guarantee test
    (s2cell_id_test.cc:700-744): expansion contains everything within
    `distance` of the rect; shrink excludes the collar."""
    import math

    import numpy as np

    from s2spark.kernels import cellid as ci
    from s2spark.kernels.region import Cell

    rng = np.random.default_rng(23)
    for _ in range(25):
        # random cell's uv bound on a random face
        leaf = int(ci.as_i64(ci.parent(
            np.array([(rng.integers(0, 6) << 61) | (1 << 60)],
                     dtype=np.uint64),
            np.int64(int(rng.integers(0, 10)))))[0])
        c = Cell(leaf)
        bound = ((c.u_lo, c.u_hi), (c.v_lo, c.v_hi))
        dist = math.radians(rng.uniform(0.1, 10.0))
        grown = ci.expanded_by_distance_uv(bound, dist)
        shrunk = ci.expanded_by_distance_uv(bound, -dist)

        def contains(rect, u, v):
            return (rect[0][0] <= u <= rect[0][1]
                    and rect[1][0] <= v <= rect[1][1])

        def closest_on_boundary(u, v, rect):
            """Nearest uv point on the rect BOUNDARY (reference's
            ProjectToBoundary: interior points project to the nearest
            edge, exterior points clamp)."""
            (a0, a1), (b0, b1) = rect
            cu = min(max(u, a0), a1)
            cv = min(max(v, b0), b1)
            if (cu, cv) != (u, v):
                return cu, cv
            cands = [(a0, cv), (a1, cv), (cu, b0), (cu, b1)]
            return min(cands,
                       key=lambda t: (t[0] - u) ** 2 + (t[1] - v) ** 2)

        from s2spark.kernels import coords
        for _ in range(60):
            # sample uv near the rect, measure spherical distance to it
            u = rng.uniform(bound[0][0] - 0.8, bound[0][1] + 0.8)
            v = rng.uniform(bound[1][0] - 0.8, bound[1][1] + 0.8)
            cu, cv = closest_on_boundary(u, v, bound)
            f = np.full(1, c.face, dtype=np.int64)
            px, py, pz = coords.face_uv_to_xyz(f, np.array([u]),
                                               np.array([v]))
            qx, qy, qz = coords.face_uv_to_xyz(f, np.array([cu]),
                                               np.array([cv]))
            p = np.array([px[0], py[0], pz[0]])
            q = np.array([qx[0], qy[0], qz[0]])
            p /= np.linalg.norm(p)
            q /= np.linalg.norm(q)
            ang = math.atan2(float(np.linalg.norm(np.cross(p, q))),
                             float(np.dot(p, q)))
            # growth guarantee: everything in the rect or within
            # `dist` of it lands inside the expanded rect
            if contains(bound, u, v) or ang < dist * 0.999:
                assert contains(grown, u, v), (u, v, ang, dist)
            # shrink guarantee: points within `dist` of the boundary
            # are excluded from the shrunk rect
            if ang < dist * 0.999:
                assert not contains(shrunk, u, v), (u, v, ang, dist)
        # a shrink never grows
        assert shrunk[0][0] >= bound[0][0] - 1e-15
        assert shrunk[0][1] <= bound[0][1] + 1e-15
        assert shrunk[1][0] >= bound[1][0] - 1e-15
        assert shrunk[1][1] <= bound[1][1] + 1e-15


class TestDiskCellsBatch:
    """disk_cells_batch == iterated AppendAllNeighbors set-BFS per row
    (the kernel behind s2_disk_cells; disc_join/knn ring candidates)."""

    @staticmethod
    def _reference(cells, lv, rg):
        from s2spark.kernels import cellid
        out = []
        ids = cellid.parent(np.asarray(cells, np.int64), lv)
        for k in range(len(ids)):
            frontier = np.array([ids[k]], dtype=np.uint64)
            seen = {int(ids[k])}
            for _ in range(int(rg[k])):
                nbrs = cellid.append_all_neighbors(
                    frontier, np.full(len(frontier), lv[k],
                                      dtype=np.int64))
                new = {int(v) for arr in nbrs for v in arr} - seen
                if not new:
                    break
                seen |= new
                frontier = np.array(sorted(new), dtype=np.uint64)
            out.append(cellid.as_i64(
                np.array(sorted(seen), dtype=np.uint64)).tolist())
        return out

    @staticmethod
    def _batch(cells, lv, rg):
        from s2spark.kernels import cellid
        rows, cc = cellid.disk_cells_batch(
            np.asarray(cells, np.int64), lv, rg)
        counts = np.bincount(rows, minlength=len(cells))
        return [a.tolist() for a in
                np.split(cellid.as_i64(cc), np.cumsum(counts)[:-1])]

    def _probe_cells(self):
        from s2spark.kernels import cellid
        rng = np.random.default_rng(7)
        v = rng.normal(size=(60, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts = [cellid.as_i64(cellid.from_xyz(v[:, 0], v[:, 1], v[:, 2]))]
        # cube corners (3-neighbor diagonals) and face-edge midpoints
        # (cross-face wrap) — where the fast path must fall to BFS
        hard = np.array([[1, 1, 1], [1, 1, -1], [1, -1, 1], [-1, 1, 1],
                         [-1, -1, -1], [1, -1, -1], [-1, 1, -1],
                         [-1, -1, 1], [1, 0, 1], [1, 0, -1], [0, 1, 1],
                         [1, 1, 0], [0, -1, -1], [-1, 0, 1]], dtype=float)
        hard /= np.linalg.norm(hard, axis=1, keepdims=True)
        pts.append(cellid.as_i64(cellid.from_xyz(
            hard[:, 0] + 1e-9, hard[:, 1], hard[:, 2])))
        return np.concatenate(pts)

    def test_matches_reference_bfs(self):
        cells = self._probe_cells()
        for lvv in (0, 1, 5, 14, 30):
            for rgv in (1, 2, 3):
                lv = np.full(len(cells), lvv)
                rg = np.full(len(cells), rgv)
                assert (self._batch(cells, lv, rg)
                        == self._reference(cells, lv, rg)), (lvv, rgv)

    def test_mixed_levels_and_rings(self):
        cells = self._probe_cells()
        rng = np.random.default_rng(3)
        lv = rng.integers(0, 15, len(cells))
        rg = rng.integers(1, 4, len(cells))
        assert self._batch(cells, lv, rg) == self._reference(cells, lv, rg)

    def test_empty(self):
        from s2spark.kernels import cellid
        e = np.array([], dtype=np.int64)
        rows, cc = cellid.disk_cells_batch(e, e, e)
        assert rows.size == 0 and cc.size == 0


def test_disk_cells_distance_prune_superset():
    """The distance-pruned ring (disc_join candidates) must keep every
    cell that can contain a point within chord² r2 of the query —
    prune ⊆ ring, and a dense sample of in-disc points always lands
    in a kept cell."""
    import math

    from s2spark.kernels import cellid, coords
    from s2spark.ops.cells import point_cell_chord2

    rng = np.random.default_rng(11)
    v = rng.normal(size=(200, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    leaf = cellid.as_i64(cellid.from_xyz(v[:, 0], v[:, 1], v[:, 2]))
    radius = 0.01
    r2 = (2.0 * math.sin(0.5 * radius)) ** 2
    r2pad = r2 * (1.0 + 1e-9) + 1e-12
    lv = np.full(len(leaf), 6)
    rows, cells = cellid.disk_cells_batch(leaf, lv, np.ones(len(leaf)))
    p = v[rows]
    d2 = point_cell_chord2(p, cellid.as_i64(cells))
    keep = d2 <= r2pad
    assert 0 < keep.sum() < keep.size  # prunes something, keeps something
    # every query keeps its own center cell (distance 0)
    kept_rows = set(rows[keep][d2[keep] == 0.0].tolist())
    assert kept_rows == set(range(len(leaf)))
    # sample points inside each disc; their level-6 cell must be kept
    kept_pairs = set(zip(rows[keep].tolist(),
                         cellid.as_i64(cells)[keep].tolist()))
    for qi in range(0, len(leaf), 10):
        q = v[qi]
        t = np.zeros(3); t[np.argmin(np.abs(q))] = 1.0
        e1 = np.cross(q, t); e1 /= np.linalg.norm(e1)
        e2 = np.cross(q, e1)
        for frac in (0.999, 0.5):
            for ang in np.linspace(0, 2 * np.pi, 17):
                d = radius * frac
                pt = (math.cos(d) * q
                      + math.sin(d) * (math.cos(ang) * e1
                                       + math.sin(ang) * e2))
                pc = int(cellid.as_i64(cellid.parent(cellid.from_xyz(
                    np.array([pt[0]]), np.array([pt[1]]),
                    np.array([pt[2]])), np.int64(6)))[0])
                assert (qi, pc) in kept_pairs, (qi, frac, ang)
