"""Reference battery for CellRangeIterator
(s2cell_range_iterator_test.cc:33-92), over leaf cells of points on
faces 0/1/2 plus sweep/locate property checks against brute force."""
import numpy as np
import pytest

from s2spark.kernels import cellid
from s2spark.kernels.loops import parse_vertices
from s2spark.kernels.range_iterator import (DISJOINT, INDEXED, SENTINEL,
                                            SUBDIVIDED, CellRangeIterator)


def _face_point_leaves():
    # one point each on faces 0, 1, 2 ("0:0 | 0:90 | 90:0")
    pts = parse_vertices("0:0, 0:90, 90:0")
    ids = cellid.from_xyz(pts[:, 0], pts[:, 1], pts[:, 2])
    return np.sort(np.asarray(ids, dtype=np.uint64))


def test_relation():
    ids = _face_point_leaves()
    it0 = CellRangeIterator(ids)
    it1 = CellRangeIterator(ids)
    it1.next()
    assert it0.relation(it1) == -1
    assert it1.relation(it0) == +1
    it1.prev()
    assert it1.relation(it0) == 0
    it1.finish()
    assert it1.relation(it0) == +1


def test_next():
    ids = _face_point_leaves()
    it = CellRangeIterator(ids)
    faces = []
    while not it.done():
        faces.append(it.id() >> 61)
        it.next()
    assert faces == [0, 1, 2]
    assert it.id() == SENTINEL
    assert it.done()


def test_locate_iter():
    ids = _face_point_leaves()
    it0 = CellRangeIterator(ids)
    it1 = CellRangeIterator(ids)
    it0.next()
    it1.locate_iter(it0)
    assert it1.id() == it0.id()


def test_empty_index():
    empty = CellRangeIterator(np.array([], dtype=np.uint64))
    non_empty = CellRangeIterator(_face_point_leaves())
    assert not non_empty.done()
    assert empty.done()

    empty.seek_to(non_empty)
    assert empty.done()
    empty.seek_beyond(non_empty)
    assert empty.done()
    empty.seek_to(empty)
    assert empty.done()
    empty.seek_beyond(empty)
    assert empty.done()


def _rand_ids(rng, n):
    """Random DISJOINT cells (the S2CellIterator precondition: index
    cells never overlap — an S2ShapeIndex subdivides the sphere)."""
    faces = rng.integers(0, 6, size=4 * n)
    levels = rng.integers(2, 12, size=4 * n)
    pos = rng.integers(0, 1 << 61, size=4 * n).astype(np.uint64)
    kept: list[tuple[int, int, int]] = []  # (id, rmin, rmax)
    for k in range(4 * n):
        cid = int(cellid.from_face_pos_level(
            int(faces[k]), int(pos[k]), int(levels[k]))[()])
        rmin = int(cellid.range_min(np.array([cid], dtype=np.uint64))[0])
        rmax = int(cellid.range_max(np.array([cid], dtype=np.uint64))[0])
        if all(rmax < lo or rmin > hi for _, lo, hi in kept):
            kept.append((cid, rmin, rmax))
        if len(kept) >= n:
            break
    return np.sort(np.array([c for c, _, _ in kept], dtype=np.uint64))


def test_locate_matches_brute_force():
    rng = np.random.default_rng(55)
    ids = _rand_ids(rng, 60)
    rmin = np.array([int(cellid.range_min(np.array([i], dtype=np.uint64))[0])
                     for i in ids], dtype=np.uint64)
    rmax = np.array([int(cellid.range_max(np.array([i], dtype=np.uint64))[0])
                     for i in ids], dtype=np.uint64)
    it = CellRangeIterator(ids)
    targets = _rand_ids(rng, 80)
    for t in targets:
        t = int(t)
        tmin = int(cellid.range_min(np.array([t], dtype=np.uint64))[0])
        tmax = int(cellid.range_max(np.array([t], dtype=np.uint64))[0])
        # disjoint index cells: INDEXED iff some cell contains the
        # target's whole range, SUBDIVIDED iff some cell is inside it
        contained_by = bool(np.any((rmin <= np.uint64(tmin))
                                   & (rmax >= np.uint64(tmax))))
        subdivided = bool(np.any((rmin >= np.uint64(tmin))
                                 & (rmax <= np.uint64(tmax))))
        got = it.locate(t)
        if contained_by:
            want = INDEXED
        elif subdivided:
            want = SUBDIVIDED
        else:
            want = DISJOINT
        assert got == want, (t, got, want)


def test_locate_point_contract():
    rng = np.random.default_rng(99)
    ids = _rand_ids(rng, 40)
    it = CellRangeIterator(ids)
    # every indexed cell's own range_min leaf locates to that cell
    for cid in ids[:20]:
        leaf = int(cellid.range_min(np.array([cid], dtype=np.uint64))[0])
        assert it.locate_point(leaf)
        assert it.range_min() <= leaf <= it.range_max()
    # a leaf outside all ranges does not locate
    rmin = np.array([int(cellid.range_min(np.array([i], dtype=np.uint64))[0])
                     for i in ids], dtype=np.uint64)
    rmax = np.array([int(cellid.range_max(np.array([i], dtype=np.uint64))[0])
                     for i in ids], dtype=np.uint64)
    probes = _rand_ids(rng, 50)
    for p in probes:
        leaf = int(cellid.range_min(np.array([int(p)], dtype=np.uint64))[0])
        inside = bool(np.any((rmin <= np.uint64(leaf))
                             & (np.uint64(leaf) <= rmax)))
        assert it.locate_point(leaf) == inside


def test_seek_to_and_beyond_sweep():
    """Merge sweep: for every target cell, seek_to lands on the first
    cell with range_max >= target.range_min, seek_beyond on the first
    with range_min > target.range_max (brute-force verified)."""
    rng = np.random.default_rng(123)
    a = _rand_ids(rng, 50)
    b = _rand_ids(rng, 50)
    ita = CellRangeIterator(a)
    a_rmin = [CellRangeIterator(a[k:k + 1]).range_min() for k in range(len(a))]
    a_rmax = [CellRangeIterator(a[k:k + 1]).range_max() for k in range(len(a))]
    itb = CellRangeIterator(b)
    while not itb.done():
        ita.seek_to(itb)
        want = next((k for k in range(len(a))
                     if a_rmax[k] >= itb.range_min()), len(a))
        assert ita.pos == want, ("seek_to", itb.id())
        ita.seek_beyond(itb)
        want = next((k for k in range(len(a))
                     if a_rmin[k] > itb.range_max()), len(a))
        assert ita.pos == want, ("seek_beyond", itb.id())
        itb.next()
