"""S2CellIndex reference battery (s2cell_index_test.cc:85-434):
quadratic validation of the range decomposition + cell tree, the
ContentsIterator duplicate-suppression fixture, and the intersection
visitors against brute force."""

import numpy as np

from s2spark.kernels import cellid as ck
from s2spark.kernels import cellunion
from s2spark.kernels.cell_index import (BEGIN_LEAF, END_LEAF, CellIndex,
                                        CellIterator, ContentsIterator,
                                        NonEmptyRangeIterator,
                                        RangeIterator, _rmax, _rmin)


def _c(s: str) -> int:
    return int(np.asarray(ck.from_debug_string(s)).astype(np.uint64))


def _pairs(index: CellIndex):
    out = []
    it = CellIterator(index)
    while not it.done():
        out.append((it.cell_id(), it.label()))
        it.next()
    return sorted(out)


def quadratic_validate(contents: list):
    """Build + the three verifiers (s2cell_index_test.cc:92-221)."""
    index = CellIndex()
    for cell, label in contents:
        index.add(cell, label)
    index.build()

    # CellIterator visits each pair exactly once
    assert _pairs(index) == sorted(contents)

    # RangeIterator + ContentsIterator give the exact pair set per
    # leaf range; every range starts where the previous ended
    min_cell_id = BEGIN_LEAF
    rng = RangeIterator(index)
    rng.begin()
    while not rng.done():
        assert rng.start_id() == min_cell_id
        assert rng.limit_id() > min_cell_id
        min_cell_id = rng.limit_id()
        expected = []
        for cell, label in contents:
            if _rmin(cell) <= rng.start_id() and \
                    _rmax(cell) + 1 >= rng.limit_id():
                expected.append((cell, label))
            else:
                assert not (_rmin(cell) <= rng.limit_id() - 1
                            and _rmax(cell) >= rng.start_id())
        # a FRESH iterator per range gives the exact contents (the
        # shared-iterator suppression semantics are pinned verbatim in
        # test_contents_iterator_suppresses_duplicates)
        fresh = ContentsIterator(index)
        fresh.start_union(rng)
        actual = []
        while not fresh.done():
            actual.append((fresh.cell_id(), fresh.label()))
            fresh.next()
        assert sorted(actual) == sorted(expected), rng.start_id()
        rng.next()
    assert min_cell_id == END_LEAF

    # range iterators: seek / prev / next / non-empty sync
    rng = RangeIterator(index)
    rng.begin()
    rng.finish()
    assert rng.done()
    ne = NonEmptyRangeIterator(index)
    ne.begin()
    ne.finish()
    assert ne.done()
    rng = RangeIterator(index)
    ne = NonEmptyRangeIterator(index)
    prev_start = None
    ne_prev_start = None
    rng.begin()
    ne.begin()
    while not rng.done():
        it2 = RangeIterator(index)
        start = rng.start_id()
        it2.seek(rng.start_id())
        assert it2.start_id() == start
        it2.seek(rng.limit_id() - 1)
        assert it2.start_id() == start
        ne2 = NonEmptyRangeIterator(index)
        ne_start = ne.start_id() if not ne.done() else None
        ne2.seek(rng.start_id())
        if ne_start is not None:
            assert ne2.start_id() == ne_start
            ne2.seek(rng.limit_id() - 1)
            assert ne2.start_id() == ne_start
        if it2.prev():
            assert it2.start_id() == prev_start
            it2.next()
            assert it2.start_id() == start
        else:
            assert it2.start_id() == start
            assert prev_start is None
        if not rng.is_empty():
            assert ne.start_id() == rng.start_id()
            assert ne.limit_id() == rng.limit_id()
            assert not ne.done()
            ne_prev_start = ne_start
            ne.next()
        prev_start = start
        rng.next()
    assert ne.done()
    return index


def test_empty():
    quadratic_validate([])


def test_one_face_cell():
    quadratic_validate([(_c("0/"), 0)])


def test_one_leaf_cell():
    quadratic_validate([(_c("1/012301230123012301230123012301"), 12)])


def test_duplicate_values():
    quadratic_validate([(_c("0/"), 0), (_c("0/"), 0),
                        (_c("0/"), 1), (_c("0/"), 17)])


def test_disjoint_cells():
    quadratic_validate([(_c("0/"), 0), (_c("3/"), 0)])


def test_nested_cells():
    quadratic_validate([
        (_c("1/"), 3), (_c("1/0"), 15), (_c("1/000"), 9),
        (_c("1/00000"), 11), (_c("1/012"), 6), (_c("1/01212"), 5),
        (_c("1/312"), 17), (_c("1/31200"), 4), (_c("1/3120000"), 10),
        (_c("1/333"), 20), (_c("1/333333"), 18), (_c("5/"), 3),
        (_c("5/3"), 31), (_c("5/3333"), 27)])


def _random_cell(rng) -> int:
    p = rng.normal(size=3)
    p /= np.linalg.norm(p)
    leaf = int(ck.as_u64(ck.from_xyz(p[0:1], p[1:2], p[2:3]))[0])
    lev = int(rng.integers(0, 31))
    return int(ck.as_u64(ck.parent(
        np.array([leaf], dtype=np.uint64), lev))[0])


def _random_union(rng):
    return cellunion.normalize(np.array(
        [_random_cell(rng) for _ in range(10)], dtype=np.uint64))


def test_random_cell_unions():
    rng = np.random.default_rng(21)
    contents = []
    for i in range(60):
        for c in ck.as_u64(_random_union(rng)):
            contents.append((int(c), i))
    quadratic_validate(contents)


def _expect_contents(index, cit, target_str, expected):
    rng = RangeIterator(index)
    rng.seek(_rmin(_c(target_str)))
    actual = []
    cit.start_union(rng)
    while not cit.done():
        actual.append((cit.cell_id(), cit.label()))
        cit.next()
    want = sorted((_c(s), lbl) for s, lbl in expected)
    assert sorted(actual) == want, target_str


def test_contents_iterator_suppresses_duplicates():
    """s2cell_index_test.cc:311-352 verbatim."""
    index = CellIndex()
    for s, lbl in [("2/1", 1), ("2/1", 2), ("2/10", 3), ("2/100", 4),
                   ("2/102", 5), ("2/1023", 6), ("2/31", 7),
                   ("2/313", 8), ("2/3132", 9), ("3/1", 10),
                   ("3/12", 11), ("3/13", 12)]:
        index.add(_c(s), lbl)
    index.build()
    cit = ContentsIterator(index)
    _expect_contents(index, cit, "1/123", [])
    _expect_contents(index, cit, "2/100123",
                     [("2/1", 1), ("2/1", 2), ("2/10", 3),
                      ("2/100", 4)])
    _expect_contents(index, cit, "2/100123", [])
    _expect_contents(index, cit, "2/10232",
                     [("2/102", 5), ("2/1023", 6)])
    _expect_contents(index, cit, "2/313", [("2/31", 7), ("2/313", 8)])
    _expect_contents(index, cit, "2/3132333", [("2/3132", 9)])
    _expect_contents(index, cit, "2/213", [])
    _expect_contents(index, cit, "3/1232", [("3/1", 10), ("3/12", 11)])
    _expect_contents(index, cit, "3/133210", [("3/13", 12)])
    _expect_contents(index, cit, "3/133210", [])
    _expect_contents(index, cit, "5/0", [])
    # moving backwards re-reports already-seen values
    _expect_contents(index, cit, "3/13221", [("3/1", 10),
                                             ("3/13", 12)])
    _expect_contents(index, cit, "2/31112", [("2/31", 7)])


def _test_intersection(index, contents, target):
    tgt = ck.as_u64(np.asarray(target, dtype=np.uint64))
    expected = []
    for cell, label in contents:
        lo, hi = _rmin(cell), _rmax(cell)
        if any(_rmin(int(t)) <= hi and _rmax(int(t)) >= lo
               for t in tgt):
            expected.append((cell, label))
    actual = []
    index.visit_intersecting_cells(
        tgt, lambda c, l: actual.append((c, l)) or True)
    assert sorted(actual) == sorted(expected)
    assert index.get_intersecting_labels(tgt) == \
        {lbl for _, lbl in expected}


def test_intersection_optimization():
    contents = [(_c("1/001"), 1), (_c("1/333"), 2), (_c("2/00"), 3),
                (_c("2/0232"), 4)]
    index = CellIndex()
    for cell, label in contents:
        index.add(cell, label)
    index.build()
    _test_intersection(index, contents, cellunion.normalize(np.array(
        [_c("1/010"), _c("1/3")], dtype=np.uint64)))
    _test_intersection(index, contents, cellunion.normalize(np.array(
        [_c("2/010"), _c("2/011"), _c("2/02")], dtype=np.uint64)))


def test_intersection_random_unions():
    rng = np.random.default_rng(33)
    contents = []
    index = CellIndex()
    for i in range(60):
        u = _random_union(rng)
        index.add_union(u, i)
        for c in ck.as_u64(u):
            contents.append((int(c), i))
    index.build()
    for _ in range(100):
        _test_intersection(index, contents, _random_union(rng))


def test_intersection_semi_random_unions():
    """s2cell_index_test.cc:412-434: walks next_wrap/parent/child to
    hit range boundary corner cases."""
    rng = np.random.default_rng(5)
    for _ in range(40):
        index = CellIndex()
        contents = []
        cid = np.array([_c("1/0123012301230123")], dtype=np.uint64)
        target = []
        for i in range(100):
            if rng.random() < 0.1:
                index.add(int(ck.as_u64(cid)[0]), i)
                contents.append((int(ck.as_u64(cid)[0]), i))
            if rng.random() < 0.25:
                target.append(int(ck.as_u64(cid)[0]))
            if rng.random() < 0.5:
                cid = ck.advance_wrap(cid, 1)
            if rng.random() < 1 / 6 and int(ck.level(cid)[0]) > 0:
                cid = ck.parent(cid, int(ck.level(cid)[0]) - 1)
            if rng.random() < 1 / 6 and int(ck.level(cid)[0]) < 30:
                cid = ck.child_begin(cid)
        index.build()
        if target:
            _test_intersection(
                index, contents,
                cellunion.normalize(np.array(target, dtype=np.uint64)))
