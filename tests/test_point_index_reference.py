"""S2PointIndex reference battery (s2point_index_test.cc:30-142):
multiset contents under add/remove, and the iterator methods — seek
into empty gaps lands on the next entry, prev/next round-trips."""

import numpy as np

from s2spark.kernels import cellid as ck
from s2spark.kernels.point_index import PointIndex, PointIterator


def _verify(index: PointIndex, contents: list):
    # VerifyContents: the iterator visits exactly the multiset
    seen = []
    it = PointIterator(index)
    it.begin()
    while not it.done():
        seen.append((it.id(), it.point().tobytes(), it.data()))
        it.next()
    want = sorted((ck_leaf, np.asarray(p, dtype=np.float64).tobytes(),
                   d) for (ck_leaf, p, d) in contents)
    assert seen == want

    # VerifyIteratorMethods
    it = PointIterator(index)
    assert not it.prev()
    it.finish()
    assert it.done()
    prev_cellid = None
    min_cellid = 1  # Begin(kMaxLevel)
    it.begin()
    while not it.done():
        cellid = it.id()
        assert cellid == int(ck.as_u64(ck.from_xyz(
            it.point()[0:1], it.point()[1:2], it.point()[2:3]))[0])
        assert prev_cellid is None or cellid >= prev_cellid
        it2 = PointIterator(index)
        if cellid == prev_cellid:
            it2.seek(cellid)
            assert it2.id() == cellid
        if prev_cellid is None or cellid > prev_cellid:
            # seeking anywhere in the empty gap lands on this entry
            for skipped in (min_cellid, (min_cellid + cellid) // 2 | 1,
                            cellid):
                if min_cellid <= skipped <= cellid:
                    it2.seek(skipped)
                    assert it2.id() == cellid, skipped
        if prev_cellid is not None:
            it2 = PointIterator(index)
            it2._i = it._i
            assert it2.prev()
            assert it2.id() == prev_cellid
            it2.next()
            assert it2.id() == cellid
            it2.seek(prev_cellid)
            assert it2.id() == prev_cellid
        prev_cellid = cellid
        min_cellid = cellid + 2  # leaf ids step by 2
        it.next()


def _add(index, contents, p, d):
    p = np.asarray(p, dtype=np.float64)
    p = p / np.linalg.norm(p)
    index.add(p, d)
    leaf = int(ck.as_u64(ck.from_xyz(p[0:1], p[1:2], p[2:3]))[0])
    contents.append((leaf, p, d))


def test_no_points():
    _verify(PointIndex(), [])


def test_duplicate_points():
    index, contents = PointIndex(), []
    for _ in range(10):
        _add(index, contents, (1, 0, 0), 123)
    _verify(index, contents)
    for _ in range(5):
        assert index.remove(np.array([1.0, 0, 0]), 123)
        contents.pop()
    _verify(index, contents)
    assert not index.remove(np.array([0.0, 1, 0]), 123)


def test_random_points():
    rng = np.random.default_rng(9)
    index, contents = PointIndex(), []
    for _ in range(100):
        p = rng.normal(size=3)
        _add(index, contents, p, int(rng.integers(0, 100)))
    _verify(index, contents)
    for _ in range(10):
        # seek to a random leaf cell; remove the entry found
        it = PointIterator(index)
        while True:
            p = rng.normal(size=3)
            p /= np.linalg.norm(p)
            it.seek(int(ck.as_u64(ck.from_xyz(
                p[0:1], p[1:2], p[2:3]))[0]))
            if not it.done():
                break
        victim = (it.id(), it.point().tobytes(), it.data())
        assert index.remove(it.point(), it.data())
        contents.remove(next(
            c for c in contents
            if (c[0], np.asarray(c[1]).tobytes(), c[2]) == victim))
        _verify(index, contents)
