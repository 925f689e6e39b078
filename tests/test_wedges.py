"""Wedge relations vs the reference's fixture table
(s2wedge_relations_test.cc:36-90, re-expressed)."""

import numpy as np
import pytest

from s2spark.kernels import predicates as P


def _n(v):
    a = np.asarray(v, dtype=np.float64)
    return tuple(a / np.linalg.norm(a))


CASES = [
    # (a0, ab1, a2, b0, b2, contains, intersects, relation)
    ((-1, 0, 10), (0, 0, 1), (1, 2, 10), (0, 1, 10), (1, -2, 10),
     False, True, P.WEDGE_PROPERLY_OVERLAPS),
    ((-1, -1, 10), (0, 0, 1), (1, -1, 10), (1, 0, 10), (-1, 1, 10),
     False, True, P.WEDGE_PROPERLY_OVERLAPS),
    ((-1, -1, 10), (0, 0, 1), (1, -1, 10), (-1, 0, 10), (1, 0, 10),
     True, True, P.WEDGE_PROPERLY_CONTAINS),
    ((2, 1, 10), (0, 0, 1), (-1, -1, 10), (2, 1, 10), (1, -5, 10),
     True, True, P.WEDGE_PROPERLY_CONTAINS),
    ((2, 1, 10), (0, 0, 1), (-1, -1, 10), (1, -2, 10), (-1, -1, 10),
     True, True, P.WEDGE_PROPERLY_CONTAINS),
    ((-2, 3, 10), (0, 0, 1), (4, -5, 10), (-2, 3, 10), (4, -5, 10),
     True, True, P.WEDGE_EQUALS),
    ((-2, 3, 10), (0, 0, 1), (4, -5, 10), (4, -5, 10), (-2, -3, 10),
     False, False, P.WEDGE_IS_DISJOINT),
    ((-2, 3, 10), (0, 0, 1), (0, 5, 10), (4, -5, 10), (-2, 3, 10),
     False, False, P.WEDGE_IS_DISJOINT),
    ((-2, 3, 10), (0, 0, 1), (4, -5, 10), (4, -5, 10), (-2, 3, 10),
     False, False, P.WEDGE_IS_DISJOINT),
    ((2, 1, 10), (0, 0, 1), (1, -5, 10), (2, 1, 10), (-1, -1, 10),
     False, True, P.WEDGE_IS_PROPERLY_CONTAINED),
    ((2, 1, 10), (0, 0, 1), (1, -5, 10), (-2, 1, 10), (1, -5, 10),
     False, True, P.WEDGE_IS_PROPERLY_CONTAINED),
]


@pytest.mark.parametrize("case", CASES)
def test_wedge_relations_fixture_table(case):
    a0, ab1, a2, b0, b2, contains, intersects, rel = case
    args = (_n(a0), _n(ab1), _n(a2), _n(b0), _n(b2))
    assert P.wedge_contains(*args) == contains
    assert P.wedge_intersects(*args) == intersects
    assert P.get_wedge_relation(*args) == rel
