"""Property-based tests (hypothesis) for the cell-id algebra — the
invariants the reference's randomized suites check
(s2cell_id_test.cc:101-126, 299-341) over adversarial inputs."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from s2spark.kernels import cellid
from s2spark.sources import geo

valid_leaf = st.builds(
    lambda f, i, j: int(cellid.from_face_ij(
        np.array([f], dtype=np.int64), np.array([i], dtype=np.int64),
        np.array([j], dtype=np.int64))[0]),
    st.integers(0, 5), st.integers(0, 2**30 - 1),
    st.integers(0, 2**30 - 1))


@settings(max_examples=200, deadline=None)
@given(valid_leaf, st.integers(0, 30))
def test_parent_contains_and_level(leaf, lev):
    ids = np.array([leaf], dtype=np.uint64)
    p = cellid.parent(ids, np.int64(lev))
    assert int(cellid.level(p)[0]) == lev
    lo, hi = cellid.range_min(p)[0], cellid.range_max(p)[0]
    assert lo <= ids[0] <= hi
    # parent of parent is idempotent at the same level
    assert int(cellid.parent(p, np.int64(lev))[0]) == int(p[0])


@settings(max_examples=200, deadline=None)
@given(valid_leaf, st.integers(0, 29), st.integers(0, 3))
def test_child_roundtrip(leaf, lev, pos):
    p = cellid.parent(np.array([leaf], dtype=np.uint64), np.int64(lev))
    ch = cellid.child(p, np.int64(pos))
    assert int(cellid.level(ch)[0]) == lev + 1
    assert int(cellid.parent(ch, np.int64(lev))[0]) == int(p[0])


@settings(max_examples=200, deadline=None)
@given(valid_leaf, st.integers(0, 30))
def test_token_roundtrip(leaf, lev):
    p = cellid.parent(np.array([leaf], dtype=np.uint64), np.int64(lev))
    tok = cellid.to_token(cellid.as_i64(p))[0]
    assert 1 <= len(tok) <= 16
    back = cellid.from_token([tok])[0]
    assert int(back) == int(p[0])


@settings(max_examples=200, deadline=None)
@given(valid_leaf)
def test_scalar_decode_matches_vectorized(leaf):
    ids = np.array([leaf], dtype=np.uint64)
    f, i, j = cellid.to_face_ij_orientation(ids)
    sf, si, sj, slv = cellid.to_face_ij_scalar(leaf)
    assert (sf, si, sj) == (int(f[0]), int(i[0]), int(j[0]))
    assert slv == int(cellid.level(ids)[0])


@settings(max_examples=100, deadline=None)
@given(st.integers(0, 2**62 - 2**32), st.integers(1, 60))
def test_mix_matches_division_semantics(key, salt):
    k = np.array([key], dtype=np.int64)
    P, M = geo.P, geo.M
    h = ((k + (salt * 1000003 + 12345)) % P) * M % P
    h = h ^ (h >> 13)
    want = ((h + salt) % P) * M % P
    assert int(geo.mix_np(k, salt)[0]) == int(want[0])


@settings(max_examples=50, deadline=None)
@given(valid_leaf, st.integers(0, 29))
def test_neighbors_are_symmetric(leaf, lev):
    """If b is an all-neighbor of a at level L, then a's ancestor at L
    is an all-neighbor of b (adjacency is symmetric)."""
    a = cellid.parent(np.array([leaf], dtype=np.uint64), np.int64(lev))
    nbrs = cellid.append_all_neighbors(a, np.int64(lev))[0]
    for b in nbrs:
        back = cellid.append_all_neighbors(
            np.array([b], dtype=np.uint64), np.int64(lev))[0]
        assert int(a[0]) in {int(x) for x in back}


@settings(max_examples=100, deadline=None)
@given(valid_leaf, st.integers(0, 28), st.integers(-3, 3))
def test_advance_and_distance(leaf, lev, n):
    """advance clamps to [Begin(level), End(level)] (s2cell_id.cc:125-148);
    distance moves by exactly the clamped step count."""
    ids = cellid.parent(np.array([leaf], dtype=np.uint64), np.int64(lev))
    d0 = int(cellid.distance_from_begin(ids)[0])
    num = 6 * 4 ** lev  # curve length at this level
    adv = cellid.advance(ids, np.int64(n))
    want = min(max(d0 + n, 0), num)  # clamp to [Begin, End]
    assert int(cellid.distance_from_begin(adv)[0]) == want
    if want < num:  # End(level) is a sentinel, not a valid cell
        assert int(cellid.level(adv)[0]) == lev
    # next_cell == advance(1) whenever advance doesn't clamp
    if d0 + 1 <= num:
        assert int(cellid.next_cell(ids)[0]) == int(cellid.advance(ids,
                                                    np.int64(1))[0])
    # advance_wrap treats the curve as a cycle of length num
    wrapped = cellid.advance_wrap(ids, np.int64(n))
    assert int(cellid.distance_from_begin(wrapped)[0]) == (d0 + n) % num
    assert int(cellid.level(wrapped)[0]) == lev


def test_advance_clamps_at_curve_ends():
    """Pinned regression (VERDICT r1 #1): last face-5 level-0 cell
    advanced 3 steps must clamp to End(0), not wrap the uint64 id."""
    last_face5 = np.array([(5 << 61) | (1 << 60)], dtype=np.uint64)
    adv = cellid.advance(last_face5, np.int64(3))
    assert int(cellid.distance_from_begin(adv)[0]) == 6  # End(0)
    # and clamping down past Begin: Begin(0) == first face-0 cell == 1<<60
    first = np.array([1 << 60], dtype=np.uint64)
    back = cellid.advance(first, np.int64(-5))
    assert int(back[0]) == int(first[0])
    # negative steps work without OverflowError and land exactly
    two_back = cellid.advance(last_face5, np.int64(-2))
    assert int(cellid.distance_from_begin(two_back)[0]) == 3


@settings(max_examples=100, deadline=None)
@given(st.floats(0.1, 2.0e7))
def test_earth_roundtrips(m):
    from s2spark.kernels import earth
    assert abs(earth.radians_to_meters(earth.meters_to_radians(m)) - m) \
        <= 1e-9 * m
    c2 = earth.meters_to_chord2(m)
    assert 0.0 <= c2 <= 4.0
    if m < math.pi * earth.RADIUS_METERS * 0.999:
        back = earth.chord2_to_meters(c2)
        assert abs(back - min(m, math.pi * earth.RADIUS_METERS)) \
            <= max(1e-6 * m, 1e-6)
