"""S2RegionTermIndexer string-term parity
(s2region_term_indexer.cc:115-258): the intersection guarantee —
index_terms(A) ∩ query_terms(B) is non-empty whenever A ∩ B is —
must hold for EVERY option combination (points_only,
optimize_for_space, level_mod), the reference's own randomized test
strategy (s2region_term_indexer_test.cc)."""

import math

import numpy as np
import pytest

from s2spark.kernels import cellid as ck
from s2spark.kernels.coverer import RegionCoverer
from s2spark.kernels.region import Cap
from s2spark.ops import joins

MIN_L, MAX_L = 4, 12


def units(n, seed):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def cap_covering(center, radius_rad, level_mod=1):
    """Canonical covering on the [MIN_L, MAX_L] lattice: coverer
    cells snapped UP to the nearest lattice ancestor (a superset, so
    the covering property is preserved)."""
    r2 = (2.0 * math.sin(0.5 * radius_rad)) ** 2
    rc = RegionCoverer(max_cells=8, min_level=MIN_L, max_level=MAX_L)
    cov = ck.as_i64(rc.get_covering(Cap(tuple(center), r2)))
    allowed = joins.term_levels(MIN_L, MAX_L, level_mod)
    out = []
    for c in cov:
        lv = int(ck.level(np.array([c]))[0])
        snap = max(a for a in allowed if a <= lv) if lv >= allowed[0] \
            else allowed[0]
        out.append(int(ck.as_i64(ck.parent(np.array([c]),
                                           min(snap, lv)))[0]))
    return sorted(set(out))


@pytest.mark.parametrize("level_mod", [1, 2])
@pytest.mark.parametrize("ofs", [False, True])
def test_region_region_intersection_guarantee(level_mod, ofs):
    centers = units(24, 31)
    radii = 0.02 + (np.arange(24) % 5) * 0.05
    covs = [cap_covering(centers[i], radii[i], level_mod)
            for i in range(24)]
    idx = [set(joins.region_index_terms(
        c, MIN_L, MAX_L, level_mod, optimize_for_space=ofs))
        for c in covs]
    qry = [set(joins.region_query_terms(
        c, MIN_L, MAX_L, level_mod, optimize_for_space=ofs))
        for c in covs]
    n_checked = 0
    for i in range(24):
        for j in range(24):
            ang = math.acos(min(1.0, float(centers[i] @ centers[j])))
            if ang <= radii[i] + radii[j]:  # caps intersect
                n_checked += 1
                assert idx[i] & qry[j], (i, j, ofs, level_mod)
    assert n_checked > 24  # self-pairs + some real overlaps


@pytest.mark.parametrize("ofs", [False, True])
@pytest.mark.parametrize("points_only", [False, True])
def test_point_region_guarantee(points_only, ofs):
    centers = units(16, 37)
    radii = 0.05 + (np.arange(16) % 4) * 0.08
    pts = units(60, 41)
    leafs = ck.as_i64(ck.from_xyz(pts[:, 0], pts[:, 1], pts[:, 2]))
    pt_idx = [set(joins.point_index_terms(int(lf), MIN_L, MAX_L))
              for lf in leafs]
    pt_qry = [set(joins.point_query_terms(int(lf), MIN_L, MAX_L,
                                          points_only=points_only))
              for lf in leafs]
    for i in range(16):
        cov = cap_covering(centers[i], radii[i])
        # region indexed, point queries it — points_only must NOT be
        # set on the index side for region docs, so only test the
        # point-queries-region direction when not points_only
        r_idx = set(joins.region_index_terms(
            cov, MIN_L, MAX_L, optimize_for_space=ofs))
        r_qry = set(joins.region_query_terms(
            cov, MIN_L, MAX_L, points_only=points_only,
            optimize_for_space=ofs))
        for p in range(60):
            ang = math.acos(min(1.0, float(centers[i] @ pts[p])))
            if ang <= radii[i]:
                # point in cap: point-doc matched by region-query
                assert pt_idx[p] & r_qry, (i, p)
                if not points_only:
                    # region-doc matched by point-query
                    assert r_idx & pt_qry[p], (i, p)


def test_points_only_query_is_single_term():
    leaf = int(ck.as_i64(ck.from_xyz(np.array([1.0]), np.array([0.0]),
                                     np.array([0.0])))[0])
    assert len(joins.point_query_terms(leaf, MIN_L, MAX_L,
                                       points_only=True)) == 1


def test_optimize_for_space_moves_terms_to_query_side():
    """The reference's trade: fewer index terms, more query terms;
    true-max-level cells keep their ancestor term on the index side
    either way (s2region_term_indexer.cc:170-199)."""
    cov = cap_covering(units(1, 5)[0], 0.08)
    i_def = joins.region_index_terms(cov, MIN_L, MAX_L)
    i_ofs = joins.region_index_terms(cov, MIN_L, MAX_L,
                                     optimize_for_space=True)
    q_def = joins.region_query_terms(cov, MIN_L, MAX_L)
    q_ofs = joins.region_query_terms(cov, MIN_L, MAX_L,
                                     optimize_for_space=True)
    assert len(i_ofs) <= len(i_def)
    assert len(q_ofs) >= len(q_def)
    assert set(i_ofs) <= set(i_def)
    assert set(q_def) <= set(q_ofs)


def test_marker_and_prefix():
    cov = cap_covering(units(1, 9)[0], 0.05)
    terms = joins.region_index_terms(cov, MIN_L, MAX_L, marker="!",
                                     prefix="s2:")
    assert all(t.startswith("s2:") for t in terms)
    assert any(t.startswith("s2:!") for t in terms)   # covering terms
    assert any(not t.startswith("s2:!") for t in terms)  # ancestors


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
