"""Adversarial configurations cemented from round-1 probing: sparse
kNN with large k, far-too-fine ring levels (forces the brute-force
fallback), and inverted loops (interior > hemisphere)."""

import numpy as np
from pyspark.sql import functions as F

from s2spark import dataset
from s2spark.kernels.loops import Loop
from s2spark.ops import knn, pip
from tests.conftest import SF_DIR


def _brute_knn(E_ids, EM, C, k):
    out = {}
    for q, (x, y, z) in C.items():
        d2 = ((EM - np.array([x, y, z])) ** 2).sum(1)
        order = np.lexsort((E_ids, d2))[:k]
        out[q] = [(int(E_ids[i]), float(d2[i])) for i in order]
    return out


def test_knn_large_k_and_bad_level(spark):
    ev = dataset.geotagged_events(spark, SF_DIR) \
        .select("event_id", "cell_id", "x", "y", "z")
    cu = dataset.geotagged_customers(spark, SF_DIR) \
        .where(F.col("c_custkey") % 5 == 0) \
        .select("c_custkey", "cell_id", "x", "y", "z")
    E = {r["event_id"]: (r["x"], r["y"], r["z"]) for r in ev.collect()}
    C = {r["c_custkey"]: (r["x"], r["y"], r["z"]) for r in cu.collect()}
    eids = np.array(sorted(E))
    EM = np.array([E[i] for i in sorted(E)])
    for k, lev in ((50, knn.pick_level(len(E), 50)), (3, 12)):
        res = knn.knn_join(ev, cu, k, query_id="c_custkey",
                           point_id="event_id", level=lev).collect()
        got = {}
        for r in res:
            got.setdefault(r["c_custkey"], []).append(
                (r["rank"], r["event_id"], r["dist2"]))
        exp = _brute_knn(eids, EM, C, k)
        for q in exp:
            g = [(e, d) for _, e, d in sorted(got.get(q, []))]
            assert g == exp[q], (k, lev, q)


def test_pip_inverted_loops(spark):
    loops = pip.synth_loops(4)
    inv = {pid: Loop(lp.vertices[::-1].copy())
           for pid, lp in loops.items()}
    ev = dataset.geotagged_events(spark, SF_DIR) \
        .select("event_id", "cell_id", "x", "y", "z")
    rows = ev.collect()
    ids = np.array([r["event_id"] for r in rows])
    xyz = np.array([[r["x"], r["y"], r["z"]] for r in rows])
    expected = set()
    for pid, lp in inv.items():
        for i in np.nonzero(lp.contains_points(xyz))[0]:
            expected.add((int(ids[i]), pid))
    got = {(r["event_id"], r["poly_id"]) for r in
           pip.pip_join(ev, spark, inv, point_id="event_id").collect()}
    assert got == expected
    assert len(expected) > len(rows) * 3  # complements cover most points


def test_buffer_extreme_radii():
    """Buffer guarantees at the extremes: radius >= pi covers the
    sphere; huge negative radius erodes to nothing; the certified
    interior never exceeds the sphere's leaf total."""
    from s2spark.kernels import buffer as bu
    from s2spark.kernels import cellid as ci
    loop = pip.synth_loops(3)[0]
    total = 6 * 4 ** 30
    interior, band = bu.classify_buffer(loop, np.pi, max_level=3)
    leaves = int(ci.lsb(np.asarray(interior, dtype=np.int64)
                        .view(np.uint64)).sum())
    assert leaves == total and len(band) == 0  # whole sphere, no band
    interior, band = bu.classify_buffer(loop, -np.pi, max_level=3)
    assert len(interior) == 0 and len(band) == 0  # eroded away


def test_overlay_identical_and_inverted_loops():
    """op(A, A): intersection == difference-complement; op(A, A^c):
    empty intersection at any subdivision."""
    from s2spark.kernels import boolean as bk
    from s2spark.kernels import cellid as ci
    a = pip.synth_loops(3)[1]
    inv = Loop(a.vertices[::-1].copy())
    cells = bk.classify_pair(a, a, 7)
    c = bk.op_counts(cells)
    assert c["difference"]["interior_leaves"] == 0
    assert c["symmetric_difference"]["interior_leaves"] == 0
    assert c["intersection"]["interior_leaves"] \
        == c["union"]["interior_leaves"]
    cells2 = bk.classify_pair(a, inv, 7)
    c2 = bk.op_counts(cells2)
    assert c2["intersection"]["interior_leaves"] == 0
    # A union A^c covers everything outside the boundary band
    total = 6 * 4 ** 30
    bnd = cells2["cell"][(cells2["sa"] == bk.BND)
                         | (cells2["sb"] == bk.BND)].view(np.uint64)
    band_leaves = int(ci.lsb(bnd).sum())
    assert c2["union"]["interior_leaves"] + band_leaves == total


def test_hull_degenerate_collinear_points():
    """Points along one geodesic: the hull is the degenerate lune —
    every input point must still be within the hull loop or on it."""
    from s2spark.kernels import hull as hk
    t = np.linspace(0.1, 1.2, 9)
    pts = np.stack([np.cos(t), np.sin(t), np.zeros_like(t)], axis=1)
    got = hk.convex_hull(pts)
    assert got is not None
    # endpoints of the chain must be the extremes
    keys = {tuple(p) for p in got}
    assert tuple(pts[0]) in keys and tuple(pts[-1]) in keys


def test_snap_level0_collapses_to_faces(spark):
    from s2spark.ops import snap as snap_ops
    ev = dataset.geotagged_events(spark, SF_DIR).select(
        "event_id", "user_id", "ts", "cell_id")
    out = snap_ops.snap_track(ev, "user_id", ["ts", "event_id"], 0) \
        .select("snap_cell").distinct().collect()
    assert 1 <= len(out) <= 6  # only face cells survive


# --- exact CompareDistances (round 3): double-tied chord² pairs -------

# Adversarial fixtures found by ulp-perturbation search: for each,
# the double-computed chord² distances are EXACTLY EQUAL while the
# exact rational distances differ (a is truly farther in all three).
CMP_DIST_FIXTURES = [
    ([-0.7232125608564248, 0.6643997988720267, 0.1885112704277984],
     [-0.652390855906025, -0.2505973831822934, 0.7152531878100167],
     [-0.6523908559060251, -0.2505973831822934, 0.7152531878100167]),
    ([0.7698530935518757, 0.2961064089492611, 0.565373512757522],
     [0.7042543049031721, -0.44210831863196765, 0.5554872713409054],
     [0.7042543049031722, -0.44210831863196765, 0.5554872713409054]),
    ([-0.7490984809866346, -0.3810080927337672, 0.5419264701552176],
     [-0.853286789973443, -0.0836567531195539, -0.5146874796556755],
     [-0.853286789973443, -0.08365675311955391, -0.5146874796556755]),
]


def test_compare_distances_resolves_double_ties():
    from fractions import Fraction

    from s2spark.kernels import predicates as pr
    for x, a, b in CMP_DIST_FIXTURES:
        xa = np.array([x]); aa = np.array([a]); bb = np.array([b])
        # the doubles cannot tell them apart...
        assert float(((xa - aa) ** 2).sum()) == float(((xa - bb) ** 2).sum())
        assert pr.triage_compare_distances(xa, aa, bb)[0] == 0
        # ...the exact ladder can, and agrees with ground truth
        da = sum((Fraction(u) - Fraction(v)) ** 2 for u, v in zip(x, a))
        db = sum((Fraction(u) - Fraction(v)) ** 2 for u, v in zip(x, b))
        truth = 1 if da > db else -1
        assert pr.compare_distances(xa, aa, bb)[0] == truth
        # antisymmetry
        assert pr.compare_distances(xa, bb, aa)[0] == -truth


def test_compare_distances_matches_doubles_when_clear():
    from s2spark.kernels import predicates as pr
    rng = np.random.RandomState(17)
    x = rng.randn(500, 3); a = rng.randn(500, 3); b = rng.randn(500, 3)
    for v in (x, a, b):
        v /= np.linalg.norm(v, axis=1, keepdims=True)
    s = pr.compare_distances(x, a, b)
    d = ((x - a) ** 2).sum(1) - ((x - b) ** 2).sum(1)
    clear = np.abs(d) > 1e-10
    assert (s[clear] == np.sign(d[clear])).all()


def test_knn_exact_ties_orders_by_true_distance(spark):
    """A point index containing a double-tied pair: the default kNN
    breaks the tie by id, knn_join_exact_ties by the TRUE (rational)
    distance — pinned to the fixture's ground truth."""
    import pandas as pd

    from s2spark.kernels import cellid as ci
    from s2spark.ops import knn as knn_ops
    x, a, b = CMP_DIST_FIXTURES[0]
    # point 1 = a (truly farther), point 2 = b (truly nearer)
    pts = pd.DataFrame({
        "point_id": [1, 2],
        "x": [a[0], b[0]], "y": [a[1], b[1]], "z": [a[2], b[2]]})
    qs = pd.DataFrame({"query_id": [7], "x": [x[0]], "y": [x[1]],
                       "z": [x[2]]})
    for pdf in (pts, qs):
        pdf["cell_id"] = ci.as_i64(ci.from_xyz(
            pdf["x"].to_numpy(), pdf["y"].to_numpy(),
            pdf["z"].to_numpy()))
    P = spark.createDataFrame(pts)
    Q = spark.createDataFrame(qs)
    exact = knn_ops.knn_join_exact_ties(
        P, Q, 2, "query_id", "point_id", level=0, max_rounds=1) \
        .orderBy("rank").collect()
    # true order: b (id 2) nearer than a (id 1)
    assert [r["point_id"] for r in exact] == [2, 1]
    default = knn_ops.knn_join(P, Q, 2, "query_id", "point_id",
                               level=0, max_rounds=1) \
        .orderBy("rank").collect()
    # the double path ties and falls back to id order — the fixture
    # would silently invert without the exact ladder
    assert [r["point_id"] for r in default] == [1, 2]
