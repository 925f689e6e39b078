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
