"""S2ClosestCellQuery analogue (ops/cells.py): ring-indexed plan vs
brute broadcast sweep, exact distance kernel, plan hygiene."""

import numpy as np
import pandas as pd
import pytest

from s2spark import dataset
from s2spark.kernels import cellid as ci
from s2spark.kernels.coverer import RegionCoverer
from s2spark.ops import cells as cops
from s2spark.ops import pip
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def index_df(spark):
    loops = pip.synth_loops(10)
    rows = []
    for pid, lp in loops.items():
        rc = RegionCoverer(max_cells=10, min_level=4, max_level=10)
        rows.extend((int(c), pid) for c in ci.as_i64(
            np.array(rc.get_covering(lp), dtype=np.uint64)))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["icell", "label"]))


def _points(spark, n_mod=10):
    return (dataset.geotagged_events(spark, SF_DIR)
            .where(f"event_id % {n_mod} = 0")
            .select("event_id", "cell_id", "x", "y", "z"))


def test_ring_equals_brute_k2(spark, index_df):
    ev = _points(spark)
    key = ["event_id", "rank"]
    cols = key + ["icell", "label", "dist2"]
    brute = cops.closest_cell_join_brute(ev, index_df, "event_id", k=2) \
        .toPandas().sort_values(key, ignore_index=True)[cols]
    ring = cops.closest_cell_join(ev, index_df, "event_id", k=2,
                                  brute_threshold=1) \
        .toPandas().sort_values(key, ignore_index=True)[cols]
    assert brute.equals(ring)
    assert len(brute) > 0


def test_contained_points_have_zero_distance(spark, index_df):
    """Points whose leaf cell sits inside an index cell must report
    dist2 == 0 for their top hit."""
    ev = _points(spark)
    out = cops.closest_cell_join_brute(ev, index_df, "event_id", k=1) \
        .toPandas()
    idx = index_df.toPandas()
    u = idx["icell"].to_numpy(np.int64).view(np.uint64)
    lo = ci.as_i64(ci.range_min(u))
    hi = ci.as_i64(ci.range_max(u))
    pts = ev.toPandas()
    inside = set()
    for eid, c in zip(pts["event_id"], pts["cell_id"]):
        if ((lo <= c) & (c <= hi)).any():
            inside.add(int(eid))
    got_zero = {int(r.event_id) for r in out.itertuples()
                if r.dist2 == 0.0}
    assert inside == got_zero and len(inside) > 0


def test_kernel_matches_bruteforce_edges(spark):
    """point_cell_chord2 == min over the 4 cell edges (outside) and 0
    (inside), against a direct recomputation."""
    from s2spark.kernels.edges import point_segment_chord2
    from s2spark.kernels.region import Cell
    rng_cells = ci.as_i64(ci.parent(ci.from_latlng(
        np.array([10.0, -20.0, 45.0, 0.0]),
        np.array([30.0, 100.0, -60.0, 0.0])), 6))
    pts = np.array([Cell(int(c)).get_center() for c in rng_cells])
    # roll points so each is tested against a different cell
    p = np.vstack([pts, np.roll(pts, 1, axis=0)])
    cells = np.concatenate([rng_cells, rng_cells])
    got = cops.point_cell_chord2(p, cells)
    assert np.all(got[:4] == 0.0)  # centers are inside their own cell
    for i in range(4, 8):
        cell = Cell(int(cells[i]))
        vs = np.array([cell.get_vertex(k) for k in range(4)])
        want = min(float(point_segment_chord2(
            p[i:i + 1], vs[k:k + 1], vs[(k + 1) % 4:(k + 1) % 4 + 1])[0])
            for k in range(4))
        leaf = int(ci.as_i64(ci.from_xyz(*[np.array([v])
                                           for v in p[i]]))[0])
        u = np.array([cells[i]], dtype=np.int64).view(np.uint64)
        if ci.as_i64(ci.range_min(u))[0] <= leaf \
                <= ci.as_i64(ci.range_max(u))[0]:
            want = 0.0
        assert got[i] == want


def test_ring_plan_no_cartesian(spark, index_df):
    ev = _points(spark, 50)
    df = cops.closest_cell_join(ev, index_df, "event_id", k=1,
                                brute_threshold=1, max_rounds=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
