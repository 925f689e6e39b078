"""Density tree (S2DensityTree analogue) vs brute-force pandas."""

import numpy as np

from s2spark import dataset
from s2spark.ops import density
from tests.conftest import SF_DIR


def test_density_tree_vs_brute(spark):
    ev = dataset.geotagged_events(spark, SF_DIR).select("cell_id")
    t, maxl = 16, 5
    tree = density.density_tree(ev, "cell_id", threshold=t,
                                max_level=maxl).toPandas()
    cells = np.array([r["cell_id"] for r in ev.collect()],
                     dtype=np.int64).view(np.uint64)

    # brute force: weights per level from the raw leaf ids
    def prefix(ids, lv):
        return ids >> np.uint64(2 * (30 - lv) + 1)

    from collections import Counter
    got = {(int(r.level), int(r.cell)): (int(r.weight), bool(r.is_leaf))
           for r in tree.itertuples()}
    visited = None
    n_checked = 0
    for lv in range(maxl + 1):
        w = Counter(int(v) for v in prefix(cells, lv))
        if visited is None:
            vis = set(w)
        else:
            vis = {c for c in w if (c >> 2) in visited}
        for c in vis:
            leaf = w[c] <= t or lv == maxl
            assert got[(lv, int(c))] == (w[c], leaf)
            n_checked += 1
        visited = {c for c in vis if w[c] > t}
    assert n_checked == len(got)
    assert n_checked > 10


def test_partition_plan_splits(spark):
    ev = dataset.geotagged_events(spark, SF_DIR).select("cell_id")
    tree = density.density_tree(ev, "cell_id", threshold=16,
                                max_level=4)
    plan = density.partition_plan(tree, target=8).toPandas()
    assert (plan["n_splits"] >= 1).all()
    # every leaf with weight > target must split
    over = plan[plan["weight"] > 8]
    assert (over["n_splits"] > 1).all()
    # total planned weight equals the table size (leaves partition the
    # visited frontier)
    n = ev.count()
    assert plan["weight"].sum() == n
