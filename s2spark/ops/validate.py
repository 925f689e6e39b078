"""Geometry validation + shape nesting (S2ValidationQuery /
S2Loop::FindValidationError, s2loop.cc:189-260 and
s2shape_nesting_query.h:16-28 analogues).

- `validate_loops`: per-loop validity over a (poly_id, vertices)
  table, one applyInPandas group per loop: unit-length vertices,
  >= 3 vertices, no degenerate edges, no adjacent antipodal pairs,
  and no intersection between non-adjacent edges (robust
  CrossingSign; sign >= 0 for a non-adjacent pair — crossing OR
  shared vertex — is an error, matching the reference's
  duplicate-vertex + edges-cross rules).
- `loop_nesting`: nesting structure of a non-crossing loop set —
  depth = number of containing loops, parent = deepest container,
  is_hole = odd depth (first-ring semantics of the reference's
  nesting query).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..kernels.loops import Loop


# below this vertex count the all-pairs batch beats building the
# edge-cell index; above it candidate pairs come from index-cell
# co-location (the reference's strategy —
# s2shapeutil_visit_crossing_edge_pairs.h: visit index-cell-local
# pairs only, never the O(n^2) sweep)
BRUTE_VALIDATE_LIMIT = 96


def _all_pairs(n: int) -> tuple[np.ndarray, np.ndarray]:
    i, j = np.triu_indices(n, k=1)
    return i, j


def _indexed_pairs(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Candidate non-adjacent pairs from edge-cell co-location: a
    crossing point (or shared vertex) of two edges lies in some index
    cell intersected by both, so pairs co-located in >= 1 cell are a
    complete superset of all cs >= 0 pairs.  Cells hold
    <= MAX_EDGES_PER_CELL edges (bar the max-level floor), so the pair
    count is O(n), not O(n^2)."""
    from . import pip
    from ..kernels.loops import Loop
    _, edge_rows = pip._index_loop_rows(0, Loop(v), need_centers=False)
    by_cell: dict[int, list[int]] = {}
    for row in edge_rows:
        by_cell.setdefault(row[0], []).append(row[2])
    pairs: set[tuple[int, int]] = set()
    for es in by_cell.values():
        es.sort()
        m = len(es)
        for x in range(m):
            for y in range(x + 1, m):
                pairs.add((es[x], es[y]))
    if not pairs:
        return (np.empty(0, dtype=np.int64),) * 2
    arr = np.array(sorted(pairs), dtype=np.int64)
    return arr[:, 0], arr[:, 1]


def _loop_error(v: np.ndarray) -> str | None:
    from ..kernels import predicates
    norms = np.linalg.norm(v, axis=1)
    if (np.abs(norms - 1.0) > 5e-14).any():
        return "not_unit_length"
    n = len(v)
    if n < 3:
        return "not_enough_vertices"
    nxt = np.roll(np.arange(n), -1)
    if (v == v[nxt]).all(axis=1).any():
        return "degenerate_edge"
    if (v == -v[nxt]).all(axis=1).any():
        return "antipodal_adjacent_vertices"
    # non-adjacent edge pairs: crossing or shared vertex is an error.
    # One vectorized crossing_sign call over the candidate batch;
    # candidates are all pairs (small loops) or index-pruned pairs.
    if n <= BRUTE_VALIDATE_LIMIT:
        i, j = _all_pairs(n)
    else:
        i, j = _indexed_pairs(v)
    if i.size == 0:
        return None
    keep = (nxt[i] != j) & (nxt[j] != i)
    i, j = i[keep], j[keep]
    if i.size == 0:
        return None
    cs = predicates.crossing_sign(v[i], v[nxt[i]], v[j], v[nxt[j]])
    bad = cs >= 0
    if not bad.any():
        return None
    # deterministic report: lexicographically first offending pair
    # (matches the old scan order — pairs are generated sorted)
    k = int(np.flatnonzero(bad)[0])
    return "edges_cross" if cs[k] > 0 else "duplicate_vertex"


def validate_loops(loops_df: DataFrame) -> DataFrame:
    """loops_df: (poly_id, vertices array<double> flattened xyz) ->
    (poly_id, is_valid, error)."""
    schema = "poly_id long, is_valid boolean, error string"

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for pid, verts in zip(pdf["poly_id"].to_numpy(),
                              pdf["vertices"].to_numpy()):
            v = np.asarray(verts, dtype=np.float64).reshape(-1, 3)
            err = _loop_error(v)
            rows.append((int(pid), err is None, err or "ok"))
        return pd.DataFrame(rows, columns=["poly_id", "is_valid",
                                           "error"])

    return loops_df.groupBy("poly_id").applyInPandas(run, schema)


def loop_nesting(loops: dict[int, Loop]) -> pd.DataFrame:
    """Nesting structure of a non-crossing loop set: (loop_id, depth,
    parent_id, is_hole).  parent_id = -1 for top-level shells.
    Containment is decided by the robust vertex-sample relation
    (pip.loop_relations semantics)."""
    from . import pip
    rel = pip.loop_relations(loops)
    contains: dict[int, set[int]] = {k: set() for k in loops}
    for r in rel.itertuples():
        if r.relation == "contains":
            contains[r.loop_a].add(r.loop_b)
        elif r.relation == "contained":
            contains[r.loop_b].add(r.loop_a)
    containers: dict[int, set[int]] = {k: set() for k in loops}
    for a, kids in contains.items():
        for b in kids:
            containers[b].add(a)
    rows = []
    for k in sorted(loops):
        depth = len(containers[k])
        parent = -1
        if depth:
            # deepest container = the one contained by all others
            parent = max(containers[k],
                         key=lambda c: len(containers[c]))
        rows.append((k, depth, parent, depth % 2 == 1))
    return pd.DataFrame(rows, columns=["loop_id", "depth",
                                       "parent_id", "is_hole"])


def validate_collections(coll_df: DataFrame) -> DataFrame:
    """S2ValidQuery / S2LegacyValidQuery over a table of shape
    collections (s2validation_query.h:345-546): coll_df is
    (index_id long, geometry string) where geometry is an
    s2textformat index string ("points # lines # polygons").  Each
    row validates independently under BOTH query classes ->
    (index_id, is_valid, code, legacy_valid, legacy_code).

    Scale note: one row = one geometry collection; the Arrow batch
    carries many collections and the kernel is pure NumPy per row, so
    the op partitions on rows with no shuffle at all (narrow
    mapInPandas over the scan)."""
    from ..kernels import validation as vq

    schema = ("index_id long, is_valid boolean, code string, "
              "legacy_valid boolean, legacy_code string")

    def run(batches):
        for pdf in batches:
            rows = []
            for iid, geom in zip(pdf["index_id"].to_numpy(),
                                 pdf["geometry"].to_numpy()):
                shapes = vq.parse_index(str(geom))
                ok, code = vq.valid_query(shapes)
                lok, lcode = vq.valid_query(shapes, legacy=True)
                rows.append((int(iid), bool(ok), code,
                             bool(lok), lcode))
            yield pd.DataFrame(rows, columns=[
                "index_id", "is_valid", "code",
                "legacy_valid", "legacy_code"])

    return coll_df.mapInPandas(run, schema)
