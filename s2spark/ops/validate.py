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


def _loop_error(v: np.ndarray) -> str | None:
    from ..kernels import predicates
    norms = np.linalg.norm(v, axis=1)
    if (np.abs(norms - 1.0) > 5e-14).any():
        return "not_unit_length"
    n = len(v)
    if n < 3:
        return "not_enough_vertices"
    nxt = np.roll(np.arange(n), -1)
    if any((v[i] == v[nxt[i]]).all() for i in range(n)):
        return "degenerate_edge"
    if any((v[i] == -v[nxt[i]]).all() for i in range(n)):
        return "antipodal_adjacent_vertices"
    # non-adjacent edge pairs: crossing or shared vertex is an error
    for i in range(n):
        for j in range(i + 1, n):
            if j == i or nxt[i] == j or nxt[j] == i:
                continue  # adjacent (shares a vertex by construction)
            cs = int(predicates.crossing_sign(
                v[i:i + 1], v[nxt[i]:nxt[i] + 1],
                v[j:j + 1], v[nxt[j]:nxt[j] + 1])[0])
            if cs > 0:
                return "edges_cross"
            if cs == 0:
                return "duplicate_vertex"
    return None


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
