"""Cell-classified boolean operations on spherical polygons — the
S2BooleanOperation MVP (reference: s2boolean_operation.h:16-60).

The reference computes exact snap-rounded output geometry; this MVP
computes the boolean result as a CELL decomposition with exact
interior/boundary classification:

- `classify_pair(a, b, max_level)` subdivides the sphere, classifying
  every cell against BOTH loops with the exact predicates
  (Loop.edge_intersects_cell -> robust CrossingSign escalation ladder
  + crossing-parity contains): state IN / OUT / BND per loop.
  Terminal cells either have both states decided or sit at max_level
  on a boundary.
- `op_counts` derives intersection / union / difference / symmetric
  difference from the per-cell state pairs.  Exactness:
  * intersection: cell ⊆ int(A∩B) ⇔ (IN, IN) — EXACT; verified
    cell-for-cell against the reference's published a_intersect_b
    fixture loop (s2loop_test.cc:186-198).
  * difference: cell ⊆ int(A∩Bᶜ) ⇔ (IN, OUT) — EXACT (same fixture
    check vs a_minus_b / b_minus_a).
  * union / symmetric difference: (IN,·)∨(·,IN) is a CONSERVATIVE
    interior (a cell can lie inside A∪B yet straddle ∂A within B —
    deciding that needs boundary geometry the fixed classification
    doesn't carry); the gap lives entirely in the boundary band and
    `refine_boundary` closes it by center sampling.  The fixture test
    asserts the two-sided band bound.
  In all four cases interior_leaves equals exact leaf-set algebra
  over the SINGLE-loop interiors (∪/∩/∖ of the per-loop leaf sets) —
  the identity the DuckDB interval oracle recomputes independently.
- Boundary cells (max_level cells touching ∂A ∪ ∂B) carry the
  remaining uncertainty; `refine_boundary` classifies their centers
  with the exact crossing-parity kernel for a center-sampled estimate
  whose error is bounded by the boundary band area.

Everything here is driver/executor-side NumPy; the distributed
operator (one pair per applyInPandas group) lives in
s2spark/ops/boolean.py.
"""

from __future__ import annotations

import numpy as np

from . import cellid
from .region import Cell

OUT, IN, BND = 0, 1, 2

OPS = ("intersection", "union", "difference", "symmetric_difference")


def _state(loop, cell: Cell) -> int:
    if loop.edge_intersects_cell(cell).any():
        return BND
    return IN if loop.contains_point(cell.get_center()) else OUT


def classify_pair(a, b, max_level: int) -> np.ndarray:
    """-> structured array (cell:int64, sa:int8, sb:int8) of terminal
    cells; cells decidedly outside BOTH loops are pruned (they
    contribute to no op)."""
    rows: list[tuple[int, int, int]] = []

    def visit(cid: int, level: int, sa_parent: int, sb_parent: int):
        cell = Cell(cid)
        # a decided parent state is inherited — descendants of a fully
        # inside/outside cell cannot change state
        sa = sa_parent if sa_parent != BND else _state(a, cell)
        sb = sb_parent if sb_parent != BND else _state(b, cell)
        if sa != BND and sb != BND:
            if sa == IN or sb == IN:
                rows.append((cid, sa, sb))
            return
        if level >= max_level:
            rows.append((cid, sa, sb))
            return
        for ch in cellid.child(np.full(4, cid, dtype=np.uint64),
                               np.arange(4)):
            visit(int(ch), level + 1, sa, sb)

    for face in range(6):
        visit(int(cellid.from_face(np.array([face]))[0]), 0, BND, BND)
    out = np.zeros(len(rows), dtype=[("cell", np.int64),
                                     ("sa", np.int8), ("sb", np.int8)])
    for i, (c, sa, sb) in enumerate(rows):
        out[i] = (np.int64(np.uint64(c).astype(np.int64)), sa, sb)
    return out


def classify_loop(loop, max_level: int
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Single-loop exact decomposition -> (interior_cells,
    boundary_cells) int64 ids.  Interior cells are *fully inside* (no
    max_cells pruning, unlike RegionCoverer); boundary cells are the
    max_level cells meeting ∂loop.  Used as the independent per-
    polygon side of the overlay oracle."""
    interior: list[int] = []
    boundary: list[int] = []

    def visit(cid: int, level: int):
        cell = Cell(cid)
        s = _state(loop, cell)
        if s == IN:
            interior.append(cid)
            return
        if s == OUT:
            return
        if level >= max_level:
            boundary.append(cid)
            return
        for ch in cellid.child(np.full(4, cid, dtype=np.uint64),
                               np.arange(4)):
            visit(int(ch), level + 1)

    for face in range(6):
        visit(int(cellid.from_face(np.array([face]))[0]), 0)
    as_i64 = lambda v: cellid.as_i64(np.array(v, dtype=np.uint64))  # noqa
    return as_i64(interior), as_i64(boundary)


def _op_mask(sa: np.ndarray, sb: np.ndarray, op: str) -> np.ndarray:
    if op == "intersection":
        return (sa == IN) & (sb == IN)
    if op == "union":
        return (sa == IN) | (sb == IN)
    if op == "difference":
        return (sa == IN) & (sb == OUT)
    if op == "symmetric_difference":
        return ((sa == IN) & (sb == OUT)) | ((sb == IN) & (sa == OUT))
    raise ValueError(op)


def op_counts(cells: np.ndarray) -> dict[str, dict[str, int]]:
    """Per-op exact interior leaf counts + the shared boundary-cell
    count (max_level cells where either state is BND)."""
    sa, sb = cells["sa"], cells["sb"]
    ids = cells["cell"].view(np.uint64)
    leaves = cellid.lsb(ids).astype(np.int64)
    bnd = int(((sa == BND) | (sb == BND)).sum())
    out = {}
    for op in OPS:
        m = _op_mask(sa, sb, op)
        out[op] = {"interior_leaves": int(leaves[m].sum()),
                   "interior_cells": int(m.sum()),
                   "boundary_cells": bnd}
    return out


def exact_op_counts(a, b, max_level: int) -> dict[str, dict[str, int]]:
    """EXACT cell classification for ALL FOUR ops — closes the
    conservative ∪/Δ band of `op_counts` (reference exactness:
    s2boolean_operation.h:16-60 decides every region point exactly).

    Method: build the exact boolean output geometry with the S2Builder
    MVP (builder.overlay_geometry, identity snap — output vertices are
    the exact input doubles plus exact-escalated crossing points), wrap
    it as an even/odd region (builder.ResultRegion), and run the
    single-region decomposition `classify_loop` against it.  A cell is
    IN iff it truly lies in int(op(A,B)) — including cells that
    straddle BOTH input boundaries while sitting inside A∪B, which the
    state-pair mask of `op_counts` can only call boundary — and the
    boundary band is exactly the max_level cells meeting ∂(op(A,B)):
    for B ⊆ A the union's band is ∂A's alone, with ∂B contributing
    nothing (asserted against the single-loop decomposition in
    tests/test_boolean.py).  Zero refinement term remains: the
    interval identity |A∪B| = |A|+|B|−|A∩B| holds exactly on the
    region MEASURES these decompositions converge to, while at fixed
    max_level exact_op_counts ≥ op_counts with the surplus contained
    in the old band (also asserted).

    ∩ and − were already exact in `op_counts` (a cell inside int(A∩B)
    cannot meet either boundary), so for those two ops the interior
    sets coincide; ∪/Δ may gain cells.  Scope matches the builder MVP
    (no inverted loops / full-sphere results).
    """
    from .builder import ResultRegion, overlay_geometry
    out = {}
    for op in OPS:
        region = ResultRegion(overlay_geometry(a, b, op))
        interior, boundary = classify_loop(region, max_level)
        leaves = int(cellid.lsb(interior.view(np.uint64))
                     .astype(np.int64).sum()) if len(interior) else 0
        out[op] = {"interior_leaves": leaves,
                   "interior_cells": int(len(interior)),
                   "boundary_cells": int(len(boundary))}
    return out


def refine_boundary(cells: np.ndarray, a, b, op: str) -> int:
    """Center-sampled leaf count of the boundary band's contribution
    to `op` (exact crossing-parity verdicts at each boundary cell
    center); interior_leaves + this is the refined area estimate."""
    m = (cells["sa"] == BND) | (cells["sb"] == BND)
    if not m.any():
        return 0
    ids = cells["cell"][m].view(np.uint64)
    centers = np.array([Cell(int(c)).get_center() for c in ids])
    in_a = np.where(cells["sa"][m] == BND,
                    a.contains_points(centers), cells["sa"][m] == IN)
    in_b = np.where(cells["sb"][m] == BND,
                    b.contains_points(centers), cells["sb"][m] == IN)
    if op == "intersection":
        sel = in_a & in_b
    elif op == "union":
        sel = in_a | in_b
    elif op == "difference":
        sel = in_a & ~in_b
    else:
        sel = in_a ^ in_b
    leaves = cellid.lsb(ids).astype(np.int64)
    return int(leaves[sel].sum())
