"""S2ValidQuery / S2LegacyValidQuery — index-wide geometry validation
over mixed-dimension shape collections (s2validation_query.h:52-136).

Two semantic classes, mirroring the reference exactly:

- ``valid_query(shapes)`` — the least strict class, the requirements
  for S2BooleanOperation compatibility (s2validation_query.h:345-370):
  unit/finite vertices, no antipodal edges, degenerate + reverse-
  duplicate edges allowed, polygon interiors disjoint from all other
  geometry (no polygon-edge crossings, no duplicate polygon edges, no
  geometry contained in another polygon, chains may touch at vertices
  but not cross there), every polygon chain oriented interior-on-left.
- ``valid_query(shapes, legacy=True)`` — S2LegacyValidQuery
  (s2validation_query.h:534-546): additionally no degenerate edges, no
  reverse-duplicate edges, uniform dimensionality, no duplicate
  vertices within a chain, polygon chains >= 3 vertices.

The orientation check reproduces CheckChainOrientation
(s2validation_query.h:986-1063): the shape's winding field is anchored
at the first vertex with a nonzero S2ContainsVertexQuery sign (the
reference anchors via GetReferencePoint + per-cell contains_center,
which resolves to the same local decision), then every other chain's
probe vertex must satisfy ``winding(v) == (contains_sign(v) > 0)``
where winding differences are summed with signed edge-or-vertex
crossings along the anchor->v geodesic (s2edge_crosser.h:160-179
sign convention: +1 when the far endpoint is left of the crossed
edge).

Shapes are ``VShape(dim, chains)`` with lax-shape chain semantics
(dim 2 chains implicitly closed, interior on the left); a full
polygon is ``VShape(2, [], is_full=True)``.  ``parse_index`` reads
the reference's s2textformat index strings ("points # lines #
polygons", s2text_format.h MakeIndexOrDie grammar).
"""

from __future__ import annotations

import math

import numpy as np

from . import predicates
from .loops import Loop, parse_vertices

__all__ = ["VShape", "parse_index", "valid_query", "ERROR_CODES"]

ERROR_CODES = (
    "OK", "INVALID_DIMENSION", "INVALID_VERTEX", "NOT_UNIT_LENGTH",
    "DUPLICATE_VERTICES", "ANTIPODAL_VERTICES",
    "LOOP_NOT_ENOUGH_VERTICES", "POLYGON_EMPTY_LOOP",
    "OVERLAPPING_GEOMETRY", "POLYGON_INCONSISTENT_LOOP_ORIENTATIONS",
)

_UNIT_TOL = 5e-14  # |norm-1| bound, matches ops.validate._loop_error


class VShape:
    """A shape in the collection: dim 0 (points), 1 (polylines) or 2
    (lax polygon).  ``chains`` is a list of (n,3) float64 vertex
    arrays; dim-2 chains are implicitly closed (lax semantics)."""

    __slots__ = ("dim", "chains", "is_full")

    def __init__(self, dim: int, chains, is_full: bool = False):
        self.dim = dim
        self.chains = [np.asarray(c, dtype=np.float64).reshape(-1, 3)
                       for c in chains]
        self.is_full = bool(is_full)

    def edges(self) -> list[tuple[int, int, tuple, tuple]]:
        """Directed edges as (chain_id, offset, v0, v1) tuples.
        dim 0: one degenerate edge per point; dim 1: open chains;
        dim 2: closed chains (single-vertex chain = point loop with
        one degenerate edge, matching S2LaxPolygonShape)."""
        out = []
        for ci, v in enumerate(self.chains):
            n = len(v)
            if self.dim == 0:
                for k in range(n):
                    p = tuple(v[k])
                    out.append((ci, k, p, p))
            elif self.dim == 1:
                for k in range(n - 1):
                    out.append((ci, k, tuple(v[k]), tuple(v[k + 1])))
            else:
                for k in range(n):
                    out.append((ci, k, tuple(v[k]), tuple(v[(k + 1) % n])))
        return out


def parse_index(text: str) -> list[VShape]:
    """s2textformat index string -> shapes ("pts # lines # polygons";
    '|' separates shapes, ';' separates polygon loops, 'full' is the
    full polygon)."""
    parts = text.split("#")
    if len(parts) != 3:
        raise ValueError("index string needs 2 '#' separators")
    shapes: list[VShape] = []
    pts = [parse_vertices(p) for p in parts[0].split("|") if p.strip()]
    if pts:
        shapes.append(VShape(0, [p for p in pts]))
    for line in parts[1].split("|"):
        if line.strip():
            shapes.append(VShape(1, [parse_vertices(line)]))
    for poly in parts[2].split("|"):
        if not poly.strip():
            continue
        if poly.strip() == "full":
            shapes.append(VShape(2, [], is_full=True))
            continue
        chains = [parse_vertices(lp) for lp in poly.split(";")
                  if lp.strip()]
        shapes.append(VShape(2, chains))
    return shapes


# ---------------------------------------------------------------------------
# S2ContainsVertexQuery (s2contains_vertex_query.h:74-99,
# s2contains_vertex_query.cc:30-49)

def _contains_vertex(v: tuple, edges) -> tuple[bool, int]:
    """-> (duplicate_edges, contains_sign) for the edges of one shape
    incident on v.  Sign is +1 contained / -1 not / 0 when incident
    edges are matched sibling pairs (undecidable locally)."""
    em: dict[tuple, int] = {}
    for (_, _, p, q) in edges:
        if p == v and q == v:
            continue  # degenerate edge at v: no local signal
        if p == v:
            em[q] = em.get(q, 0) + 1
        elif q == v:
            em[p] = em.get(p, 0) - 1
    dup = any(abs(x) >= 2 for x in em.values())
    rd = predicates.ref_dir(v)
    best_p, best_s = rd, 0
    for w in sorted(em):
        net = em[w]
        if net == 0:
            continue
        if predicates.ordered_ccw(rd, best_p, w, v):
            best_p, best_s = w, (1 if net > 0 else -1)
    return dup, best_s


def _svc_sum(a: tuple, b: tuple, P: np.ndarray, Q: np.ndarray,
             pt: list, qt: list) -> int:
    """Signed edge-or-vertex crossings of the geodesic a->b with the
    directed edges (P,Q): winding(b) - winding(a)."""
    if a == b:
        return 0
    n = len(pt)
    if n == 0:
        return 0
    A = np.broadcast_to(np.asarray(a, dtype=np.float64), (n, 3))
    B = np.broadcast_to(np.asarray(b, dtype=np.float64), (n, 3))
    cs = predicates.crossing_sign(A, B, P, Q)
    total = 0
    for i in np.flatnonzero(cs == 1):
        s = predicates._sign_scalar(pt[i], qt[i], b)
        total += 1 if s > 0 else -1
    for i in np.flatnonzero(cs == 0):
        total += predicates.signed_vertex_crossing(a, b, pt[i], qt[i])
    return total


def _check_orientation(shape: VShape) -> str | None:
    """CheckChainOrientation over every areal chain of one polygon
    shape (s2validation_query.h:986-1063)."""
    edges = shape.edges()
    pt = [e[2] for e in edges]
    qt = [e[3] for e in edges]
    P = np.array(pt, dtype=np.float64).reshape(-1, 3)
    Q = np.array(qt, dtype=np.float64).reshape(-1, 3)
    anchor: tuple | None = None
    anchor_w = 0
    for ci, v in enumerate(shape.chains):
        # need >= 2 distinct points to carry orientation
        if len(v) == 0 or (v == v[0]).all(axis=1).all():
            continue
        for k in range(len(v)):
            vt = tuple(v[k])
            if anchor is not None and vt == anchor:
                # The anchor defines the winding field, so probing it
                # is vacuous (the reference's cell-parity base makes
                # it informative there; our single-anchor field does
                # not) — move to the chain's next vertex.
                continue
            dup, sign = _contains_vertex(vt, edges)
            if not dup and sign == 0:
                continue  # matched siblings: probe the next vertex
            if dup:
                return "POLYGON_INCONSISTENT_LOOP_ORIENTATIONS"
            if anchor is None:
                # First unbalanced vertex anchors the winding field
                # (s2shapeutil_get_reference_point semantics).
                anchor, anchor_w = vt, (1 if sign > 0 else 0)
                break
            w = anchor_w + _svc_sum(anchor, vt, P, Q, pt, qt)
            if w != (1 if sign > 0 else 0):
                return "POLYGON_INCONSISTENT_LOOP_ORIENTATIONS"
            break
    return None


# ---------------------------------------------------------------------------
# per-vertex chain-crossing check (CheckVertexCrossings,
# s2validation_query.h:1087-1166 + SortEdgesCcw :417-462)

class _IncEdge:
    __slots__ = ("v0", "v1", "eid", "chain", "prev", "sign", "other")

    def __init__(self, v0, v1, eid, chain, prev, sign):
        self.v0, self.v1 = v0, v1
        self.eid, self.chain, self.prev = eid, chain, prev
        self.sign = sign               # -1 outgoing / +1 incoming
        self.other = v1 if sign < 0 else v0


def _sort_edges_ccw(origin: tuple, recs: list[_IncEdge]) -> list[_IncEdge]:
    import functools
    first = recs[0]
    first_key = (first.v0, first.v1)
    first_vertex = first.other

    def cmp(a: _IncEdge, b: _IncEdge) -> int:
        ka, kb = (a.v0, a.v1), (b.v0, b.v1)
        if ka == kb:
            return 0
        if ka == (kb[1], kb[0]):   # reverse duplicates: v0==origin first
            return -1 if a.v0 == origin else 1
        if ka == first_key or kb == first_key:
            return -1 if ka == first_key else 1
        return (-1 if predicates.ordered_ccw(first_vertex, a.other,
                                             b.other, origin) else 1)

    return sorted(recs, key=functools.cmp_to_key(cmp))


def _check_vertex_crossings(shape: VShape) -> str | None:
    incident: dict[tuple, list[_IncEdge]] = {}
    eid = 0
    for ci, v in enumerate(shape.chains):
        n = len(v)
        base = eid
        # degenerate edges {A,A} carry no wedge, but chain `prev` ids
        # must skip over them (ADVICE r4: a prev pointing at a skipped
        # degenerate edge makes the wedge scan never find the matching
        # incoming edge and valid geometry is rejected — the reference
        # allows {A,A} edges, s2validation_query.h:212)
        nondegen = [k for k in range(n)
                    if tuple(v[k]) != tuple(v[(k + 1) % n])]
        pos = {k: idx for idx, k in enumerate(nondegen)}
        for k in range(n):
            p, q = tuple(v[k]), tuple(v[(k + 1) % n])
            if p == q:
                eid += 1
                continue
            prev = base + nondegen[pos[k] - 1]
            incident.setdefault(p, []).append(
                _IncEdge(p, q, eid, ci, prev, -1))
            incident.setdefault(q, []).append(
                _IncEdge(p, q, eid, ci, prev, +1))
            eid += 1
    for origin, recs in incident.items():
        if len(recs) <= 2:
            continue  # a single in/out pair cannot cross anything
        recs = _sort_edges_ccw(origin, recs)
        m = len(recs)
        for i in range(m):
            curr = recs[i]
            if curr.sign > 0:
                continue  # want outgoing edges
            sums: dict[int, int] = {}
            found = False
            for j in range(1, m):
                e = recs[(i + j) % m]
                if curr.chain == e.chain and curr.prev == e.eid \
                        and e.sign > 0:
                    if any(s != 0 for s in sums.values()):
                        return "OVERLAPPING_GEOMETRY"
                    found = True
                    break
                sums[e.chain] = sums.get(e.chain, 0) + e.sign
            if not found:
                return "INVALID_VERTEX"
    return None


# ---------------------------------------------------------------------------
# containment helpers

def _real_loops(shape: VShape) -> list[Loop]:
    """Chains that can carry interior (>= 3 vertices, not a pure
    out-and-back degenerate walk)."""
    from .shapeutil import _is_degenerate_lax
    out = []
    for v in shape.chains:
        if len(v) >= 3 and not _is_degenerate_lax(v):
            out.append(Loop(v))
    return out


def _polygon_contains(shape: VShape, p: tuple, model: str) -> bool:
    if shape.is_full:
        return True
    loops = _real_loops(shape)
    if not loops:
        return False
    from .layers import polygon_contains_points_model
    pts = np.asarray([p], dtype=np.float64)
    return bool(polygon_contains_points_model(loops, pts, model)[0])


# ---------------------------------------------------------------------------
# the query

def valid_query(shapes: list[VShape], legacy: bool = False) -> tuple[bool, str]:
    """Validate a shape collection -> (is_valid, error_code)."""
    # --- Start: legacy dimension uniformity -------------------------------
    if legacy:
        dims = {s.dim for s in shapes}
        if len(dims) > 1:
            return False, "INVALID_DIMENSION"

    # --- CheckShape (per shape, in order) ---------------------------------
    for s in shapes:
        if s.dim < 0 or s.dim > 2:
            return False, "INVALID_DIMENSION"
        if legacy and s.dim == 2:
            for v in s.chains:
                if 0 < len(v) < 3:
                    return False, "LOOP_NOT_ENOUGH_VERTICES"
        for v in s.chains:
            if not np.isfinite(v).all():
                return False, "INVALID_VERTEX"
            if len(v) and (np.abs(np.linalg.norm(v, axis=1) - 1.0)
                           > _UNIT_TOL).any():
                return False, "NOT_UNIT_LENGTH"
        for (_, _, p, q) in s.edges():
            if s.dim > 0 and legacy and p == q:
                return False, "DUPLICATE_VERTICES"
            if p == tuple(-x for x in q):
                return False, "ANTIPODAL_VERTICES"
        if s.dim == 2 and not s.is_full:
            err = _check_orientation(s)
            if err:
                return False, err

    # --- cell-phase checks (global over the collection) -------------------
    # legacy: duplicate vertices within one chain (edge v0s repeat)
    if legacy:
        for s in shapes:
            for ci, v in enumerate(s.chains):
                heads = (v if s.dim == 2 else v[:-1]) if s.dim else v
                seen: set[tuple] = set()
                for k in range(len(heads)):
                    t = tuple(heads[k])
                    if t in seen:
                        return False, "DUPLICATE_VERTICES"
                    seen.add(t)

    # duplicate polygon edges (exact always; reversed under legacy)
    seen_e: set[tuple] = set()
    for s in shapes:
        if s.dim != 2:
            continue
        for (_, _, p, q) in s.edges():
            if (p, q) in seen_e or (legacy and p != q and (q, p) in seen_e):
                return False, "OVERLAPPING_GEOMETRY"
            seen_e.add((p, q))

    # interior crossings: any pair involving a polygon edge
    flat: list[tuple] = []   # (dim, p, q)
    for s in shapes:
        if s.dim >= 1:
            flat.extend((s.dim, p, q) for (_, _, p, q) in s.edges()
                        if p != q)
    n = len(flat)
    if n >= 2:
        # Blocked pair enumeration (ADVICE r4: triu_indices over all
        # pairs allocates O(n^2) index arrays — multi-GB at ~20k
        # edges).  Each row block pairs with all later edges; a sound
        # bounding-cap prune (a minor arc stays within the chord cap
        # of its normalized midpoint, radius = chord to an endpoint)
        # cuts the exact crossing_sign work to near-overlapping pairs.
        dims = np.array([f[0] for f in flat])
        P = np.array([f[1] for f in flat])
        Q = np.array([f[2] for f in flat])
        M = P + Q  # |M| > 0: antipodal edges already rejected above
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        R = np.linalg.norm(P - Mn, axis=1)
        chunk = max(1, 4_000_000 // n)
        for lo in range(0, n - 1, chunk):
            bi = np.arange(lo, min(lo + chunk, n - 1))
            cnt = n - bi - 1
            i = np.repeat(bi, cnt)
            j = np.concatenate(
                [np.arange(b + 1, n) for b in bi]) if bi.size else bi
            keep = (dims[i] == 2) | (dims[j] == 2)
            i, j = i[keep], j[keep]
            if not i.size:
                continue
            near = (np.linalg.norm(Mn[i] - Mn[j], axis=1)
                    <= R[i] + R[j] + 1e-9)
            i, j = i[near], j[near]
            if not i.size:
                continue
            cs = predicates.crossing_sign(P[i], Q[i], P[j], Q[j])
            if (cs > 0).any():
                return False, "OVERLAPPING_GEOMETRY"

    # points contained in (other) polygons — semi-open model, matching
    # S2IndexCellData::ShapeContains (s2validation_query.h:955-983)
    polys = [s for s in shapes if s.dim == 2]
    for s in shapes:
        if s.dim != 0:
            continue
        for v in s.chains:
            for k in range(len(v)):
                p = tuple(v[k])
                for t in polys:
                    if t is s:
                        continue
                    if _polygon_contains(t, p, "semi_open"):
                        return False, "OVERLAPPING_GEOMETRY"

    # --- Finish: chains crossing at vertices ------------------------------
    for s in shapes:
        if s.dim == 2:
            err = _check_vertex_crossings(s)
            if err:
                return False, err

    # --- Finish: polygon interiors disjoint (one vertex per chain,
    # OPEN vertex model — s2validation_query.h:1168-1219)
    for s in shapes:
        if s.dim == 0:
            continue
        for v in s.chains:
            if len(v) == 0:
                continue
            p = tuple(v[0])
            for t in polys:
                if t is s:
                    continue
                if _polygon_contains(t, p, "open"):
                    return False, "OVERLAPPING_GEOMETRY"

    return True, "OK"
