"""S2Builder snap-rounding MVP + exact boolean output GEOMETRY.

The reference assembles output polygons from edge soups via a
snap-rounding graph (s2builder.h:30-61, s2builder_graph.h) and layers
(s2builderutil_s2polygon_layer.h); S2BooleanOperation rides on it to
emit the actual vertex chains of A∩B / A∪B / A−B / AΔB
(s2boolean_operation.h:16-60).  This module re-derives the same
*semantics* with a compact arrangement-tracing formulation:

1. **Crossing subdivision** — every edge of A is split at its interior
   crossings with edges of B (and vice versa), using the robust
   CrossingSign ladder (kernels/predicates.py) and the exact-escalating
   GetIntersection (kernels/edges.edge_intersection).  Each crossing
   point is computed ONCE per edge pair and inserted into both chains,
   so the two sides share bit-identical vertices.
2. **Edge classification** — a sub-edge's midpoint is strictly inside
   or outside the other region (crossing parity, multi-loop even/odd);
   the per-op keep/reverse table is the reference's boundary algebra:
     intersection:  A-edges in B,   B-edges in A
     union:         A-edges out B,  B-edges out A
     difference:    A-edges out B,  B-edges in A REVERSED
     symmetric_difference: every edge; reversed when inside the other
3. **Snap rounding** — vertices map to snap SITES (CellIdSnapFunction:
   center of the level-L cell, like the reference's
   s2builderutil::S2CellIdSnapFunction; IdentitySnapFunction keeps the
   exact doubles).  Edges whose endpoints snap together collapse;
   duplicate directed edges dedupe; sibling pairs (u→v and v→u)
   cancel — the degenerate-edge handling of the polygon layer.
4. **Stitching** — walk the directed-edge graph keeping the interior on
   the LEFT: at a degree>2 site the successor of (q→p) is the outgoing
   edge with the minimum CLOCKWISE tangent-plane angle from the
   reversed incoming direction (the face-tracing rule of a DCEL).
   Chains are canonically rotated (lexicographically smallest site
   first) and ordered, so output is deterministic.

Exactness: for inputs whose crossings are transverse (or meet at
shared vertices), the output chains consist of input vertices and
computed crossing points only, and equal the reference's published
result loops bit-for-bit on the s2loop_test.cc:186-198 diamond pair
(tests/test_builder.py).  Out of MVP scope (documented): overlapping
collinear boundary segments, inverted (full-sphere-complement) loops,
and snap levels coarse enough to create NEW crossings between snapped
edges (the reference iterates snap rounding until stable; callers here
must pick snap_level fine relative to the geometry — validated by
tests via loop_validation on the outputs).
"""

from __future__ import annotations

import math

import numpy as np

from . import cellid, predicates
from .edges import edge_intersection
from .loops import Loop

OPS = ("intersection", "union", "difference", "symmetric_difference")


# ---------------------------------------------------------------------------
# snap functions (s2builder.h:30-61 snap-function contract)

class IdentitySnapFunction:
    """No-op snap: sites are the exact input doubles (keyed by their
    IEEE bytes, so shared crossing points unify exactly)."""

    def site_key(self, p: np.ndarray):
        return (float(p[0]), float(p[1]), float(p[2]))

    def site_point(self, key, p: np.ndarray) -> np.ndarray:
        return np.asarray(p, dtype=np.float64)


class CellIdSnapFunction:
    """Snap to level-L cell centers (s2builderutil S2CellIdSnapFunction
    semantics): the site key is the level-L cell id holding the point,
    the site point is that cell's center."""

    def __init__(self, level: int):
        self.level = int(level)

    def site_key(self, p: np.ndarray):
        leaf = cellid.from_xyz(np.array([p[0]]), np.array([p[1]]),
                               np.array([p[2]]))
        return int(cellid.parent(leaf, self.level)[0])

    def site_point(self, key, p: np.ndarray) -> np.ndarray:
        from .region import Cell
        return np.asarray(Cell(int(key)).get_center(), dtype=np.float64)


class IntLatLngSnapFunction:
    """Snap to integer lat/lng at 10^exponent per degree
    (s2builderutil_snap_functions.h IntLatLngSnapFunction): the site
    key is the rounded (lat·s, lng·s) integer pair, the site point is
    that grid point — the snap the reference's RoundToE(k) fixture
    options use (s2boolean_operation_test.cc:60-75)."""

    def __init__(self, exponent: int):
        self.scale = 10.0 ** int(exponent)

    def site_key(self, p: np.ndarray):
        from .region import _latitude, _longitude
        lat = math.degrees(_latitude(p))
        lng = math.degrees(_longitude(p))
        return (int(round(lat * self.scale)),
                int(round(lng * self.scale)))

    def site_point(self, key, p: np.ndarray) -> np.ndarray:
        from .region import latlng_to_point
        return np.asarray(latlng_to_point(
            math.radians(key[0] / self.scale),
            math.radians(key[1] / self.scale)), dtype=np.float64)


# ---------------------------------------------------------------------------
# crossing subdivision

def _parity_contains(loops: list[Loop], points: np.ndarray) -> np.ndarray:
    """Multi-loop even/odd containment with INTERIOR-ON-LEFT
    orientation semantics (the reference's lax-polygon /
    GetReferencePoint construction, s2shapeutil_get_reference_point.h):
    membership is the XOR of per-loop oriented containment, CALIBRATED
    so that a point just to the LEFT of any boundary edge tests inside
    (by definition the region lies on the left of its oriented
    boundary).  The raw XOR differs from the true crossing parity by a
    constant (each loop's origin_inside convention); one probe at the
    left-nudged midpoint of the first edge fixes the constant.  This
    is exact for any oriented even/odd region — nested shells/holes
    (CW holes) AND loops larger than a hemisphere, where curvature-
    sign orientation tests fail (a CCW 100-degree cap has negative
    curvature)."""
    acc = np.zeros(points.shape[0], dtype=np.int64)
    for lp in loops:
        acc += lp.contains_points(points)
    member = (acc % 2) == 1
    if not loops:
        return member
    v = loops[0].vertices
    a0, a1 = v[0], v[1]
    n = np.cross(a0, a1)
    nn = float(np.linalg.norm(n))
    if nn == 0.0:
        return member
    n /= nn
    m = a0 + a1
    m /= float(np.linalg.norm(m))
    eps = 1e-9
    m_left = m * math.cos(eps) + n * math.sin(eps)
    probe = 0
    for lp in loops:
        probe += int(lp.contains_points(m_left[None, :])[0])
    calib = (probe % 2) == 0  # raw XOR says outside at an inside point
    return member ^ calib


def _loop_edges(loops: list[Loop]) -> list[tuple[np.ndarray, np.ndarray]]:
    out = []
    for lp in loops:
        v = lp.vertices
        w = np.roll(v, -1, axis=0)
        out.extend((v[i], w[i]) for i in range(v.shape[0]))
    return out


def _edge_param(a0: np.ndarray, a1: np.ndarray, x: np.ndarray) -> float:
    """Angle of x along the geodesic a0→a1 (0 at a0), used only to
    ORDER crossing points along an edge."""
    e2 = a1 - float(np.dot(a1, a0)) * a0
    n = float(np.linalg.norm(e2))
    if n == 0.0:
        return 0.0
    e2 /= n
    return math.atan2(float(np.dot(x, e2)), float(np.dot(x, a0)))


def subdivide_at_crossings(
        ea: list[tuple[np.ndarray, np.ndarray]],
        eb: list[tuple[np.ndarray, np.ndarray]],
) -> tuple[list[tuple[np.ndarray, np.ndarray]],
           list[tuple[np.ndarray, np.ndarray]]]:
    """Split every edge of each side at its interior crossings with the
    other side.  Vectorized CrossingSign over the full pair set; the
    (few) crossing pairs get one exact GetIntersection each, and the
    SAME point object lands in both sides' splits."""
    na, nb = len(ea), len(eb)
    if na == 0 or nb == 0:
        return list(ea), list(eb)
    a0 = np.repeat(np.array([e[0] for e in ea]), nb, axis=0)
    a1 = np.repeat(np.array([e[1] for e in ea]), nb, axis=0)
    b0 = np.tile(np.array([e[0] for e in eb]), (na, 1))
    b1 = np.tile(np.array([e[1] for e in eb]), (na, 1))
    cs = predicates.crossing_sign(a0, a1, b0, b1).reshape(na, nb)
    splits_a: list[list] = [[] for _ in range(na)]
    splits_b: list[list] = [[] for _ in range(nb)]
    for i, j in zip(*np.nonzero(cs > 0)):
        x = edge_intersection(ea[i][0], ea[i][1], eb[j][0], eb[j][1])
        splits_a[int(i)].append(x)
        splits_b[int(j)].append(x)

    def apply(edges, splits):
        out = []
        for (p0, p1), xs in zip(edges, splits):
            if not xs:
                out.append((p0, p1))
                continue
            xs = sorted(xs, key=lambda x: _edge_param(p0, p1, x))
            chain = [p0, *xs, p1]
            out.extend((chain[k], chain[k + 1])
                       for k in range(len(chain) - 1))
        return out

    return apply(ea, splits_a), apply(eb, splits_b)


# ---------------------------------------------------------------------------
# classification

def _keep_rule(op: str, side: str, inside_other: bool):
    """-> None (drop) | +1 (keep) | -1 (keep reversed)."""
    if op == "intersection":
        return 1 if inside_other else None
    if op == "union":
        return None if inside_other else 1
    if op == "difference":
        if side == "a":
            return None if inside_other else 1
        return -1 if inside_other else None
    if op == "symmetric_difference":
        return -1 if inside_other else 1
    raise ValueError(op)


def classify_edges(subs: list[tuple[np.ndarray, np.ndarray]],
                   other: list[Loop], side: str, op: str
                   ) -> list[tuple[np.ndarray, np.ndarray]]:
    """Keep/reverse sub-edges of one side per the op's boundary
    algebra; midpoint = normalized chord midpoint (sub-edges are
    never antipodal for valid inputs)."""
    if not subs:
        return []
    mids = np.array([s[0] + s[1] for s in subs], dtype=np.float64)
    mids /= np.linalg.norm(mids, axis=1, keepdims=True)
    inside = _parity_contains(other, mids)
    out = []
    for (p0, p1), ins in zip(subs, inside):
        r = _keep_rule(op, side, bool(ins))
        if r == 1:
            out.append((p0, p1))
        elif r == -1:
            out.append((p1, p0))
    return out


# ---------------------------------------------------------------------------
# graph assembly + stitching

def _tangent_angles(p: np.ndarray, targets: list[np.ndarray]) -> list[float]:
    """CCW tangent-plane bearings (viewed from outside the sphere) of
    each target direction at site p."""
    ref = np.array([0.0, 0.0, 1.0]) if abs(p[2]) < 0.9 \
        else np.array([1.0, 0.0, 0.0])
    e1 = np.cross(ref, p)
    e1 /= np.linalg.norm(e1)
    e2 = np.cross(p, e1)
    out = []
    for t in targets:
        d = t - float(np.dot(t, p)) * p
        out.append(math.atan2(float(np.dot(d, e2)), float(np.dot(d, e1))))
    return out


def stitch_loops(edges: list[tuple], sites: dict) -> list[list]:
    """Assemble directed site-key edges into closed chains, interior on
    the left: successor of (q→p) = outgoing edge at p with the minimum
    clockwise angle from the reverse-incoming direction (DCEL face
    tracing).  Deterministic: edges consumed in sorted order.
    Returns loops as lists of site keys, canonically rotated/ordered."""
    from collections import defaultdict
    adj: dict = defaultdict(list)
    for u, v in sorted(edges):
        adj[u].append(v)
    for u in adj:
        adj[u].sort()
    loops = []
    for u0, v0 in sorted(edges):
        if u0 not in adj or v0 not in adj[u0]:
            continue  # already consumed
        adj[u0].remove(v0)
        chain = [u0]
        prev, cur = u0, v0
        for _ in range(len(edges) + 1):
            if cur == u0:
                break
            chain.append(cur)
            outs = adj.get(cur, [])
            if not outs:
                chain = None  # dangling — degenerate input
                break
            if len(outs) == 1:
                nxt = outs[0]
            else:
                p = sites[cur]
                angs = _tangent_angles(
                    p, [sites[prev]] + [sites[k] for k in outs])
                back = angs[0]
                best, nxt = None, None
                for k, ang in zip(outs, angs[1:]):
                    cw = (back - ang) % (2.0 * math.pi)
                    if cw < 1e-15:
                        cw = 2.0 * math.pi  # don't immediately backtrack
                    if best is None or cw < best:
                        best, nxt = cw, k
            adj[cur].remove(nxt)
            prev, cur = cur, nxt
        else:
            chain = None
        if chain and len(chain) >= 3:
            k = chain.index(min(chain))
            loops.append(chain[k:] + chain[:k])
    loops.sort(key=lambda c: c[0])
    return loops


def _snap_edges(kept, snap) -> tuple[dict, dict]:
    """Map input edges to directed site-key edges (multiplicity kept),
    collapsing edges whose endpoints snap together."""
    sites: dict = {}
    seen: dict = {}
    for p0, p1 in kept:
        k0, k1 = snap.site_key(p0), snap.site_key(p1)
        if k0 == k1:
            continue  # edge collapsed by snapping
        sites.setdefault(k0, snap.site_point(k0, p0))
        sites.setdefault(k1, snap.site_point(k1, p1))
        seen[(k0, k1)] = seen.get((k0, k1), 0) + 1
    return seen, sites


# below this edge count the dense pair matrix beats the recursion
DENSE_STABILIZE_LIMIT = 256


def _stabilize_crossings(edges: list[tuple], sites: dict, snap,
                         max_rounds: int = 8) -> list[tuple]:
    """Snap rounding can create NEW crossings between snapped edges
    (the reference iterates until the arrangement is stable —
    s2builder.h:30-61 'idempotent snapping' discussion).  Each round
    finds proper crossings among the snapped edges with the robust
    CrossingSign ladder, splits both participants at the (snapped)
    intersection point, and repeats until crossing-free.  Shared-
    endpoint touches are legal output (CrossingSign <= 0) and don't
    trigger splits."""
    edges = list(edges)
    for _ in range(max_rounds):
        n = len(edges)
        if n < 2:
            return edges
        p0 = np.array([sites[u] for u, _ in edges])
        p1 = np.array([sites[v] for _, v in edges])
        if n <= DENSE_STABILIZE_LIMIT:
            ii, jj = np.triu_indices(n, k=1)
        else:
            # cell-co-location prefilter: O(n) candidate pairs instead
            # of the dense n x n cross product (~GBs per round at 10k
            # edges — ADVICE r3)
            from .loops import soup_candidate_pairs
            cand = soup_candidate_pairs(p0, p1)
            if not cand:
                return edges
            arr = np.array(sorted(cand), dtype=np.int64)
            ii, jj = arr[:, 0], arr[:, 1]
        cs = predicates.crossing_sign(p0[ii], p1[ii], p0[jj], p1[jj])
        sel = cs > 0
        crossing = [(int(i), int(j)) for i, j in
                    zip(ii[sel], jj[sel])]
        if not crossing:
            return edges
        splits: dict[int, list] = {}
        for i, j in crossing:
            x = edge_intersection(p0[i], p1[i], p0[j], p1[j])
            k = snap.site_key(x)
            if k not in sites:
                sites[k] = snap.site_point(k, x)
            splits.setdefault(i, []).append(k)
            splits.setdefault(j, []).append(k)
        out = []
        for idx, (u, v) in enumerate(edges):
            ks = [k for k in splits.get(idx, ())
                  if k != u and k != v]
            if not ks:
                out.append((u, v))
                continue
            ks = sorted(set(ks),
                        key=lambda k: _edge_param(sites[u], sites[v],
                                                  sites[k]))
            chain = [u, *ks, v]
            out.extend((chain[t], chain[t + 1])
                       for t in range(len(chain) - 1)
                       if chain[t] != chain[t + 1])
        edges = out
    return edges


def _cancel_siblings(seen: dict) -> list[tuple]:
    """Dedupe duplicate directed edges (multiplicity -> 1) and cancel
    sibling pairs (u→v plus v→u bounds zero area — the degenerate-edge
    handling of the polygon layer)."""
    return [(u, v) for (u, v) in sorted(seen) if (v, u) not in seen]


def build_loops(kept: list[tuple[np.ndarray, np.ndarray]],
                snap=None, stabilize: bool = True) -> list[np.ndarray]:
    """Snap + dedupe + sibling-cancel + crossing-stabilize + stitch ->
    list of (k,3) vertex arrays (snapped site points)."""
    if snap is None:
        snap = IdentitySnapFunction()
    seen, sites = _snap_edges(kept, snap)
    edges = _cancel_siblings(seen)
    if stabilize:
        edges = _stabilize_crossings(edges, sites, snap)
        # splitting can mint new duplicate/sibling pairs — re-cancel
        # until the edge set is a fixed point
        for _ in range(4):
            n0 = len(edges)
            edges = _cancel_siblings({e: 1 for e in edges})
            if len(edges) == n0:
                break
    chains = stitch_loops(edges, sites)
    return [np.array([sites[k] for k in chain], dtype=np.float64)
            for chain in chains]


def build_polylines(kept: list[tuple[np.ndarray, np.ndarray]],
                    snap=None, stabilize: bool = True
                    ) -> list[np.ndarray]:
    """S2PolylineVectorLayer semantics (reference
    s2builderutil_s2polyline_vector_layer.h:16-24): assemble the
    snapped directed-edge soup into maximal polylines.  Duplicate
    directed edges merge; sibling pairs are KEPT (a polyline may
    legitimately backtrack); open chains start at vertices with
    out-degree > in-degree, remaining cycles are emitted as closed
    chains (first == last).  Deterministic: starts and successors are
    taken in sorted site-key order."""
    if snap is None:
        snap = IdentitySnapFunction()
    seen, sites = _snap_edges(kept, snap)
    edges = sorted(seen)
    if stabilize:
        edges = _stabilize_crossings(edges, sites, snap)
        edges = sorted(set(edges))
    from collections import defaultdict
    adj: dict = defaultdict(list)
    indeg: dict = defaultdict(int)
    for u, v in edges:
        adj[u].append(v)
        indeg[v] += 1
    for u in adj:
        adj[u].sort()

    def walk(start):
        chain = [start]
        cur = start
        while adj.get(cur):
            cur = adj[cur].pop(0)
            chain.append(cur)
        return chain

    starts = []
    for u in sorted(adj):
        starts.extend([u] * max(0, len(adj[u]) - indeg[u]))
    chains = []
    for u in starts:
        if adj.get(u):
            chains.append(walk(u))
    for u in sorted(adj):  # leftover cycles
        while adj[u]:
            chains.append(walk(u))
    return [np.array([sites[k] for k in chain], dtype=np.float64)
            for chain in chains]


def clip_polyline(vertices: np.ndarray, b_loops: list[Loop] | Loop,
                  op: str, snap=None) -> list[np.ndarray]:
    """Polyline × polygon boolean operation, polyline dimension only
    (s2boolean_operation_test.cc:1654-1690 semantics): INTERSECTION
    keeps the parts of the polyline inside the polygon; UNION /
    DIFFERENCE / SYMMETRIC_DIFFERENCE keep the parts outside (the
    polygon's boundary belongs to the result's polygon dimension —
    emit it separately via the polygon layer when needed).  Polyline
    SELF-intersections are NOT split (the reference guarantees this:
    only crossings with the polygon's edges introduce vertices).
    Returns maximal polylines (S2PolylineVectorLayer assembly)."""
    if isinstance(b_loops, Loop):
        b_loops = [b_loops]
    if op not in OPS:
        raise ValueError(op)
    v = np.asarray(vertices, dtype=np.float64)
    ea = [(v[i], v[i + 1]) for i in range(len(v) - 1)]
    eb = _loop_edges(b_loops)
    sa, _ = subdivide_at_crossings(ea, eb)
    if not sa:
        return []
    mids = np.array([s[0] + s[1] for s in sa], dtype=np.float64)
    mids /= np.linalg.norm(mids, axis=1, keepdims=True)
    inside = _parity_contains(b_loops, mids)
    want_inside = op == "intersection"
    kept = [e for e, ins in zip(sa, inside) if bool(ins) == want_inside]
    # stabilize=False: polyline layers tolerate crossings, and the
    # reference's split_all_crossing_polyline_edges defaults to false
    return build_polylines(kept, snap=snap, stabilize=False)


class S2Builder:
    """Public facade mirroring the reference's S2Builder surface
    (s2builder.h:30-61): accumulate edges / polylines / loops, then
    assemble snap-rounded output through a layer.  build_polygon() is
    the S2PolygonLayer (closed chains, siblings cancelled),
    build_polylines() the S2PolylineVectorLayer (open chains kept).
    Snap rounding is iterated until the snapped arrangement is
    crossing-free (idempotence), which lifts the round-2 MVP
    restriction that callers pick a snap level fine enough to avoid
    snap-induced crossings."""

    def __init__(self, snap=None):
        self.snap = snap or IdentitySnapFunction()
        self._edges: list[tuple[np.ndarray, np.ndarray]] = []

    def add_edge(self, p0, p1) -> "S2Builder":
        self._edges.append((np.asarray(p0, dtype=np.float64),
                            np.asarray(p1, dtype=np.float64)))
        return self

    def add_polyline(self, pts) -> "S2Builder":
        pts = np.asarray(pts, dtype=np.float64)
        for i in range(pts.shape[0] - 1):
            self.add_edge(pts[i], pts[i + 1])
        return self

    def add_loop(self, loop) -> "S2Builder":
        v = loop.vertices if isinstance(loop, Loop) \
            else np.asarray(loop, dtype=np.float64)
        for i in range(v.shape[0]):
            self.add_edge(v[i], v[(i + 1) % v.shape[0]])
        return self

    def build_polygon(self) -> list[np.ndarray]:
        return build_loops(self._edges, snap=self.snap)

    def build_polylines(self) -> list[np.ndarray]:
        return build_polylines(self._edges, snap=self.snap)


# ---------------------------------------------------------------------------
# the boolean operation

def overlay_geometry(a_loops: list[Loop] | Loop,
                     b_loops: list[Loop] | Loop, op: str,
                     snap=None) -> list[np.ndarray]:
    """Exact boolean output geometry: vertex chains of op(A, B) for
    two even/odd multi-loop regions (S2BooleanOperation semantics,
    s2boolean_operation.h:16-60).  Returns a list of (k,3) loops —
    shells CCW, holes CW (parity interpretation, as S2Polygon's loop
    nesting)."""
    if isinstance(a_loops, Loop):
        a_loops = [a_loops]
    if isinstance(b_loops, Loop):
        b_loops = [b_loops]
    if op not in OPS:
        raise ValueError(op)
    ea = _loop_edges(a_loops)
    eb = _loop_edges(b_loops)
    sa, sb = subdivide_at_crossings(ea, eb)
    kept, na, nb = _degenerate_shared_edges(sa, sb, op)
    kept += (classify_edges(na, b_loops, "a", op)
             + classify_edges(nb, a_loops, "b", op))
    return build_loops(kept, snap=snap)


# boundary algebra for EXACTLY coincident edge pairs (one edge of A ==
# one edge of B, same or reversed direction) — midpoint classification
# is ill-posed on the other region's boundary, but the local picture
# decides directly.  Same direction: both interiors on the left, so
# the edge separates in/out for ∩ and ∪ (keep one copy) and separates
# nothing for − and Δ (drop).  Reversed: the interiors face each other,
# so ∩ has nothing on either side (drop), ∪ is interior on both sides
# (drop — regions merge across), A−B keeps the edge with A's direction,
# and Δ is interior on both sides too (the reference may emit the
# degenerate sibling pair; the polygon layer's ClosedSetNormalizer-
# style cancellation removes it, so we drop — region-identical).
_DEGEN_KEEP = {
    ("intersection", "same"): True, ("union", "same"): True,
    ("difference", "same"): False, ("symmetric_difference", "same"): False,
    ("intersection", "rev"): False, ("union", "rev"): False,
    ("difference", "rev"): True, ("symmetric_difference", "rev"): False,
}


def _degenerate_shared_edges(sa: list, sb: list, op: str):
    """Split coincident (degenerate) sub-edge pairs out of the normal
    midpoint classification.  -> (kept_degenerate, normal_a, normal_b);
    matching is bitwise on endpoint doubles (coincident fixture edges
    share exact coordinates; crossing subdivision never splits a
    coincident pair)."""
    kb: dict = {}
    for j, f in enumerate(sb):
        kb[(f[0].tobytes(), f[1].tobytes())] = j
    kept: list = []
    deg_a: set = set()
    deg_b: set = set()
    for i, e in enumerate(sa):
        j = kb.get((e[0].tobytes(), e[1].tobytes()))
        kind = "same"
        if j is None:
            j = kb.get((e[1].tobytes(), e[0].tobytes()))
            kind = "rev"
        if j is None or j in deg_b:
            continue
        deg_a.add(i)
        deg_b.add(j)
        if _DEGEN_KEEP[(op, kind)]:
            kept.append(e)
    na = [e for i, e in enumerate(sa) if i not in deg_a]
    nb = [f for j, f in enumerate(sb) if j not in deg_b]
    return kept, na, nb


def _op_truth(ina: bool, inb: bool, op: str) -> bool:
    if op == "intersection":
        return ina and inb
    if op == "union":
        return ina or inb
    if op == "difference":
        return ina and not inb
    return ina != inb  # symmetric_difference


def overlay_result_state(a_loops: list[Loop] | Loop,
                         b_loops: list[Loop] | Loop, op: str,
                         chains: list[np.ndarray]) -> str:
    """Disambiguate a boundary-less overlay result: 'full' vs 'empty'
    (the reference's IsFullPolygonResult predicate,
    s2boolean_operation.h full-polygon handling).  A chain-less result
    can be the FULL sphere — e.g. the union of two caps each larger
    than a hemisphere — which edge-keep classification alone cannot
    distinguish from empty; a single containment probe on the inputs
    decides.  Returns 'normal' when chains exist."""
    if chains:
        return "normal"
    if isinstance(a_loops, Loop):
        a_loops = [a_loops]
    if isinstance(b_loops, Loop):
        b_loops = [b_loops]
    probe = np.array([[1.0, 0.0, 0.0]])
    ina = bool(_parity_contains(a_loops, probe)[0]) if a_loops else False
    inb = bool(_parity_contains(b_loops, probe)[0]) if b_loops else False
    return "full" if _op_truth(ina, inb, op) else "empty"


class ResultRegion:
    """Even/odd multi-loop region over output chains — duck-typed for
    classify_loop / RegionCoverer (edge_intersects_cell + contains),
    so exact interior leaf counts of ∪/Δ come from classifying cells
    against the OUTPUT geometry (closing the conservative band of
    kernels/boolean.py)."""

    def __init__(self, chains: list[np.ndarray]):
        self.loops = [Loop(c) for c in chains]

    def edge_intersects_cell(self, cell) -> np.ndarray:
        return np.concatenate(
            [lp.edge_intersects_cell(cell) for lp in self.loops]) \
            if self.loops else np.zeros(0, dtype=bool)

    def contains_points(self, points: np.ndarray) -> np.ndarray:
        if not self.loops:
            return np.zeros(np.asarray(points).shape[0], dtype=bool)
        return _parity_contains(self.loops, np.asarray(points,
                                                      dtype=np.float64))

    def contains_point(self, p) -> bool:
        return bool(self.contains_points(np.asarray([p]))[0])
