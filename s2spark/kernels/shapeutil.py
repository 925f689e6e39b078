"""BuildPolygonBoundaries (s2shapeutil_build_polygon_boundaries.h:
29-66, .cc:38-124): group a collection of non-crossing lax loops —
organized as connected components that each subdivide the sphere —
into polygons whose interiors do not intersect (each polygon =
possibly multiple boundary loops, e.g. an island with its lakes).

The loop nesting hierarchy is anchored at S2::Origin as the "point at
infinity": loop A contains loop B iff A contains B's boundary and A
does not contain Origin.  Loops are lax (interior on the left,
degenerate loops allowed with empty interior)."""

from __future__ import annotations

import numpy as np

from .loops import ORIGIN, Loop

__all__ = ["build_polygon_boundaries", "nested_loops_to_lax"]


def nested_loops_to_lax(loops: list[Loop]) -> list[Loop]:
    """S2Polygon::InitNested loop convention -> engine lax orientation
    (s2polygon.h:128-146, s2polygon.cc InitNested/InitLoopProperties):
    the reference's polygons take every loop CCW around its own
    interior and derive shell/hole from NESTING DEPTH (holes = odd
    depth); the engine's region convention is interior-on-LEFT for
    every loop (s2shapeutil_get_reference_point.h semantics, what
    builder._parity_contains and the overlay consume).  Conversion =
    reverse the vertex order of odd-depth loops.

    Depth is measured at a verified strictly-interior probe of each
    loop (the left-nudged clear-edge midpoint that calibrates parity
    containment), so loops that share vertices with their parents —
    e.g. the s2polygon_test.cc kNear0/kNear1 fixtures, where every
    vertex of the inner loop lies on the outer loop — still nest
    correctly."""
    from .builder import _calibration_probe
    if not loops:
        return []
    probes = []
    for lp in loops:
        p = _calibration_probe([lp])
        if p is None:
            raise ValueError("loop has no clear probe edge")
        probes.append(p[None, :])
    out = []
    for i, lp in enumerate(loops):
        depth = sum(int(m.contains_points(probes[i])[0])
                    for j, m in enumerate(loops) if j != i)
        out.append(Loop(lp.vertices[::-1].copy()) if depth % 2
                   else lp)
    return out


def _is_degenerate_lax(v: np.ndarray) -> bool:
    """Empty-interior lax loop: every directed edge is matched by its
    reverse (self-edges ignored)."""
    from collections import Counter
    c: Counter = Counter()
    n = len(v)
    for i in range(n):
        a, b = v[i].tobytes(), v[(i + 1) % n].tobytes()
        if a != b:
            c[(a, b)] += 1
    return all(c.get((b, a), 0) == k for (a, b), k in c.items())


def build_polygon_boundaries(
        components: list[list[np.ndarray]]
) -> list[list[tuple[int, int]]]:
    """components[i] = list of (n,3) lax-loop vertex arrays whose
    boundaries subdivide the sphere (single-loop components must be
    degenerate).  Returns the polygons as lists of (component_idx,
    loop_idx) — one polygon per indexed (non-outer) loop holding that
    loop plus the outer loops of components nested directly inside
    it, plus one final polygon of all depth-0 outer loops (the
    reference's output ordering, .cc:110-124)."""
    if not components:
        return []
    comps = [[np.asarray(v, dtype=np.float64) for v in comp]
             for comp in components]
    origin = np.asarray(ORIGIN, dtype=np.float64)
    # 1. index every multi-loop-component loop not containing Origin;
    #    the one remaining loop per component is its outer loop
    indexed: list[tuple[int, int, Loop]] = []
    index_component: list[int] = []
    outer: list[tuple[int, int]] = []
    for ci, comp in enumerate(comps):
        n_outer_before = len(outer)
        for li, v in enumerate(comp):
            proper = len(comp) > 1 and not _is_degenerate_lax(v)
            lp = Loop(v) if proper else None
            if lp is not None and not lp.contains_point(origin):
                indexed.append((ci, li, lp))
                index_component.append(ci)
            else:
                outer.append((ci, li))
        if len(outer) != n_outer_before + 1:
            raise ValueError(
                f"component {ci} is not a subdivision "
                f"({len(outer) - n_outer_before} outer loops)")
    # 2. per component: the indexed loops containing its outer loop's
    #    first vertex; depth = count
    ancestors: list[list[int]] = []
    for ci, li in outer:
        p = comps[ci][li][0]
        ancestors.append([k for k, (_, _, lp) in enumerate(indexed)
                          if lp.contains_point(p)])
    # 3. attach each outer loop to its depth-1-less ancestor
    children: dict[int, list[tuple[int, int]]] = {}
    for i, (ci, li) in enumerate(outer):
        depth = len(ancestors[i])
        anc = -1
        if depth > 0:
            for k in ancestors[i]:
                if len(ancestors[index_component[k]]) == depth - 1:
                    anc = k
            if anc < 0:
                raise ValueError("no ancestor at depth-1 — loops "
                                 "cross or components overlap")
        children.setdefault(anc, []).append((ci, li))
    # 4. one polygon per indexed loop (children first, then the loop
    #    itself — the reference's push_back order, .cc:115-122), plus
    #    the depth-0 face
    polygons: list[list[tuple[int, int]]] = []
    for k, (ci, li, _) in enumerate(indexed):
        polygons.append(children.get(k, []) + [(ci, li)])
    polygons.append(children.get(-1, []))
    return polygons


# ---------------------------------------------------------------------------
# S2ShapeNestingQuery (s2shape_nesting_query.h:47-95, .cc:97-288)
# ---------------------------------------------------------------------------

def shape_nesting(chains: list[np.ndarray],
                  datum_chain: int = 0) -> list[dict]:
    """Evaluate shell/hole relations between the chains of one polygon
    shape (S2ShapeNestingQuery::ComputeShapeNesting).  Chains follow the
    lax convention (interior on the left); the result is one dict per
    chain: {"parent": chain_id or -1, "holes": [chain ids]}.  Shells
    have parent -1; a hole's parent is its immediate enclosing shell.

    The classification shoots a geodesic segment from the datum chain
    (default: first chain, the reference's FirstChain strategy) to a
    nearby vertex of each other chain, seeds the parity state from the
    wedge tests at both endpoints, toggles per crossed chain, reduces
    the parent sets transitively, and finally detaches even-depth
    chains (the even/odd rule).  Matches the reference including the
    shared-vertex fallback (neighbor-vertex probes when the segment
    would be degenerate)."""
    from .predicates import crossing_sign, ordered_ccw

    n = len(chains)
    if n == 0:
        return []
    if n == 1:
        return [{"parent": -1, "holes": []}]

    chains = [np.asarray(c, dtype=np.float64) for c in chains]
    parents: list[set] = [set() for _ in range(n)]
    children: list[set] = [set() for _ in range(n)]

    datum = chains[datum_chain]
    v0, v1, v2 = (tuple(datum[0]), tuple(datum[1]),
                  tuple(datum[2 % len(datum)]))
    start_point = v1

    # flat edge table over ALL chains (the crossing query's shape scope)
    e0 = np.concatenate([c for c in chains], axis=0)
    e1 = np.concatenate([np.roll(c, -1, axis=0) for c in chains], axis=0)
    edge_chain = np.concatenate([np.full(len(c), k, dtype=np.int64)
                                 for k, c in enumerate(chains)])

    for chain in range(n):
        if chain == datum_chain:
            continue
        verts = chains[chain]
        m = len(verts)
        # closest of 4 equally spaced sample vertices (.cc:44-66)
        step = max(1, m // 4)
        idxs = [(i * step) % m for i in range(4)]
        d2 = [float(np.sum((np.asarray(start_point) - verts[k]) ** 2))
              for k in idxs]
        end_idx = idxs[int(np.argmin(d2))]
        end_point = tuple(verts[end_idx])
        start_end_same = end_point == start_point

        nxt = tuple(verts[(end_idx + 1) % m])
        prv = tuple(verts[end_idx - 1])
        own_bit = False

        # does the segment start into the datum shell's interior?
        safe_end = prv if start_end_same else end_point
        if ordered_ccw(v2, safe_end, v0, start_point):
            parents[chain].add(datum_chain)
            children[datum_chain].add(chain)
        # ... and arrive from the target chain's interior?
        safe_start = v0 if start_end_same else start_point
        if ordered_ccw(nxt, safe_start, prv, end_point):
            own_bit = True

        if not start_end_same:
            sp = np.broadcast_to(np.asarray(start_point), e0.shape)
            ep = np.broadcast_to(np.asarray(end_point), e0.shape)
            crossing = crossing_sign(sp, ep, e0, e1) > 0  # INTERIOR only
            for other in edge_chain[crossing]:
                other = int(other)
                if other == chain:
                    own_bit = not own_bit
                else:
                    parents[chain] ^= {other}
                    children[other] ^= {chain}

        # datum stays a candidate only if the segment was inside BOTH
        if not (own_bit and datum_chain in parents[chain]):
            parents[chain].discard(datum_chain)
            children[datum_chain].discard(chain)

    # transitive reduction: a single-parent chain removes its parent
    # from all of its children (with backtracking, .cc:224-259)
    current = 0
    while current < n:
        if len(parents[current]) != 1:
            current += 1
            continue
        parent_chain = next(iter(parents[current]))
        nxt_chain = current
        for child in sorted(children[current]):
            if parent_chain in parents[child]:
                parents[child].discard(parent_chain)
                if len(parents[child]) == 1 and child < nxt_chain:
                    nxt_chain = child
        # backtrack to a child that just became single-parented
        current = nxt_chain if nxt_chain != current else current + 1

    relations = [{"parent": -1, "holes": []} for _ in range(n)]
    for chain in range(n):
        assert len(parents[chain]) <= 1, (chain, parents[chain])
        if parents[chain]:
            p = next(iter(parents[chain]))
            relations[chain]["parent"] = p
            relations[p]["holes"].append(chain)

    # even/odd rule: detach even-depth chains into shells (.cc:272-285;
    # sequential — later depth walks see earlier detachments)
    for chain in range(n):
        depth, cur = -1, chain
        while cur >= 0 and depth < n:
            depth += 1
            cur = relations[cur]["parent"]
        if depth and depth % 2 == 0:
            relations[chain]["parent"] = -1
    return relations


# ---------------------------------------------------------------------------
# S2Shape chain accessors + convenience helpers over VShape
# (s2shapeutil_edge_wrap.h/.cc, s2shapeutil_count_edges.h,
#  s2shapeutil_count_vertices.h/.cc, s2shapeutil_conversion.h/.cc,
#  s2shapeutil_contains_brute_force.h/.cc)
#
# The engine's shape collections are validation.VShape values (dim +
# list of (n,3) chains, lax semantics); these helpers give them the
# reference's S2Shape chain/edge API so one-off lookups and shape
# conversions don't each re-derive the chain arithmetic.
# ---------------------------------------------------------------------------

def shape_chains(shape) -> list[tuple[int, int]]:
    """(start_edge, num_edges) per chain, in the reference's S2Shape
    numbering: dim 0 has ONE CHAIN PER POINT (each a degenerate edge),
    dim 1 chains hold n-1 edges, dim 2 lax chains are closed with n
    edges (a 1-vertex loop is one degenerate edge)."""
    out: list[tuple[int, int]] = []
    start = 0
    for v in shape.chains:
        n = len(v)
        if shape.dim == 0:
            for _ in range(n):
                out.append((start, 1))
                start += 1
        elif shape.dim == 1:
            ln = max(0, n - 1)
            out.append((start, ln))
            start += ln
        else:
            out.append((start, n))
            start += n
    return out


def shape_num_edges(shape) -> int:
    return sum(ln for _, ln in shape_chains(shape))


def count_edges(shapes, max_edges: int | None = None) -> int:
    """CountEdges / CountEdgesUpTo (s2shapeutil_count_edges.h:28-59):
    total edges+points across the collection, stopping early once
    max_edges is reached (the running total is returned as-is)."""
    total = 0
    for s in shapes:
        total += shape_num_edges(s)
        if max_edges is not None and total >= max_edges:
            break
    return total


def count_vertices(shapes) -> int:
    """CountVertices (s2shapeutil_count_vertices.cc:25-53): dim 0 ->
    num_chains (= points); dim 1 -> edges + chains (open polylines);
    dim 2 -> edges (closed chains reuse their first vertex)."""
    total = 0
    for s in shapes:
        ch = shape_chains(s)
        ne = sum(ln for _, ln in ch)
        if s.dim == 0:
            total += len(ch)
        elif s.dim == 1:
            total += ne + len(ch)
        else:
            total += ne
    return total


def chain_position(shape, edge_id: int) -> tuple[int, int]:
    """edge id -> (chain_id, offset) (S2Shape::chain_position)."""
    for ci, (start, ln) in enumerate(shape_chains(shape)):
        if start <= edge_id < start + ln:
            return ci, edge_id - start
    raise IndexError(edge_id)


def _chain_closed(shape, chain_id: int) -> bool:
    # dim-1 chain wraps iff last vertex == first vertex bit-exactly
    v = shape.chains[chain_id]
    return len(v) >= 2 and bool(np.all(v[0] == v[-1]))


def next_edge_wrap(shape, edge_id: int) -> int:
    """s2shapeutil_edge_wrap.cc NextEdgeWrap: polygon chains always
    wrap; polyline chains wrap only when closed (last == first
    vertex); points always return -1."""
    chains = shape_chains(shape)
    ci, off = chain_position(shape, edge_id)
    start, ln = chains[ci]
    if shape.dim == 2:
        return start + (off + 1) % ln
    if shape.dim == 1:
        if off == ln - 1:
            return start if _chain_closed(shape, ci) else -1
        return start + off + 1
    return -1


def prev_edge_wrap(shape, edge_id: int) -> int:
    """s2shapeutil_edge_wrap.cc PrevEdgeWrap (mirror of next)."""
    chains = shape_chains(shape)
    ci, off = chain_position(shape, edge_id)
    start, ln = chains[ci]
    if shape.dim == 2:
        return start + (off - 1) % ln
    if shape.dim == 1:
        if off == 0:
            return start + ln - 1 if _chain_closed(shape, ci) else -1
        return start + off - 1
    return -1


def shape_to_points(shape) -> np.ndarray:
    """ShapeToS2Points (s2shapeutil_conversion.cc): a dim-0 shape's
    vertices as one (n,3) array (empty shapes allowed)."""
    if shape.dim != 0:
        raise ValueError("shape_to_points needs a dim-0 shape")
    if not shape.chains:
        return np.zeros((0, 3), dtype=np.float64)
    return np.concatenate([c for c in shape.chains], axis=0)


def shape_to_polyline(shape) -> np.ndarray:
    """ShapeToS2Polyline: first (and only) chain's vertices; the shape
    must be dim 1 with at most one chain and must not be empty."""
    if shape.dim != 1:
        raise ValueError("shape_to_polyline needs a dim-1 shape")
    if len(shape.chains) != 1 or len(shape.chains[0]) == 0:
        raise ValueError("shape must contain exactly one non-empty chain")
    return np.asarray(shape.chains[0], dtype=np.float64)


def shape_to_polygon(shape) -> list[np.ndarray]:
    """ShapeToS2Polygon: each closed chain as a loop vertex array (the
    engine's polygon model IS a loop list, so this is the accessor +
    validation half of the reference conversion)."""
    if shape.dim != 2:
        raise ValueError("shape_to_polygon needs a dim-2 shape")
    return [np.asarray(c, dtype=np.float64) for c in shape.chains]


def contains_brute_force(shape, points: np.ndarray) -> np.ndarray:
    """ContainsBruteForce (s2shapeutil_contains_brute_force.cc:26-41)
    vectorized over probe points: dim < 2 shapes have no interior; a
    dim-2 shape contains a point per the lax even/odd crossing parity
    (builder._parity_contains implements the GetReferencePoint
    calibration).  Boundaries follow the engine's crossing-parity
    convention (the reference's semi-open model)."""
    points = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    if shape.dim < 2:
        return np.zeros(len(points), dtype=bool)
    if getattr(shape, "is_full", False) and not shape.chains:
        return np.ones(len(points), dtype=bool)
    if not shape.chains:
        return np.zeros(len(points), dtype=bool)
    from .builder import _parity_contains
    loops = [Loop(c) for c in shape.chains]
    return _parity_contains(loops, points)


# ---------------------------------------------------------------------------
# Shape constructors (s2lax_loop_shape.h, s2edge_vector_shape.h,
# s2point_vector_shape.h): build VShape values with the reference
# shapes' chain semantics so the accessors above apply uniformly.
# ---------------------------------------------------------------------------

def point_vector_shape(points) -> "VShape":
    """S2PointVectorShape: dim 0, one degenerate edge per point (each
    point is its own chain in shape_chains)."""
    from .validation import VShape
    pts = np.asarray(points, dtype=np.float64).reshape(-1, 3)
    return VShape(0, [pts] if len(pts) else [])


def edge_vector_shape(edges) -> "VShape":
    """S2EdgeVectorShape: an arbitrary set of edges, each its own
    one-edge chain (s2edge_vector_shape.h:30-43)."""
    from .validation import VShape
    chains = [np.asarray([a, b], dtype=np.float64) for a, b in edges]
    return VShape(1, chains)


def lax_loop_shape(vertices) -> "VShape":
    """S2LaxLoopShape: one closed chain surrounding an interior;
    duplicate vertices allowed, 0/1/2-vertex loops valid
    (s2lax_loop_shape.h:46-54)."""
    from .validation import VShape
    v = np.asarray(vertices, dtype=np.float64).reshape(-1, 3)
    return VShape(2, [v] if len(v) else [])


def lax_closed_polyline_shape(vertices) -> "VShape":
    """S2LaxClosedPolylineShape: like the lax loop but dimension 1 —
    no interior (s2lax_loop_shape.h:101-112).  The closing edge is
    materialized by repeating the first vertex, which is exactly the
    condition next/prev_edge_wrap detect as a closed chain."""
    from .validation import VShape
    v = np.asarray(vertices, dtype=np.float64).reshape(-1, 3)
    if len(v) >= 2:
        v = np.concatenate([v, v[:1]], axis=0)
    return VShape(1, [v] if len(v) else [])


def vertex_id_lax_loop_shape(vertex_ids, vertex_array) -> "VShape":
    """S2VertexIdLaxLoopShape: loop vertices as indices into an
    existing vertex array (s2lax_loop_shape.h:127-150)."""
    from .validation import VShape
    arr = np.asarray(vertex_array, dtype=np.float64).reshape(-1, 3)
    ids = np.asarray(vertex_ids, dtype=np.int64)
    return VShape(2, [arr[ids]] if len(ids) else [])


def contains_point_query(shape, p, vertex_model: str = "semi_open"
                         ) -> bool:
    """S2ContainsPointQuery::ShapeContains with the S2VertexModel
    options (s2contains_point_query.h:250-330, s2shape_index.h):

    - OPEN      — polygons contain no boundary vertex; dim<2 shapes
                  contain nothing;
    - SEMI_OPEN — the crossing-parity default (each vertex contained
                  by exactly one of the regions it borders, via
                  VertexCrossing);
    - CLOSED    — polygons contain every boundary vertex, and dim<2
                  shapes contain each of their vertices.

    The reference anchors its crossing walk at the index-cell center;
    this standalone kernel anchors at a verified off-boundary
    reference point calibrated by ContainsBruteForce — identical
    verdicts, no index required."""
    from . import predicates
    p = np.asarray(p, dtype=np.float64)
    edges = shape.edges()
    if shape.dim < 2:
        if vertex_model != "closed":
            return False
        return any(np.array_equal(p, v0) or np.array_equal(p, v1)
                   for (_, _, v0, v1) in edges)
    if getattr(shape, "is_full", False) and not shape.chains:
        return True
    if not edges:
        return False
    # deterministic off-boundary anchor: nudge away from the first
    # vertex until every crossing sign is decided (no shared vertex
    # with any edge and not equal to p)
    from .edges import point_segment_chord2
    ref = None
    base = np.asarray(edges[0][2], dtype=np.float64)
    for k in range(1, 32):
        cand = base + k * 0.0371 * np.array([1.0, -0.71, 0.43])
        cand /= np.linalg.norm(cand)
        a_ = np.array([list(v0) for (_, _, v0, _) in edges])
        b_ = np.array([list(v1) for (_, _, _, v1) in edges])
        d2 = point_segment_chord2(np.broadcast_to(cand, a_.shape),
                                  a_, b_)
        if d2.min() > 1e-12 and not np.array_equal(cand, p):
            ref = cand
            break
    if ref is None:
        raise ValueError("no clear anchor point found")
    inside = bool(contains_brute_force(shape, ref[None])[0])
    for (_, _, v0, v1) in edges:
        v0 = np.asarray(v0, dtype=np.float64)
        v1 = np.asarray(v1, dtype=np.float64)
        sign = int(predicates.crossing_sign(ref[None], p[None],
                                            v0[None], v1[None])[0])
        if sign < 0:
            continue
        if sign == 0:
            if vertex_model != "semi_open" and \
                    (np.array_equal(v0, p) or np.array_equal(v1, p)):
                return vertex_model == "closed"
            sign = int(predicates.vertex_crossing(
                tuple(ref), tuple(p), tuple(v0), tuple(v1)))
        inside ^= bool(sign)
    return inside


def incident_edges(shapes, p) -> list[tuple[int, int]]:
    """VisitIncidentEdges (s2contains_point_query.h:286-310): the
    (shape_id, edge_id) of every edge with an endpoint exactly at
    `p`, in shape/edge order.  Edge ids use the reference numbering
    (enumeration order of VShape.edges())."""
    p = np.asarray(p, dtype=np.float64)
    out = []
    for sid, shape in enumerate(shapes):
        for eid, (_, _, v0, v1) in enumerate(shape.edges()):
            if np.array_equal(p, v0) or np.array_equal(p, v1):
                out.append((sid, eid))
    return out


# ---------------------------------------------------------------------------
# Shape adaptors and flat edge iteration (reference s2wrapped_shape.h:
#  30-65, s2point_span.h:39-61 S2PointLoopSpan, s2shapeutil_edge_iterator
#  .h:36-85, s2shapeutil_shape_edge_id.h / s2shapeutil_shape_edge.h)
#
# In the engine these are thin: a distributed "edge iterator" is just
# the exploded edge DataFrame (ops/pip.index_edges), and spans are
# NumPy views.  The kernel-side forms exist so driver-side algorithms
# (builder layers, validation walks) share the reference's numbering.
# ---------------------------------------------------------------------------

def chain_edge(shape, chain_id: int, offset: int) -> tuple:
    """S2Shape::chain_edge — (v0, v1) of edge `offset` within the
    chain, in the chain numbering of shape_chains (dim-0 chains are
    single degenerate edges; dim-2 lax chains wrap)."""
    if shape.dim == 0:
        # dim-0 chains are one-per-point across ALL vertex arrays;
        # walk the arrays instead of concatenating them per call
        k = chain_id
        for c in shape.chains:
            if k < len(c):
                p = c[k]
                return p.copy(), p.copy()
            k -= len(c)
        raise IndexError(chain_id)
    v = shape.chains[chain_id]
    if shape.dim == 1:
        return v[offset].copy(), v[offset + 1].copy()
    return v[offset].copy(), v[(offset + 1) % len(v)].copy()


def shape_edge(shape, edge_id: int) -> tuple:
    """S2Shape::edge — flat edge id -> (v0, v1)."""
    ci, off = chain_position(shape, edge_id)
    return chain_edge(shape, ci, off)


def edge_iterator(shapes):
    """s2shapeutil::EdgeIterator (s2shapeutil_edge_iterator.h:36-85):
    yields (shape_id, edge_id, v0, v1) over every edge of every shape
    of the collection, shapes in id order, edges in flat edge-id
    order.  The ShapeEdgeId of a row is exactly (shape_id, edge_id)."""
    for sid, shape in enumerate(shapes):
        if shape is None:
            continue
        for eid in range(shape_num_edges(shape)):
            v0, v1 = shape_edge(shape, eid)
            yield sid, eid, v0, v1


class WrappedShape:
    """S2WrappedShape (s2wrapped_shape.h:30-65): delegates every
    S2Shape accessor to the wrapped shape without copying its data —
    duck-compatible with VShape everywhere the kernels accept one."""

    __slots__ = ("_inner",)

    def __init__(self, inner):
        self._inner = inner

    @property
    def dim(self):
        return self._inner.dim

    @property
    def chains(self):
        return self._inner.chains

    @property
    def is_full(self):
        return self._inner.is_full

    def edges(self):
        return self._inner.edges()


def loop_span_vertex(vertices: np.ndarray, i: int) -> np.ndarray:
    """S2PointLoopSpan::operator[] (s2point_span.h:39-61): indices in
    [n, 2n-1] wrap to [0, n-1] by subtracting n — "two full copies of
    the vertex array", the convention loop algorithms use to read
    vertex(i) and vertex(i+1) without a modulo per access."""
    n = len(vertices)
    if not 0 <= i < 2 * n:
        raise IndexError(i)
    return vertices[i - n if i >= n else i]
