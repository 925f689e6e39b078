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
