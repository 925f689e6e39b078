"""S2WindingOperation — region construction from a winding rule
(s2winding_operation.h:25-120, s2builderutil_get_snapped_winding_delta.h).

Given possibly self-intersecting closed loops, a reference point R with
known winding number, and a rule (POSITIVE/NEGATIVE/NON_ZERO/ODD), the
sphere is partitioned into regions of constant (relative) winding
number and the boundary of the selected regions is emitted as snapped,
interior-on-left chains.

Formulation over the repo's arrangement machinery:

1. subdivide all loop edges at mutual crossings (builder.subdivide_self)
2. snap to sites; stabilize snap-induced crossings
3. **snapped winding delta**: snapping can sweep edges across R (e.g. a
   loop collapsing to a point), changing R's winding.  Each sub-edge's
   sweep quad (input edge -> snapped edge, connectors cancelling along
   each input loop) contributes its winding around R, computed by
   signed crossings from a far anchor — the role of the reference's
   GetSnappedWindingDelta.
4. per arrangement *bundle* (coincident directed edges netted:
   left winding = right winding + net), the winding number just left
   of the bundle is computed by signed crossings of the geodesic R ->
   probe against all net-weighted bundles; a bundle is emitted iff the
   rule selects exactly one side (interior kept on the left)
5. stitch chains (builder.stitch_loops); a chain-less result
   disambiguates to full/empty by rule(w(R)).

include_degeneracies=True keeps sibling edge pairs and isolated
points per the reference's rules (ODD: odd multiplicity; other rules:
contained by winding-0 regions) — see winding_operation.
"""

from __future__ import annotations

import math

import numpy as np

from . import predicates
from .builder import (IdentitySnapFunction, _snap_edges,
                      _stabilize_crossings, stitch_loops, subdivide_self)

RULES = ("positive", "negative", "non_zero", "odd")


def _rule_fn(rule: str):
    if rule == "positive":
        return lambda w: w > 0
    if rule == "negative":
        return lambda w: w < 0
    if rule == "non_zero":
        return lambda w: w != 0
    if rule == "odd":
        return lambda w: (w % 2) == 1
    raise ValueError(rule)


def _signed_crossings(f: np.ndarray, r: np.ndarray,
                      segs: list[tuple[np.ndarray, np.ndarray, int]]
                      ) -> int:
    """Winding contribution along the geodesic f->r: for each
    transverse crossing with a (weighted) edge (p,q,net), +net if r is
    on the edge's left (Sign(p,q,r) > 0) else -net."""
    if not segs:
        return 0
    p = np.array([s[0] for s in segs])
    q = np.array([s[1] for s in segs])
    nets = np.array([s[2] for s in segs], dtype=np.int64)
    n = len(segs)
    cs = predicates.crossing_sign(np.broadcast_to(f, (n, 3)),
                                  np.broadcast_to(r, (n, 3)), p, q)
    hit = cs > 0
    if not hit.any():
        return 0
    total = 0
    for i in np.nonzero(hit)[0]:
        s = predicates._sign_scalar(tuple(p[i]), tuple(q[i]), tuple(r))
        total += int(nets[i]) if s > 0 else -int(nets[i])
    return total


def _left_probe(p0: np.ndarray, p1: np.ndarray,
                eps: float = 1e-9) -> np.ndarray:
    n = np.cross(p0, p1)
    n /= np.linalg.norm(n)
    m = p0 + p1
    m /= np.linalg.norm(m)
    return m * math.cos(eps) + n * math.sin(eps)


def winding_operation(loops: list[np.ndarray], ref_point: np.ndarray,
                      ref_winding: int, rule: str, snap=None,
                      include_degeneracies: bool = False
                      ) -> tuple[list[np.ndarray], str]:
    """-> (chains, state): boundary chains of the region selected by
    the winding rule (interior on the left; shells CCW / holes CW in
    the parity interpretation), and 'normal' | 'full' | 'empty'.

    include_degeneracies (s2winding_operation.h:96-120): sibling edge
    pairs and isolated vertices are kept when WindingRule::ODD sees an
    odd multiplicity (enabling N-way symmetric difference over
    degenerate geometry), or — for the other rules — when they lie in
    a winding-0 region (enabling N-way union); point loops and loops
    that collapse under snapping become 1-vertex chains."""
    if rule not in RULES:
        raise ValueError(rule)
    want = _rule_fn(rule)
    snap = snap or IdentitySnapFunction()
    r = np.asarray(ref_point, dtype=np.float64)

    point_degens: list = []            # site keys of point loops
    point_sites: dict = {}             # key -> site point
    loop_edge_lists = []
    for v in loops:
        v = np.asarray(v, dtype=np.float64)
        if len(v) == 0:
            continue
        # a 1-vertex loop, or a loop whose vertices all snap to ONE
        # site, collapses to a degenerate point (PointLoop /
        # CollapsingShell include variants).  Collapsed multi-vertex
        # loops STAY in the pipeline: their edges vanish at snapping
        # but their sweep quads still carry the winding delta (a shell
        # contracting over the reference point changes its winding).
        keys = {snap.site_key(p) for p in v}
        if len(keys) == 1:
            k = next(iter(keys))
            point_degens.append(k)
            point_sites[k] = snap.site_point(k, v[0])
            if len(v) == 1:
                continue
        loop_edge_lists.append(
            [(v[i], v[(i + 1) % len(v)]) for i in range(len(v))])
    sub = subdivide_self(loop_edge_lists)
    sub_edges = [e for lst in sub for segs in lst for e in segs]

    seen, sites = _snap_edges(sub_edges, snap)
    base_edges = [e for e in sorted(seen) for _ in range(seen[e])]
    edges, origins = _stabilize_crossings(base_edges, sites, snap,
                                          return_origins=True)
    first_pos: dict = {}
    for pos, e in enumerate(base_edges):
        first_pos.setdefault(e, pos)
    chain_of: dict = {}
    for seg, o in zip(edges, origins):
        if o == first_pos.get(base_edges[o]):
            chain_of.setdefault(base_edges[o], []).append(seg)

    # snapped winding delta: sweep contour input-subedge -> its FINAL
    # stabilized chain (pre-stabilization endpoints would miss slivers
    # swept when snap-induced crossings re-split edges near the ref)
    delta = 0
    for (a, b) in sub_edges:
        ka, kb = snap.site_key(a), snap.site_key(b)
        a2 = sites.get(ka, snap.site_point(ka, a))
        b2 = sites.get(kb, snap.site_point(kb, b))
        if ka == kb:
            contour = [(a, b), (b, b2), (a2, a)]
        else:
            chain = chain_of.get((ka, kb), [(ka, kb)])
            contour = [(a, b), (b, b2)]
            contour += [(np.asarray(sites[v2]), np.asarray(sites[u2]))
                        for (u2, v2) in reversed(chain)]
            contour += [(a2, a)]
        segs = [(p, q) for p, q in contour
                if not np.array_equal(p, q)]
        if len(segs) <= 1:
            continue  # identity snap: zero-area sweep
        c = a + b + a2 + b2
        nc = float(np.linalg.norm(c))
        f = -(c / nc) if nc > 0 else -a
        # edge-OR-vertex crossings (see get_snapped_winding_delta)
        from .validation import _svc_sum
        P = np.array([p for p, _ in segs])
        Q = np.array([q for _, q in segs])
        delta += _svc_sum(tuple(f), tuple(r), P, Q,
                          [tuple(p) for p in P],
                          [tuple(q) for q in Q])
    w_ref = int(ref_winding) - delta

    # bundles: coincident directed edges netted
    from collections import Counter
    cnt = Counter(edges)
    bundles: list[tuple] = []          # (u, v, net) with net > 0
    degen_pairs: list[tuple] = []      # net-0 sibling bundles (u,v,mult)
    done = set()
    for (u, v) in sorted(cnt):
        if (u, v) in done or (v, u) in done:
            continue
        done.add((u, v))
        done.add((v, u))
        net = cnt[(u, v)] - cnt.get((v, u), 0)
        if net > 0:
            bundles.append((u, v, net))
        elif net < 0:
            bundles.append((v, u, -net))
        elif u != v:
            degen_pairs.append((u, v, cnt[(u, v)]))
        else:
            point_degens.extend([u] * cnt[(u, v)])  # degenerate self-edge

    segs = [(np.asarray(sites[u]), np.asarray(sites[v]), net)
            for u, v, net in bundles]
    out_edges: list[tuple] = []
    for (u, v, net), (p0, p1, _) in zip(bundles, segs):
        probe = _left_probe(p0, p1)
        w_left = w_ref + _signed_crossings(r, probe, segs)
        w_right = w_left - net
        keep_l, keep_r = want(w_left), want(w_right)
        if keep_l and not keep_r:
            out_edges.append((u, v))
        elif keep_r and not keep_l:
            out_edges.append((v, u))

    degen_chains: list[np.ndarray] = []
    protected: set = set()
    if include_degeneracies:
        out_deg = {u for u, _ in out_edges} | {v for _, v in out_edges}

        def w_at(p: np.ndarray) -> int:
            return w_ref + _signed_crossings(r, p, segs)

        for (u, v, mult) in degen_pairs:
            p0, p1 = np.asarray(sites[u]), np.asarray(sites[v])
            if rule == "odd":
                emit = (mult % 2) == 1
            else:
                m = p0 + p1
                m /= np.linalg.norm(m)
                emit = w_at(m) == 0
            if not emit:
                continue
            if u in out_deg or v in out_deg:
                # connected to surviving boundary: keep both directed
                # copies in the graph so stitching splits the touching
                # regions (TouchingTriangles ODD include variant)
                protected.add((u, v))
                protected.add((v, u))
            else:
                degen_chains.append(np.array([sites[u], sites[v]]))
        from collections import Counter as _C
        for k, mult in sorted(_C(point_degens).items()):
            pt = np.asarray(sites.get(k, point_sites.get(k)))
            if rule == "odd":
                emit = (mult % 2) == 1
            else:
                emit = w_at(pt) == 0
            if emit:
                degen_chains.append(pt[None, :])
    if protected:
        out_edges = out_edges + sorted(protected)
    chains = stitch_loops(out_edges, sites)
    arrays = [np.array([sites[k] for k in chain], dtype=np.float64)
              for chain in chains] + degen_chains
    if arrays:
        return arrays, "normal"
    return arrays, ("full" if want(w_ref) else "empty")


def get_snapped_winding_delta(loops: list[np.ndarray],
                              ref_point: np.ndarray, snap) -> int:
    """GetSnappedWindingDelta (s2builderutil_get_snapped_winding_delta
    .h:19-77): the change in winding number of the reference vertex
    caused by snapping — ``w_snap(snapped ref) = ref_winding +
    get_snapped_winding_delta(loops, ref, snap)``.

    Decomposition (the same sweep quads winding_operation uses):
    w_in(r0) - w_snap(r0) = Σ_quads winding_quad(r0) (each quad =
    input sub-edge forward + its snapped edge reversed + connectors,
    a closed contour), and moving the evaluation point along the
    reference vertex's own snap path r0 -> r1 adds the signed
    crossings of that path with the snapped edge multiset."""
    r0 = np.asarray(ref_point, dtype=np.float64)
    rk = snap.site_key(r0)
    delta_collapsed = 0
    loop_edge_lists = []
    for v in loops:
        v = np.asarray(v, dtype=np.float64)
        if len(v) <= 1:
            continue
        keys = {snap.site_key(p) for p in v}
        if keys == {rk}:
            # category (1), s2builderutil_get_snapped_winding_delta.cc:
            # 272-287 — a loop whose every vertex snaps to R' collapses
            # to a point, so its snapped winding is zero everywhere;
            # the delta is -winding(R) measured from a point Z outside
            # the Voronoi region of R' (Ortho(R'), 90 deg away)
            from .pointutil import ortho
            from .validation import _svc_sum
            r1c = np.asarray(snap.site_point(rk, r0), dtype=np.float64)
            z = ortho(r1c[None])[0]
            nxt = np.roll(v, -1, axis=0)
            delta_collapsed -= _svc_sum(
                tuple(z), tuple(r0), v, nxt,
                [tuple(x) for x in v], [tuple(x) for x in nxt])
            continue
        loop_edge_lists.append(
            [(v[i], v[(i + 1) % len(v)]) for i in range(len(v))])
    sub = subdivide_self(loop_edge_lists)
    sub_edges = [e for lst in sub for segs in lst for e in segs]
    if not sub_edges:
        return delta_collapsed
    seen, sites = _snap_edges(sub_edges, snap)
    base_edges = [e for e in sorted(seen) for _ in range(seen[e])]
    edges, origins = _stabilize_crossings(base_edges, sites, snap,
                                          return_origins=True)
    # final stabilized chain per snapped key pair (all multiplicity
    # copies of a pair split identically — keep the first copy's)
    first_pos: dict = {}
    for pos, e in enumerate(base_edges):
        first_pos.setdefault(e, pos)
    chain_of: dict = {}
    for seg, o in zip(edges, origins):
        if o == first_pos.get(base_edges[o]):
            chain_of.setdefault(base_edges[o], []).append(seg)

    # Σ_quads winding_quad(r0): each contour is the input sub-edge
    # forward + its FINAL stabilized chain reversed (+ connectors) —
    # pre-stabilization endpoints would miss slivers swept when
    # snap-induced crossings re-split edges near r0
    quad_sum = 0
    for (a, b) in sub_edges:
        ka, kb = snap.site_key(a), snap.site_key(b)
        a2 = sites.get(ka, snap.site_point(ka, a))
        b2 = sites.get(kb, snap.site_point(kb, b))
        if ka == kb:
            contour = [(a, b), (b, b2), (a2, a)]
        else:
            chain = chain_of.get((ka, kb), [(ka, kb)])
            contour = [(a, b), (b, b2)]
            contour += [(np.asarray(sites[v2]), np.asarray(sites[u2]))
                        for (u2, v2) in reversed(chain)]
            contour += [(a2, a)]
        segs = [(p, q) for p, q in contour
                if not np.array_equal(p, q)]
        if len(segs) <= 1:
            continue
        c = a + b + a2 + b2
        nc = float(np.linalg.norm(c))
        f = -(c / nc) if nc > 0 else -a
        # edge-OR-vertex crossings: the stabilized chain may pass
        # exactly through r0 (a split at the reference site), where
        # the vertex-crossing convention decides the sweep
        from .validation import _svc_sum
        P = np.array([p for p, _ in segs])
        Q = np.array([q for _, q in segs])
        quad_sum += _svc_sum(tuple(f), tuple(r0), P, Q,
                             [tuple(p) for p in P],
                             [tuple(q) for q in Q])

    # crossings of the reference vertex's snap path with the snapped
    # edges (w_snap(r1) - w_snap(r0))
    r1 = np.asarray(sites.get(rk, snap.site_point(rk, r0)),
                    dtype=np.float64)
    x = 0
    if not np.array_equal(r0, r1):
        from .validation import _svc_sum
        pq = [(np.asarray(sites[u]), np.asarray(sites[v]))
              for (u, v) in edges
              if not np.array_equal(sites[u], sites[v])]
        if pq:
            # edge-OR-vertex crossings: the path may land exactly on a
            # chain vertex (the snapped ref vertex), where the engine's
            # vertex-crossing convention decides containment
            P = np.array([a for a, _ in pq])
            Q = np.array([b for _, b in pq])
            x = _svc_sum(tuple(r0), tuple(r1), P, Q,
                         [tuple(a) for a in P], [tuple(b) for b in Q])
    return delta_collapsed + x - quad_sum
