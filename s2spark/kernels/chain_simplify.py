"""S2Builder `simplify_edge_chains` — snap-round-and-simplify with the
reference's topology guarantees (s2builder.h:393-425,
s2polyline_simplifier.h:17-56, s2builder.cc EdgeChainSimplifier).

Two pieces, both re-derived from the published algorithm description:

- `ChainSimplifier`: maintains the window of output-edge bearings from
  a source vertex such that the edge passes within `r` of every
  targeted disc and outside `r` of every avoided disc (the wedge
  formulation of s2polyline_simplifier.h — sin(semiwidth) =
  sin(r)/sin(dist), tracked as an S1Interval of tangent-frame angles).
- `simplify_graph_edges`: walks the snapped site graph, classifying
  interior (simplifiable) vertices with the InteriorVertexMatcher rule
  (equal in/out degree, at most two distinct neighbors with balanced
  edge counts — s2builder.cc:1709-1760), and greedily merges maximal
  subchains whose replacement edge targets every skipped site within
  `tolerance` and avoids every foreign site by `edge_sep` on the
  correct side (AvoidSites, s2builder.cc:1875-1940).  Chains are
  parametric, not geometric: backtracking stops simplification via the
  monotonic-distance rule.
"""

from __future__ import annotations

import math

import numpy as np

from .region import S1Interval


class ChainSimplifier:
    """Bearing-window simplifier (S2PolylineSimplifier semantics)."""

    def __init__(self, src: np.ndarray):
        self.src = np.asarray(src, dtype=np.float64)
        self.window = S1Interval.full()
        self._pending_avoid: list[tuple[S1Interval, bool]] = []
        # tangent frame at src (any orthonormal pair)
        a = np.abs(self.src)
        i = int(np.argmin(a))
        j, k = (i + 1) % 3, (i + 2) % 3
        y = np.zeros(3)
        y[j] = self.src[k]
        y[k] = -self.src[j]
        self.y_dir = y
        self.x_dir = np.cross(y, self.src)

    def _direction(self, p: np.ndarray) -> float:
        return math.atan2(float(np.dot(p, self.y_dir)),
                          float(np.dot(p, self.x_dir)))

    def _semiwidth(self, p: np.ndarray, r: float) -> float:
        """Half-angle subtended at src by a disc of radius r (radians)
        at p: sin(semiwidth) = sin(r)/sin(a)."""
        d = self.src - p
        a2 = float(np.dot(d, d))          # squared chord distance
        r_ch = 2.0 * math.sin(0.5 * r)
        r2 = r_ch * r_ch
        if a2 <= r2:
            return math.pi                 # disc contains src
        sin2_r = r2 * (1 - 0.25 * r2)
        sin2_a = a2 * (1 - 0.25 * a2)
        return math.asin(min(1.0, math.sqrt(sin2_r / sin2_a)))

    def extend(self, dst: np.ndarray) -> bool:
        """Can the simplified edge end at dst?"""
        d = self.src - dst
        if float(np.dot(d, d)) > 2.0:      # > 90 degrees
            return False
        b = self._direction(dst)
        if not self.window.contains(b):
            return False
        for iv, _ in self._pending_avoid:
            if iv.contains(b):
                return False
        return True

    def target_disc(self, p: np.ndarray, r: float) -> bool:
        """Require the output edge to pass within r of p."""
        sw = self._semiwidth(p, r)
        if sw >= math.pi:
            return True                    # disc contains src
        center = self._direction(p)
        target = S1Interval.from_point(center).expanded(sw)
        self.window = self.window.intersection(target)
        for iv, on_left in self._pending_avoid:
            self._avoid_range(iv, on_left)
        self._pending_avoid.clear()
        return not self.window.is_empty()

    def avoid_disc(self, p: np.ndarray, r: float,
                   disc_on_left: bool) -> bool:
        """Require the output edge to stay at least r from p, passing
        on the side given by disc_on_left."""
        sw = self._semiwidth(p, r)
        if sw >= math.pi:
            self.window = S1Interval.empty()
            return False
        center = self._direction(p)
        dleft = math.pi / 2 if disc_on_left else sw
        dright = sw if disc_on_left else math.pi / 2
        iv = S1Interval(math.remainder(center - dright, 2 * math.pi),
                        math.remainder(center + dleft, 2 * math.pi))
        if self.window.is_full():
            # can't subtract from a full window; defer until a target
            # shrinks it below 180 degrees
            self._pending_avoid.append((iv, disc_on_left))
            return True
        self._avoid_range(iv, disc_on_left)
        return not self.window.is_empty()

    def _avoid_range(self, iv: S1Interval, disc_on_left: bool):
        if self.window.contains_interval(iv):
            # of the two residual pieces only the one toward the disc
            # can hold a valid chain direction (s2polyline_simplifier
            # AvoidRange discussion)
            if disc_on_left:
                self.window = S1Interval(self.window.lo, iv.lo)
            else:
                self.window = S1Interval(iv.hi, self.window.hi)
        else:
            self.window = self.window.intersection(iv.complement())


def _interior_sites(edges: list[tuple], forced: set) -> dict:
    """InteriorVertexMatcher over the (single-layer) directed edge
    multiset: a site is interior iff indegree == outdegree, it has at
    most two distinct neighbors with balanced total edge counts, and
    degenerate self-edges only accompany real edges."""
    from collections import defaultdict
    inc: dict = defaultdict(list)          # v -> [(neighbor, outgoing)]
    for u, v in edges:
        inc[u].append((v, True))
        inc[v].append((u, False))
    out = {}
    for v, tallies in inc.items():
        if v in forced:
            out[v] = False
            continue
        excess = 0
        n0 = n1 = n2 = 0
        v1 = v2 = None
        ok = True
        for nb, outgoing in tallies:
            excess += 1 if outgoing else -1
            if nb == v:
                n0 += 1
            elif v1 is None or v1 == nb:
                v1 = nb
                n1 += 1
            elif v2 is None or v2 == nb:
                v2 = nb
                n2 += 1
            else:
                ok = False
        out[v] = (ok and excess == 0 and n1 == n2
                  and (n0 == 0 or n1 > 0))
    return out


def simplify_graph_edges(edges: list[tuple], sites: dict,
                         tolerance: float,
                         edge_sep: float | None = None,
                         forced: set | None = None,
                         return_kept: bool = False):
    """Simplify the snapped edge graph: replace maximal interior
    chains with single edges whose geodesic passes within `tolerance`
    of every skipped site and at least `edge_sep` (default
    tolerance/2, the IdentitySnapFunction min_edge_vertex_separation
    ratio — s2builderutil_snap_functions.cc:68-72) from every foreign
    site.  Returns the new directed edge list (duplicates merged)."""
    if not edges:
        return ([], set()) if return_kept else []
    if edge_sep is None:
        edge_sep = 0.5 * tolerance
    forced = forced or set()
    from collections import Counter, defaultdict
    interior = _interior_sites(edges, forced)
    adj: dict = defaultdict(list)          # u -> sorted neighbors out
    counts = Counter(edges)                # directed multiplicity
    edge_set = set(counts)
    for u, v in sorted(edge_set):
        adj[u].append(v)

    site_keys = sorted(sites)
    pts = np.array([sites[k] for k in site_keys])
    key_index = {k: i for i, k in enumerate(site_keys)}

    def nearby_sites(k1, k2, radius):
        """Site keys within `radius` (chord test) of segment k1->k2."""
        from .edges import point_segment_chord2
        a = np.broadcast_to(np.asarray(sites[k1]), pts.shape)
        b = np.broadcast_to(np.asarray(sites[k2]), pts.shape)
        d2 = point_segment_chord2(pts, a, b)
        rc = 2.0 * math.sin(0.5 * min(radius, math.pi / 2))
        hits = np.nonzero(d2 <= rc * rc)[0]
        return [site_keys[int(i)] for i in hits]

    from . import predicates

    def avoid_sites(k0, k1, k2, used, simp) -> bool:
        p0, p1, p2 = sites[k0], sites[k1], sites[k2]
        d1 = np.asarray(p0) - np.asarray(p1)
        d2_ = np.asarray(p0) - np.asarray(p2)
        r1 = float(np.dot(d1, d1))
        r2 = float(np.dot(d2_, d2_))
        if r2 < r1:
            return False                   # backtracking: parametric!
        if r2 > 2.0:
            return False                   # cap edge length at 90 deg
        for k in nearby_sites(k1, k2, 2 * tolerance + edge_sep):
            p = np.asarray(sites[k])
            dd = np.asarray(p0) - p
            if float(np.dot(dd, dd)) >= r2:
                continue                   # not relevant YET — it may
                # need avoiding on a later edge (don't mark used)
            if k in used:
                continue
            used.add(k)
            if k1 == k0:
                on_left = predicates._sign_scalar(
                    tuple(p1), tuple(p2), tuple(p)) > 0
            else:
                on_left = bool(predicates.ordered_ccw(
                    tuple(p0), tuple(p2), tuple(p), tuple(p1)))
            if not simp.avoid_disc(p, edge_sep, on_left):
                return False
        return True

    def follow(vprev, v):
        for nb in adj[v]:
            if nb != vprev and nb != v:
                return nb
        return None

    out: list[tuple] = []
    kept_sites: set = set()
    visited_edges: set = set()

    def simplify_from(v0, v1):
        vstart = v0
        while True:
            chain = [v0]
            used = {v0}
            simp = ChainSimplifier(sites[v0])
            ok = avoid_sites(v0, v0, v1, used, simp)
            done = False
            while True:
                chain.append(v1)
                used.add(v1)
                visited_edges.add((v0, v1))
                visited_edges.add((v1, v0))
                done = (not interior.get(v1, False)) or v1 == vstart
                if done:
                    break
                vnext = follow(v0, v1)
                if vnext is None:
                    done = True
                    break
                v0, v1 = v1, vnext
                if not (ok and simp.target_disc(sites[v0], tolerance)
                        and avoid_sites(chain[0], v0, v1, used, simp)
                        and simp.extend(sites[v1])):
                    break
            u, w = chain[0], chain[-1]
            kept_sites.add(u)
            kept_sites.add(w)
            # preserve directed multiplicity: a chain traversed k times
            # forward and m times backward emits k + m edges
            out.extend([(u, w)] * counts.get((chain[0], chain[1]), 0))
            out.extend([(w, u)] * counts.get((chain[1], chain[0]), 0))
            if done:
                return
            v0, v1 = chain[-1], follow(chain[-2], chain[-1])
            if v1 is None:
                return

    # start chains at every non-interior site
    for u in sorted(adj):
        if interior.get(u, False):
            continue
        for v in adj[u]:
            if (u, v) not in visited_edges:
                simplify_from(u, v)
    # leftover all-interior cycles: break at the canonical min site
    for u, v in sorted(edge_set):
        if (u, v) not in visited_edges:
            interior[u] = False
            simplify_from(u, v)
    if return_kept:
        return sorted(out), kept_sites
    return sorted(out)
