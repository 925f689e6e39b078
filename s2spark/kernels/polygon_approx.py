"""Polygon-level approximate predicates (reference s2polygon.h:316-352
and s2polygon.cc:657-680, 1430-1475):

- approx_contains / approx_disjoint / approx_equals: boolean-op
  emptiness under a snap tolerance — ApproxContains(a, b, tol) is
  "difference(b, a) snapped with IdentitySnapFunction(tol) is empty"
  (s2polygon.cc:657-661); disjoint uses intersection, equals the
  symmetric difference.  The tolerance snap is realized as the
  builder's greedy site selection at snap_radius = tol over the input
  vertices AND the computed crossing points (the reference's
  IdentitySnapFunction(tolerance) merges vertices the same way) —
  slivers thinner than the tolerance collapse to sibling-cancelled
  degenerate chains and vanish.

- boundary_approx_equals: same vertex count, some rotation offset has
  every vertex pair within max_error (s2loop.cc:1271-1293).
- boundary_near / match_boundaries: the (i, j) lockstep walk with
  backtracking — advance i when a(i+1) is within max_error of edge
  b(j, j+1) and vice versa (s2loop.cc:1295-1352).
- polygon wrappers match loops by nesting depth, any order
  (s2polygon.cc:1430-1475).

Polygons are the even/odd multi-loop regions the builder uses: a
Loop, list[Loop], [] (empty), or builder.FULL.
"""

from __future__ import annotations

import math

import numpy as np

from . import edges as ek
from .builder import (FULL, SelectedSitesSnap, overlay_geometry,
                      overlay_result_state, region_loops, select_sites)
from .loops import Loop
from .pointutil import approx_equals as point_approx_equals

# the reference's default merge radius for approximate predicates
# (S2::kIntersectionMergeRadius = 2 * kIntersectionError)
INTERSECTION_MERGE_RADIUS = 2 * 8 * (2 ** -53) * (3 + 2 / math.sqrt(3))


def _split_edges_at_sites(verts: np.ndarray, sites: np.ndarray,
                          tolerance: float,
                          max_passes: int = 4) -> np.ndarray:
    """S2Builder's edge snap invariant (s2builder.h:30-61): an edge
    passing within snap_radius of a site is rerouted THROUGH it.
    Inserts each qualifying site into its edge ordered by the edge
    parameter, iterating to a fixpoint (an insertion bends the edge
    toward further sites)."""
    d2max = _chord2(tolerance)
    for _ in range(max_passes):
        out: list[np.ndarray] = []
        changed = False
        n = len(verts)
        for i in range(n):
            p, q = verts[i], verts[(i + 1) % n]
            out.append(p)
            d2 = ek.point_segment_chord2(
                sites, np.broadcast_to(p, sites.shape),
                np.broadcast_to(q, sites.shape))
            near = d2 <= d2max
            # skip sites equal to either endpoint (already routed)
            near &= ~((sites == p).all(axis=1)
                      | (sites == q).all(axis=1))
            if near.any():
                from .builder import _edge_param
                cand = sites[near]
                ts = np.array([_edge_param(p, q, s) for s in cand])
                keep = (ts > 0.0) & (ts < 1.0)
                cand, ts = cand[keep], ts[keep]
                if len(cand):
                    changed = True
                    for s in cand[np.argsort(ts)]:
                        out.append(s)
        verts = np.asarray(out)
        if not changed:
            break
    return verts


def _presnap(a, b, tolerance: float):
    """IdentitySnapFunction(tolerance) analogue applied to the INPUTS
    (the reference snaps before classifying, which is what makes
    nearly-coincident boundaries bit-identical): greedy site selection
    at snap_radius=tolerance over both regions' vertices, each vertex
    snapped to its site, then every edge split at the sites it passes
    within tolerance of.  Loops collapsing below 3 distinct vertices
    carry no interior and are dropped."""
    a_loops, a_full = region_loops(a)
    b_loops, b_full = region_loops(b)
    if tolerance <= 0 or (not a_loops and not b_loops):
        return a, b
    pts = [v for lp in a_loops for v in lp.vertices]
    pts += [v for lp in b_loops for v in lp.vertices]
    sites = select_sites(pts, tolerance)
    snap = SelectedSitesSnap(sites)

    def one(loops, full):
        if full:
            return FULL
        out = []
        for lp in loops:
            v = np.array([snap.site_point(snap.site_key(p), p)
                          for p in lp.vertices])
            # drop consecutive duplicates (cyclically)
            keep = np.any(v != np.roll(v, 1, axis=0), axis=1)
            v = v[keep]
            if len(v) >= 3:
                v = _split_edges_at_sites(v, sites, tolerance)
            if len(v) >= 3:
                out.append(Loop(v))
        return out

    return one(a_loops, a_full), one(b_loops, b_full)


def _overlay_is_empty(a, b, op: str, tolerance: float) -> bool:
    """is_empty(op(a, b) under the tolerance pre-snap) — degenerate
    (<3 vertex) chains carry no polygon interior (the reference's
    polygon layer discards them)."""
    a, b = _presnap(a, b, tolerance)
    chains = overlay_geometry(a, b, op)
    if any(len(c) >= 3 for c in chains):
        return False
    return overlay_result_state(a, b, op, []) == "empty"


def approx_contains(a, b, tolerance: float = INTERSECTION_MERGE_RADIUS
                    ) -> bool:
    """S2Polygon::ApproxContains(b, tol) (s2polygon.cc:657-661):
    difference(b, a) under the tolerance snap is empty."""
    return _overlay_is_empty(b, a, "difference", tolerance)


def approx_disjoint(a, b, tolerance: float = INTERSECTION_MERGE_RADIUS
                    ) -> bool:
    """S2Polygon::ApproxDisjoint (s2polygon.cc:663-667):
    intersection(b, a) under the tolerance snap is empty."""
    return _overlay_is_empty(b, a, "intersection", tolerance)


def approx_equals(a, b, tolerance: float = INTERSECTION_MERGE_RADIUS
                  ) -> bool:
    """S2Polygon::ApproxEquals (s2polygon.cc:669-680): symmetric
    difference under the tolerance snap is empty."""
    return _overlay_is_empty(b, a, "symmetric_difference", tolerance)


# ---------------------------------------------------------------------------
# boundary matching (loop level)

def _chord2(max_error: float) -> float:
    ang = min(max(max_error, 0.0), math.pi)
    return (2.0 * math.sin(0.5 * ang)) ** 2


def boundary_approx_equals(a: Loop, b: Loop,
                           max_error: float = 1e-15) -> bool:
    """S2Loop::BoundaryApproxEquals (s2loop.cc:1271-1293): identical
    vertex counts and some rotation offset matching every vertex
    within max_error."""
    va, vb = a.vertices, b.vertices
    n = len(va)
    if n != len(vb):
        return False
    for offset in range(n):
        rolled = np.roll(va, -offset, axis=0)
        if point_approx_equals(rolled, vb, max_error).all():
            return True
    return False


def match_boundaries(a: Loop, b: Loop, a_offset: int,
                     max_error: float) -> bool:
    """The (i, j) lockstep walk of s2loop.cc:1295-1337: i advances
    when vertex a(i+1+offset) lies within max_error of edge
    b(j, j+1), j symmetrically; DFS with a visited set handles the
    both-can-advance backtracking."""
    va, vb = a.vertices, b.vertices
    na, nb = len(va), len(vb)
    d2max = _chord2(max_error)

    def near(x, e0, e1) -> bool:
        return float(ek.point_segment_chord2(
            x[None, :], e0[None, :], e1[None, :])[0]) <= d2max

    pending = [(0, 0)]
    done = set()
    while pending:
        i, j = pending.pop()
        if i == na and j == nb:
            return True
        done.add((i, j))
        io = i + a_offset
        if io >= na:
            io -= na
        if (i < na and (i + 1, j) not in done
                and near(va[(io + 1) % na], vb[j % nb],
                         vb[(j + 1) % nb])):
            pending.append((i + 1, j))
        if (j < nb and (i, j + 1) not in done
                and near(vb[(j + 1) % nb], va[io],
                         va[(io + 1) % na])):
            pending.append((i, j + 1))
    return False


def boundary_near(a: Loop, b: Loop, max_error: float = 1e-15) -> bool:
    """S2Loop::BoundaryNear (s2loop.cc:1340-1346): some starting
    offset of a admits a full lockstep boundary match."""
    for a_offset in range(len(a.vertices)):
        if match_boundaries(a, b, a_offset, max_error):
            return True
    return False


# ---------------------------------------------------------------------------
# polygon wrappers (depth-matched loop pairing, s2polygon.cc:1430-1475)

def _loop_depths(loops: list[Loop]) -> list[int]:
    """Nesting depth per loop: how many OTHER loops of the same
    even/odd polygon contain the loop's first vertex."""
    out = []
    for i, lp in enumerate(loops):
        v = lp.vertices[0][None, :]
        d = sum(1 for j, other in enumerate(loops)
                if j != i and bool(other.contains_points(v)[0]))
        out.append(d)
    return out


def _polygon_boundary_match(a, b, max_error: float, per_loop) -> bool:
    a_loops, a_full = region_loops(a)
    b_loops, b_full = region_loops(b)
    if a_full or b_full:
        return a_full == b_full and not a_loops and not b_loops
    if len(a_loops) != len(b_loops):
        return False
    da, db = _loop_depths(a_loops), _loop_depths(b_loops)
    for i, la in enumerate(a_loops):
        if not any(db[j] == da[i] and per_loop(lb, la, max_error)
                   for j, lb in enumerate(b_loops)):
            return False
    return True


def polygon_boundary_approx_equals(a, b, max_error: float = 1e-15
                                   ) -> bool:
    """S2Polygon::BoundaryApproxEquals (s2polygon.cc:1430-1451)."""
    return _polygon_boundary_match(a, b, max_error,
                                   boundary_approx_equals)


def polygon_boundary_near(a, b, max_error: float = 1e-15) -> bool:
    """S2Polygon::BoundaryNear (s2polygon.cc:1453-1475)."""
    return _polygon_boundary_match(a, b, max_error, boundary_near)
