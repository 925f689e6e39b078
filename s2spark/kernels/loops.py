"""S2Loop / S2Polygon containment kernels.

A loop is a closed ring of unit-sphere vertices whose interior is on the
left of the directed boundary.  Containment uses the reference's
crossing-parity algorithm seeded from a fixed origin point
(s2loop.cc:573-600): inside(p) = origin_inside XOR #crossings(Origin->p).

The region interface (contains_cell / may_intersect_cell) exploits that S2
cells are geodesically convex: a loop intersects a cell iff some loop
vertex is inside the cell, some loop edge crosses a cell edge, or the cell
center is inside the loop.  This powers both the coverer and the
edge-cell index build for the distributed point-in-polygon join.

Reference semantics: s2loop.cc:246-272 (origin init), s2loop.cc:573-621
(contains), s2loop.cc:478-546 (cell relations via clipped edges).
"""

from __future__ import annotations

import math

import numpy as np

from . import cellid, predicates
from .region import Cell

# Fixed reference point (s2pointutil.h:114-115) — must match the reference
# doubles exactly for bit-exact containment verdicts.
ORIGIN = (-0.0099994664350250197, 0.0025924542609324121, 0.99994664350250195)


def parse_vertices(text: str) -> np.ndarray:
    """Parse the reference's s2textformat '"lat:lng, lat:lng"' fixture
    language (s2text_format.h:19-25) into an (n,3) unit-vector array."""
    pts = []
    for pair in text.split(","):
        pair = pair.strip()
        if not pair:
            continue
        lat_s, _, lng_s = pair.partition(":")
        lat = math.radians(float(lat_s))
        lng = math.radians(float(lng_s))
        cos_lat = math.cos(lat)
        pts.append((math.cos(lng) * cos_lat, math.sin(lng) * cos_lat,
                    math.sin(lat)))
    return np.array(pts, dtype=np.float64)


def to_text(points: np.ndarray, roundtrip: bool = False) -> str:
    """s2textformat writer (s2text_format.cc:322-345): 'lat:lng, ...'
    in degrees; %.15g by default, %.17g with roundtrip=True (the
    reference's round-trip precision mode)."""
    pts = np.asarray(points, dtype=np.float64)
    fmt = "%.17g:%.17g" if roundtrip else "%.15g:%.15g"
    parts = []
    for x, y, z in pts:
        lat = math.degrees(math.atan2(z, math.sqrt(x * x + y * y)))
        lng = math.degrees(math.atan2(y, x))
        parts.append(fmt % (lat, lng))
    return ", ".join(parts)


def _edges_intersect_cell_tail(ec: np.ndarray, ed: np.ndarray,
                               result: np.ndarray, cell) -> np.ndarray:
    """Shared tail of the edge-vs-cell test: `result` holds the
    endpoint-inside verdicts; survivors go through the conservative
    gnomonic uv prefilter (ClipToPaddedFace slice — never rejects a
    true intersection) and then the robust CrossingSign ladder against
    the 4 cell edges."""
    from . import clipping
    todo = np.nonzero(~result)[0]
    if todo.size:
        maybe = clipping.edges_may_intersect_cell(ec[todo], ed[todo],
                                                  cell)
        todo = todo[maybe]
    if todo.size:
        cv = np.array([cell.get_vertex(k) for k in range(4)],
                      dtype=np.float64)
        cv_next = np.roll(cv, -1, axis=0)
        a = np.repeat(ec[todo], 4, axis=0)
        b = np.repeat(ed[todo], 4, axis=0)
        c = np.tile(cv, (todo.size, 1))
        d = np.tile(cv_next, (todo.size, 1))
        cs = predicates.crossing_sign(a, b, c, d)
        hits = (cs >= 0).reshape(todo.size, 4).any(axis=1)
        result[todo] = hits
    return result


def soup_edges_intersect_cell(ec: np.ndarray, ed: np.ndarray,
                              cell) -> np.ndarray:
    """Per-edge boolean for an arbitrary edge soup (no closure
    assumption): does edge (ec[i], ed[i]) intersect the convex cell?"""
    from . import clipping
    inside = (clipping.cell_contains_points(cell, ec)
              | clipping.cell_contains_points(cell, ed))
    return _edges_intersect_cell_tail(ec, ed, inside, cell)


def soup_candidate_pairs(p0: np.ndarray, p1: np.ndarray,
                         max_edges_per_cell: int = 10,
                         max_level: int = 12) -> set[tuple[int, int]]:
    """Candidate intersecting pairs of an edge soup via recursive cell
    subdivision (the index-cell co-location argument of
    s2shapeutil_visit_crossing_edge_pairs.h): any point shared by two
    edges lies in a recursion cell where both survive, and the branch
    only stops once survivors fit max_edges_per_cell (or max_level) —
    so emitted co-located pairs are a complete superset of all
    crossing/touching pairs at O(n) pair count instead of O(n^2)."""
    from .region import Cell
    from . import cellid
    pairs: set[tuple[int, int]] = set()

    def visit(cid: int, ids: np.ndarray):
        cell = Cell(cid)
        hits = ids[soup_edges_intersect_cell(p0[ids], p1[ids], cell)] \
            if ids.size else ids
        if hits.size <= 1:
            return
        if hits.size <= max_edges_per_cell or cell.level >= max_level:
            h = hits.tolist()
            for x in range(len(h)):
                for y in range(x + 1, len(h)):
                    pairs.add((h[x], h[y]))
            return
        for ch in cellid.child(np.full(4, cid, dtype=np.uint64),
                               np.arange(4)):
            visit(int(ch), hits)

    for face in range(6):
        visit(int(cellid.from_face(np.array([face]))[0]),
              np.arange(len(p0)))
    return pairs


class Loop:
    """Closed vertex ring with crossing-parity containment."""

    def __init__(self, vertices: np.ndarray):
        v = np.asarray(vertices, dtype=np.float64)
        if v.ndim != 2 or v.shape[1] != 3:
            raise ValueError("vertices must be (n,3)")
        self.vertices = v
        self.n = v.shape[0]
        self.origin_inside = self._init_origin_inside()

    @classmethod
    def from_text(cls, text: str) -> "Loop":
        return cls(parse_vertices(text))

    @classmethod
    def from_latlng_degrees(cls, latlngs) -> "Loop":
        arr = np.asarray(latlngs, dtype=np.float64)
        lat = np.radians(arr[:, 0])
        lng = np.radians(arr[:, 1])
        cos_lat = np.cos(lat)
        return cls(np.stack([np.cos(lng) * cos_lat, np.sin(lng) * cos_lat,
                             np.sin(lat)], axis=1))

    # -- initialization (s2loop.cc:246-272) -------------------------------
    def _init_origin_inside(self) -> bool:
        if self.n < 3:
            return False
        v0 = tuple(self.vertices[0])
        v1 = tuple(self.vertices[1])
        v2 = tuple(self.vertices[2])
        v1_inside = (v0 != v1 and v2 != v1
                     and predicates.angle_contains_vertex(v0, v1, v2))
        # guess origin outside, then verify via the parity test on vertex 1
        self.origin_inside = False
        if v1_inside != bool(self.contains_points(
                self.vertices[1:2])[0]):
            return True
        return False

    # -- containment (s2loop.cc:573-600) -----------------------------------
    def contains_points(self, points: np.ndarray) -> np.ndarray:
        """Vectorized crossing-parity containment for (m,3) points.

        Builds the (m*n) point-edge pair set and counts
        EdgeOrVertexCrossings of segment Origin->p against each loop edge.
        """
        p = np.asarray(points, dtype=np.float64)
        m = p.shape[0]
        if self.n < 3 or m == 0:
            return np.full(m, self.origin_inside, dtype=bool)
        origin = np.array(ORIGIN, dtype=np.float64)
        edges_c = self.vertices
        edges_d = np.roll(self.vertices, -1, axis=0)
        # tile: for each point, all n edges
        a = np.broadcast_to(origin, (m * self.n, 3))
        b = np.repeat(p, self.n, axis=0)
        c = np.tile(edges_c, (m, 1))
        d = np.tile(edges_d, (m, 1))
        crossings = predicates.edge_or_vertex_crossing(a, b, c, d)
        parity = crossings.reshape(m, self.n).sum(axis=1) % 2
        # inside = origin_inside XOR (odd number of crossings)
        return (parity == 1) != self.origin_inside

    def contains_point(self, p) -> bool:
        return bool(self.contains_points(np.asarray([p]))[0])

    # -- cell relations (for coverer + edge-cell index) ---------------------
    def _cell_vertices(self, cell: Cell) -> np.ndarray:
        return np.array([cell.get_vertex(k) for k in range(4)],
                        dtype=np.float64)

    # standalone soup variant lives at module level
    # (soup_edges_intersect_cell) so edge-soup callers — the builder's
    # crossing stabilizer, validation — share the identical test

    def edge_intersects_cell(self, cell: Cell,
                             edge_ids: np.ndarray | None = None
                             ) -> np.ndarray:
        """Per-edge boolean: does loop edge i intersect the (convex) cell?

        True iff an endpoint is inside the cell or the edge crosses one of
        the 4 geodesic cell edges.  With `edge_ids` the test runs over
        that subset only (mask aligned to edge_ids) — the index build's
        recursion shrinks its candidate set per cell, so per-cell work
        must be O(|survivors|), not O(n).
        """
        if edge_ids is not None:
            eid = np.asarray(edge_ids, dtype=np.int64)
            ec = self.vertices[eid]
            ed = self.vertices[(eid + 1) % self.n]
            return soup_edges_intersect_cell(ec, ed, cell)
        from . import clipping
        ec = self.vertices
        ed = np.roll(self.vertices, -1, axis=0)
        inside_c = clipping.cell_contains_points(cell, ec)
        inside_d = np.roll(inside_c, -1)
        return _edges_intersect_cell_tail(ec, ed, inside_c | inside_d,
                                          cell)

    def may_intersect_cell(self, cell: Cell) -> bool:
        if self.edge_intersects_cell(cell).any():
            return True
        return self.contains_point(cell.get_center())

    def contains_cell(self, cell: Cell) -> bool:
        if self.edge_intersects_cell(cell).any():
            return False
        return self.contains_point(cell.get_center())

    def get_rect_bound(self):
        """Conservative lat/lng rectangle bound of the boundary chain
        (S2LatLngRectBounder port, kernels/rect_bounder.py) — tighter
        than the cap bound for skinny loops.  NOTE: bounds the
        BOUNDARY; a loop whose interior contains a pole needs the
        polar closure of its interior too (S2Loop::GetRectBound adds
        that; callers here check contains_point(pole))."""
        from .rect_bounder import loop_rect_bound
        return loop_rect_bound(self.vertices)

    def get_cell_union_bound(self) -> list:
        """Bounding cells: 4 vertex neighbors around the centroid-ish
        vertex, or the 6 faces for big loops (cap-style bound)."""
        # conservative: cap through all vertices around their centroid
        centroid = self.vertices.mean(axis=0)
        norm = np.linalg.norm(centroid)
        if norm < 1e-9:
            return [int(v) for v in
                    cellid.from_face(np.arange(6))]
        center = centroid / norm
        # chord^2 radius to farthest vertex
        d2 = ((self.vertices - center) ** 2).sum(axis=1).max()
        from .region import Cap
        cap = Cap(tuple(center), float(d2))
        if self.origin_inside or cap.radius2 >= 2.0:
            # loop may be "inverted" (contains most of sphere): fall back
            return [int(v) for v in cellid.from_face(np.arange(6))]
        return cap.get_cell_union_bound()

    # -- measures (s2loop_measures.cc) --------------------------------------
    def signed_area_terms(self) -> np.ndarray:
        """Per-edge spherical triangle contributions relative to vertex 0
        (Girard/L'Huilier via S2::Area of (v0, vi, vi+1)); summing gives
        the signed loop area (positive = CCW interior)."""
        v0 = self.vertices[0]
        out = np.zeros(self.n, dtype=np.float64)
        for i in range(1, self.n - 1):
            out[i] = _signed_triangle_area(v0, self.vertices[i],
                                           self.vertices[i + 1])
        return out

    def get_curvature(self) -> float:
        """Sum of turn angles at each vertex (Gauss-Bonnet curvature;
        s2loop_measures.cc GetCurvature).  2*pi for a tiny CCW loop,
        -2*pi for a tiny CW loop, 0 for a hemisphere."""
        total = 0.0
        v = self.vertices
        n = self.n
        for i in range(n):
            a, b, c = v[i - 1], v[i], v[(i + 1) % n]
            ab = np.cross(a, b)
            bc = np.cross(b, c)
            na, nb = np.linalg.norm(ab), np.linalg.norm(bc)
            if na == 0 or nb == 0:
                continue
            cosang = float(np.dot(ab, bc)) / (na * nb)
            ang = math.acos(max(-1.0, min(1.0, cosang)))
            s = predicates._sign_scalar(tuple(a), tuple(b), tuple(c))
            total += ang if s > 0 else -ang
        return total

    def get_area(self) -> float:
        """Area of the loop interior in steradians, in [0, 4*pi].

        Uses Gauss-Bonnet (area = 2*pi - curvature), which is exact for
        hemispheres and well-conditioned for both tiny and huge loops —
        the same identity the reference leans on (s2loop_measures.cc)."""
        area = 2 * math.pi - self.get_curvature()
        return max(0.0, min(4 * math.pi, area))


def _signed_triangle_area(a, b, c) -> float:
    """Signed area via Girard's formula with stable angles."""
    def angle(u, v):
        cross = np.cross(u, v)
        return math.atan2(float(np.linalg.norm(cross)), float(np.dot(u, v)))

    ab, bc, ca = angle(a, b), angle(b, c), angle(c, a)
    s = 0.5 * (ab + bc + ca)
    if max(ab, bc, ca) < 1e-10:
        return 0.0
    # L'Huilier's theorem
    t = (math.tan(0.5 * s) * math.tan(0.5 * (s - ab))
         * math.tan(0.5 * (s - bc)) * math.tan(0.5 * (s - ca)))
    area = 4 * math.atan(math.sqrt(max(0.0, t)))
    # sign from orientation
    det = float(np.dot(np.cross(a, b), c))
    return area if det >= 0 else -area


class Polygon:
    """Multi-loop polygon; a point is inside iff it is contained by an odd
    number of loops (nested-loop / hole semantics, s2polygon.h:116-259)."""

    def __init__(self, loops: list):
        self.loops = loops

    def contains_points(self, points: np.ndarray) -> np.ndarray:
        p = np.asarray(points, dtype=np.float64)
        acc = np.zeros(p.shape[0], dtype=np.int64)
        for loop in self.loops:
            acc += loop.contains_points(p)
        return (acc % 2) == 1

    def may_intersect_cell(self, cell: Cell) -> bool:
        if any(loop.edge_intersects_cell(cell).any() for loop in self.loops):
            return True
        return bool(self.contains_points(
            np.asarray([cell.get_center()]))[0])

    def contains_cell(self, cell: Cell) -> bool:
        if any(loop.edge_intersects_cell(cell).any() for loop in self.loops):
            return False
        return bool(self.contains_points(
            np.asarray([cell.get_center()]))[0])

    def get_cell_union_bound(self) -> list:
        out = []
        for loop in self.loops:
            out.extend(loop.get_cell_union_bound())
        from . import cellunion
        return [int(v) for v in cellunion.normalize(
            np.array(out, dtype=np.uint64))]
