"""S2ShapeIndexRegion and S2ShapeIndexBufferedRegion — S2Region
adaptors over a mixed-dimension geometry collection, duck-typed for
RegionCoverer (contains_cell / may_intersect_cell / contains_point /
get_cell_union_bound).

References: s2shape_index_region.h:73-115 (conservative
Contains/MayIntersect over all shapes of an index),
s2shape_index_buffered_region.h:36-57 + s2shape_index_buffered_region
.cc:90-127 (distance-to-geometry region: no geometry is actually
buffered — candidate cells are classified by their distance to the
original geometry, so a buffered point region is exactly the cap of
that radius).
"""

from __future__ import annotations

import numpy as np

from .loops import soup_edges_intersect_cell
from .region import Cap, Cell, angle_to_chord2, chord2_to_angle

__all__ = ["ShapeIndexRegion", "ShapeIndexBufferedRegion"]


def _collection_parts(collection):
    """(points (n,3), line list, polygon Loops, polygon_full)."""
    from .layers import _split_lax_region
    pts = np.asarray(collection.points, dtype=np.float64).reshape(-1, 3)
    lines = [np.asarray(v, dtype=np.float64) for v in collection.lines]
    loops, degen, full = _split_lax_region(collection.region)
    # degenerate polygon chains behave like points/edges for coverings
    for d in degen:
        if len(d) == 1:
            pts = np.concatenate([pts, d])
        else:
            lines.append(d)
    return pts, lines, loops, full


def _edge_arrays(lines, loops):
    """All geometry edges as (m,3) endpoint arrays (polyline walks
    open, polygon loops closed)."""
    e0, e1 = [], []
    for v in lines:
        if len(v) >= 2:
            e0.append(v[:-1])
            e1.append(v[1:])
    for lp in loops:
        e0.append(lp.vertices)
        e1.append(np.roll(lp.vertices, -1, axis=0))
    if not e0:
        z = np.empty((0, 3))
        return z, z
    return np.concatenate(e0), np.concatenate(e1)


class ShapeIndexRegion:
    """S2ShapeIndexRegion (s2shape_index_region.h:73-115): the region
    covered by every shape of a mixed collection.  Contains(cell) is
    true iff the polygon dimension contains the whole cell (points
    and polylines can never contain a cell); MayIntersect(cell) is
    true iff any point, edge, or polygon interior touches the cell.
    Conservative in the same direction as the reference (may
    over-report intersection, under-report containment)."""

    def __init__(self, collection):
        from .builder import region_contains
        self.points, self.lines, self.loops, self.full = \
            _collection_parts(collection)
        self._e0, self._e1 = _edge_arrays(self.lines, self.loops)
        self._region_contains = region_contains

    def _poly_contains(self, pts: np.ndarray) -> np.ndarray:
        return self._region_contains(self.loops, self.full, pts)

    def contains_cell(self, cell: Cell) -> bool:
        if self.full:
            return True
        if not self.loops:
            return False
        if len(self._e0) and soup_edges_intersect_cell(
                self._e0, self._e1, cell).any():
            # NOTE: polyline edges crossing the cell do not preclude
            # polygon containment in the reference; being conservative
            # here only makes coverings finer, never wrong
            return False
        return bool(self._poly_contains(
            np.asarray(cell.get_center())[None])[0])

    def may_intersect_cell(self, cell: Cell) -> bool:
        if self.full:
            return True
        from .clipping import cell_contains_points
        if len(self.points) and cell_contains_points(
                cell, self.points).any():
            return True
        if len(self._e0) and soup_edges_intersect_cell(
                self._e0, self._e1, cell).any():
            return True
        if self.loops:
            return bool(self._poly_contains(
                np.asarray(cell.get_center())[None])[0])
        return False

    def contains_point(self, p) -> bool:
        p = np.asarray(p, dtype=np.float64)
        if len(self.points) and any(
                np.array_equal(p, q) for q in self.points):
            return True
        from .layers import polyline_contains_point
        if any(polyline_contains_point(v, p, "closed")
               for v in self.lines if len(v) >= 2):
            return True
        return bool(self._poly_contains(p[None])[0])

    def _bound_cap(self) -> Cap:
        cap = Cap.empty()
        for q in self.points:
            cap = cap.add_point(q)
        for a in (self._e0, self._e1):
            for q in a:
                cap = cap.add_point(q)
        return cap

    def get_cell_union_bound(self) -> list:
        from . import cellid
        if self.full:
            return [int(v) for v in cellid.from_face(np.arange(6))]
        if self.loops:
            # loop interiors may wrap poles; union the per-loop bounds
            out: set = set()
            for lp in self.loops:
                out.update(int(v) for v in lp.get_cell_union_bound())
            for q in self.points:
                out.update(int(v) for v in
                           Cap.from_point(q).get_cell_union_bound())
            for v in self.lines:
                c = Cap.empty()
                for q in v:
                    c = c.add_point(q)
                out.update(int(v2) for v2 in c.get_cell_union_bound())
            return sorted(out)
        cap = self._bound_cap()
        if cap.is_empty():
            return []
        return cap.get_cell_union_bound()


class ShapeIndexBufferedRegion:
    """S2ShapeIndexBufferedRegion (s2shape_index_buffered_region.cc:
    90-127): all points within `radius_rad` of the collection.
    MayIntersect(cell) = dist(cell, geometry) <= radius;
    Contains(cell) = unbuffered containment, or dist(cell center) +
    cell cap radius <= radius (the reference's bounding-cap
    heuristic — conservative, never over-reports)."""

    def __init__(self, collection, radius_rad: float):
        if radius_rad < 0:
            raise ValueError("radius must be >= 0")
        self.base = ShapeIndexRegion(collection)
        self.radius_rad = float(radius_rad)
        self.radius2 = angle_to_chord2(self.radius_rad)

    def _min_chord2_to_cell(self, cell: Cell) -> float:
        """min over all geometry of chord² to the (closed) cell —
        exact for points and edges (the min distance between two
        non-crossing geodesic segments is attained at an endpoint of
        one of them, the S2::UpdateEdgePairMinDistance argument)."""
        from .clipping import cell_contains_points
        from .edges import point_segment_chord2
        base = self.base
        best = np.inf
        cv = np.array([cell.get_vertex(k) for k in range(4)],
                      dtype=np.float64)
        cw = np.roll(cv, -1, axis=0)
        if len(base.points):
            inside = cell_contains_points(cell, base.points)
            if inside.any():
                return 0.0
            for k in range(4):
                d2 = point_segment_chord2(
                    base.points, np.broadcast_to(cv[k],
                                                 base.points.shape),
                    np.broadcast_to(cw[k], base.points.shape))
                best = min(best, float(d2.min()))
        if len(base._e0):
            if soup_edges_intersect_cell(base._e0, base._e1,
                                         cell).any():
                return 0.0
            e0, e1 = base._e0, base._e1
            m = len(e0)
            # cell vertices -> geometry edges
            for k in range(4):
                d2 = point_segment_chord2(
                    np.broadcast_to(cv[k], e0.shape), e0, e1)
                best = min(best, float(d2.min()))
            # geometry endpoints -> cell edges
            for k in range(4):
                a = np.broadcast_to(cv[k], e0.shape)
                b = np.broadcast_to(cw[k], e0.shape)
                best = min(best,
                           float(point_segment_chord2(e0, a, b).min()),
                           float(point_segment_chord2(e1, a, b).min()))
        if base.loops or base.full:
            if base.may_intersect_cell(cell):
                return 0.0
        return best if best != np.inf else 4.0

    def may_intersect_cell(self, cell: Cell) -> bool:
        return self._min_chord2_to_cell(cell) <= self.radius2

    def contains_cell(self, cell: Cell) -> bool:
        if self.radius_rad >= np.pi:
            return True
        if self.base.contains_cell(cell):
            return True
        center = np.asarray(cell.get_center(), dtype=np.float64)
        cap_r2 = max(
            float(np.sum((np.asarray(cell.get_vertex(k)) - center)
                         ** 2)) for k in range(4))
        d_center = chord2_to_angle(self._min_chord2_to_point(center))
        return (d_center + chord2_to_angle(cap_r2)
                <= self.radius_rad)

    def _min_chord2_to_point(self, p: np.ndarray) -> float:
        from .edges import point_segment_chord2
        base = self.base
        if base.loops or base.full:
            if bool(base._poly_contains(p[None])[0]):
                return 0.0
        best = np.inf
        if len(base.points):
            best = min(best, float(np.min(np.sum(
                (base.points - p) ** 2, axis=1))))
        if len(base._e0):
            d2 = point_segment_chord2(
                np.broadcast_to(p, base._e0.shape),
                base._e0, base._e1)
            best = min(best, float(d2.min()))
        return best if best != np.inf else 4.0

    def contains_point(self, p) -> bool:
        p = np.asarray(p, dtype=np.float64)
        return self._min_chord2_to_point(p) <= self.radius2

    def get_cell_union_bound(self) -> list:
        from . import cellid
        cap = self.base._bound_cap()
        if self.base.full or self.radius_rad >= np.pi:
            return [int(v) for v in cellid.from_face(np.arange(6))]
        if cap.is_empty() and not self.base.loops:
            return []
        # expand the point/edge cap by the radius; polygon loops add
        # their own (pole-safe) bounds expanded via their cap
        out: set = set()
        if not cap.is_empty():
            grown = Cap(cap.center,
                        angle_to_chord2(min(
                            np.pi,
                            chord2_to_angle(max(cap.radius2, 0.0))
                            + self.radius_rad)))
            out.update(int(v) for v in grown.get_cell_union_bound())
        for lp in self.base.loops:
            c = Cap.empty()
            for q in lp.vertices:
                c = c.add_point(q)
            # a loop's interior can exceed its vertex cap (pole
            # wrap); fall back to face cells for safety
            if bool(self.base._poly_contains(
                    np.asarray([[0.0, 0.0, 1.0],
                                [0.0, 0.0, -1.0]])).any()):
                return [int(v) for v in
                        cellid.from_face(np.arange(6))]
            grown = Cap(c.center,
                        angle_to_chord2(min(
                            np.pi,
                            chord2_to_angle(max(c.radius2, 0.0))
                            + self.radius_rad)))
            out.update(int(v) for v in grown.get_cell_union_bound())
        return sorted(out)
