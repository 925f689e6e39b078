"""S2ChainInterpolationQuery (s2chain_interpolation_query.h:36-130,
.cc:28-170): parametrize a shape's edge chain by cumulative angular
length; query points at a distance or fraction along it, report the
covering edge, and slice sub-polylines.

Single-node face of ops/measures.chain_quantile /
chain_interpolate_point (the distributed analogues); this class is the
reference-parity API over VShape values (kernels/validation.VShape)."""

from __future__ import annotations

import bisect
import math

import numpy as np

from .edges import _angle, get_point_on_line
from .shapeutil import shape_chains


class ChainInterpolationResult:
    __slots__ = ("point", "edge_id", "distance")

    def __init__(self, point=None, edge_id: int = -1,
                 distance: float = 0.0):
        self.point = point
        self.edge_id = edge_id
        self.distance = distance

    def is_valid(self) -> bool:
        return self.point is not None


class ChainInterpolationQuery:
    """Construct with (shape, chain_id=-1); chain_id -1 spans ALL
    edges of the shape (the reference default)."""

    def __init__(self, shape=None, chain_id: int = -1):
        self._shape = None
        self._edges: list = []
        self._cum: list[float] = []
        self._first = 0
        self._last = -1
        if shape is not None:
            self.init(shape, chain_id)

    def init(self, shape, chain_id: int = -1) -> None:
        chains = shape_chains(shape)
        if chain_id >= len(chains):
            raise ValueError("chain_id out of range")
        all_edges = [(np.asarray(v0, dtype=np.float64),
                      np.asarray(v1, dtype=np.float64))
                     for (_, _, v0, v1) in shape.edges()]
        if chain_id >= 0:
            start, length = chains[chain_id]
            first, last = start, start + length - 1
        else:
            first, last = 0, len(all_edges) - 1
        cum: list[float] = []
        acc = 0.0
        for i in range(first, last + 1):
            cum.append(acc)
            v0, v1 = all_edges[i]
            acc += _angle(v0, v1)
        if cum:
            cum.append(acc)
        self._shape = shape
        self._edges = all_edges
        self._cum = cum
        self._first = first
        self._last = last

    def get_length(self) -> float:
        return self._cum[-1] if self._cum else 0.0

    def get_length_at_edge_end(self, edge_id: int) -> float:
        if not self._cum:
            return 0.0
        if edge_id < self._first or edge_id > self._last:
            return math.inf
        return self._cum[edge_id - self._first + 1]

    def at_distance(self, distance: float) -> ChainInterpolationResult:
        if not self._cum:
            return ChainInterpolationResult()
        i = bisect.bisect_left(self._cum, distance)
        if i == 0:
            return ChainInterpolationResult(
                self._edges[self._first][0], self._first, self._cum[0])
        if i == len(self._cum):
            return ChainInterpolationResult(
                self._edges[self._last][1], self._last, self._cum[-1])
        edge_id = i + self._first - 1
        v0, v1 = self._edges[edge_id]
        return ChainInterpolationResult(
            get_point_on_line(v0, v1, distance - self._cum[i - 1]),
            edge_id, distance)

    def at_fraction(self, fraction: float) -> ChainInterpolationResult:
        return self.at_distance(fraction * self.get_length())

    def slice(self, begin_fraction: float,
              end_fraction: float) -> list[np.ndarray]:
        """Sub-polyline between two fractions (reversed when
        begin > end), .cc:125-170."""
        out: list[np.ndarray] = []
        if not self._cum:
            return out
        reverse = begin_fraction > end_fraction
        if reverse:
            begin_fraction, end_fraction = end_fraction, begin_fraction
        res = self.at_fraction(begin_fraction)
        begin_edge = res.edge_id
        last_point = res.point
        out.append(last_point)
        res = self.at_fraction(end_fraction)
        for edge_id in range(begin_edge, res.edge_id):
            v1 = self._edges[edge_id][1]
            if not np.array_equal(last_point, v1):
                last_point = v1
                out.append(last_point)
        out.append(res.point)
        if reverse:
            out.reverse()
        return out
