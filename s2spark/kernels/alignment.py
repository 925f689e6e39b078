"""S2 polyline alignment — exact DTW with warp paths, the FastDTW
windowed approximation, medoid and DBA consensus polylines
(s2polyline_alignment.h:60-210, s2polyline_alignment.cc:41-420,
s2polyline_alignment_internal.h Window semantics).

The cost metric is the CHORDAL distance sum over the warp path
((a_i - b_j).Norm()), matching the reference's optimization note.
The windowed approximation is the FastDTW recursion (Salvador & Chan):
half-resolution, recursive align, upsample the warp-path window,
dilate by `radius`, constrained DP.
"""

from __future__ import annotations

import math

import numpy as np

# a ColumnStride is a [start, end) column range; a Window is one
# stride per row with the monotone structural invariants of
# s2polyline_alignment_internal.h


class Window:
    def __init__(self, strides: list[tuple[int, int]]):
        assert strides and strides[0][0] == 0
        self.strides = list(strides)
        self.rows = len(strides)
        self.cols = strides[-1][1]

    @classmethod
    def from_warp_path(cls, path: list[tuple[int, int]]) -> "Window":
        assert path and path[0] == (0, 0)
        rows = path[-1][0] + 1
        strides: list = [None] * rows
        prev_row = 0
        start = 0
        stop = 0
        for (r, c) in path:
            if r > prev_row:
                strides[prev_row] = (start, stop)
                start = c
                prev_row = r
            stop = c + 1
        strides[rows - 1] = (start, stop)
        return cls(strides)

    def stride(self, row: int) -> tuple[int, int]:
        return self.strides[row]

    def upsample(self, new_rows: int, new_cols: int) -> "Window":
        row_scale = new_rows / self.rows
        col_scale = new_cols / self.cols
        out = []
        for row in range(new_rows):
            s, e = self.strides[int((row + 0.5) / row_scale)]
            out.append((int(col_scale * s + 0.5),
                        int(col_scale * e + 0.5)))
        return Window(out)

    def dilate(self, radius: int) -> "Window":
        out = []
        for row in range(self.rows):
            pr = max(0, row - radius)
            nr = min(row + radius, self.rows - 1)
            out.append((max(0, self.strides[pr][0] - radius),
                        min(self.strides[nr][1] + radius, self.cols)))
        return Window(out)

    def debug_string(self) -> str:
        lines = []
        for s, e in self.strides:
            lines.append("".join(" *" if s <= c < e else " ."
                                 for c in range(self.cols)))
        return "\n".join(lines) + "\n"


_BIG = np.finfo(np.float64).max


def dynamic_timewarp(a: np.ndarray, b: np.ndarray,
                     window: Window | None = None
                     ) -> tuple[float, list[tuple[int, int]]]:
    """Constrained DTW -> (alignment_cost, warp_path), chordal-norm
    costs (s2polyline_alignment.cc:187-246)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    rows, cols = len(a), len(b)
    if window is None:
        window = Window([(0, cols)] * rows)
    costs = np.full((rows, cols), _BIG)

    def at(r, c, stride):
        if r < 0 and c < 0:
            return 0.0
        if r < 0 or c < 0:
            return _BIG
        if not (stride[0] <= c < stride[1]):
            return _BIG
        return costs[r, c]

    prev = (0, cols) if rows == 1 else (-1, 10 ** 9)
    prev = (-1, 10 ** 9)  # ColumnStride::All analogue
    for row in range(rows):
        cur = window.stride(row)
        s, e = cur
        # vectorized chordal distances for this row's stride
        d = np.linalg.norm(a[row] - b[s:e], axis=1)
        for k, col in enumerate(range(s, e)):
            dc = at(row - 1, col - 1, prev)
            uc = at(row - 1, col, prev)
            lc = at(row, col - 1, cur)
            costs[row, col] = min(dc, uc, lc) + d[k]
        prev = cur
    # walk back
    path = []
    row, col = rows - 1, cols - 1

    def stride_of(r):
        return ((-1, 10 ** 9) if r < 0 else window.stride(r))

    cur = stride_of(row)
    prev = stride_of(row - 1)
    while row >= 0 and col >= 0:
        path.append((row, col))
        dc = at(row - 1, col - 1, prev)
        uc = at(row - 1, col, prev)
        lc = at(row, col - 1, cur)
        if dc <= uc and dc <= lc:
            row -= 1
            col -= 1
            cur = stride_of(row)
            prev = stride_of(row - 1)
        elif uc <= lc:
            row -= 1
            cur = stride_of(row)
            prev = stride_of(row - 1)
        else:
            col -= 1
    path.reverse()
    return float(costs[rows - 1, cols - 1]), path


def exact_vertex_alignment(a, b) -> tuple[float, list]:
    return dynamic_timewarp(a, b)


def exact_vertex_alignment_cost(a, b) -> float:
    return dynamic_timewarp(a, b)[0]


def _half_resolution(p: np.ndarray) -> np.ndarray:
    return np.asarray(p)[::2]


SIZE_SWITCHOVER = 32
DENSITY_SWITCHOVER = 0.85


def approx_vertex_alignment(a, b, radius: int | None = None
                            ) -> tuple[float, list]:
    """FastDTW (s2polyline_alignment.cc:304-345): O(max(A,B)) space and
    time; `radius` defaults to max(len)^0.25."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if radius is None:
        radius = int(max(len(a), len(b)) ** 0.25)
    an, bn = len(a), len(b)
    if an - radius < SIZE_SWITCHOVER or bn - radius < SIZE_SWITCHOVER:
        return exact_vertex_alignment(a, b)
    if max(an, bn) * (2 * radius + 1) > an * bn * DENSITY_SWITCHOVER:
        return exact_vertex_alignment(a, b)
    _, proj = approx_vertex_alignment(_half_resolution(a),
                                      _half_resolution(b), radius)
    w = Window.from_warp_path(proj).upsample(an, bn).dilate(radius)
    return dynamic_timewarp(a, b, w)


def _cost_fn(a, b, approx: bool) -> float:
    if approx:
        return approx_vertex_alignment(a, b)[0]
    return exact_vertex_alignment_cost(a, b)


def medoid_polyline(polylines: list[np.ndarray],
                    approx: bool = True) -> int:
    """Index minimizing summed alignment cost to all others; ties go
    to the lowest index (s2polyline_alignment.h:162-190)."""
    n = len(polylines)
    if n == 0:
        raise ValueError("empty collection")
    costs = [0.0] * n
    for i in range(n):
        for j in range(i + 1, n):
            c = _cost_fn(polylines[i], polylines[j], approx)
            costs[i] += c
            costs[j] += c
    return int(np.argmin(costs))


def consensus_polyline(polylines: list[np.ndarray],
                       approx: bool = True, iteration_cap: int = 10,
                       seed_medoid: bool = False) -> np.ndarray:
    """Dynamic Timewarp Barycenter Averaging (Petitjean et al.; the
    reference's GetConsensusPolyline, s2polyline_alignment.cc:390-440):
    iterate aligning the consensus to every polyline, replacing each
    consensus vertex by the normalized sum of its matched vertices,
    until no vertex moves or the iteration cap is hit."""
    if not polylines:
        raise ValueError("empty collection")
    seed = medoid_polyline(polylines, approx) if seed_medoid else 0
    consensus = np.array(polylines[seed], dtype=np.float64)
    for _ in range(iteration_cap):
        acc = np.zeros_like(consensus)
        for p in polylines:
            p = np.asarray(p, dtype=np.float64)
            if approx:
                _, path = approx_vertex_alignment(consensus, p)
            else:
                _, path = exact_vertex_alignment(consensus, p)
            for (ci, pi) in path:
                acc[ci] += p[pi]
        acc /= np.linalg.norm(acc, axis=1, keepdims=True)
        if np.array_equal(acc, consensus):
            break
        consensus = acc
    return consensus
