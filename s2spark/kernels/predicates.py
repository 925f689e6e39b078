"""Robust geometric predicates: Sign / CrossingSign / VertexCrossing.

Two-pass design per the reference's escalation ladder
(s2predicates.h:365-407, s2predicates.cc:63-295):

1. vectorized NumPy triage — sign of det((AxB).C) with certified error
   bound kMaxDetError = 3.6548 * DBL_EPSILON; decides >99.99% of rows.
2. rare uncertain rows escalate per-row: StableSign (re-permuted floats)
   then ExactSign over Python Fractions (doubles are exact rationals) with
   the reference's symbolic-perturbation tie-break
   (s2predicates.cc:130-261) — bit-exact verdicts, never 0.

Crossing tests follow s2edge_crosser.cc:28-96 and
s2edge_crossings.cc:369-389 (vertex-crossing parity rule).
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

DBL_EPSILON = 2.220446049250313e-16
MAX_DET_ERROR = 3.6548 * DBL_EPSILON
_STABLE_DET_ERROR = 3.2321 * DBL_EPSILON


# ---------------------------------------------------------------------------
# vectorized triage
# ---------------------------------------------------------------------------

def triage_sign(ax, ay, az, bx, by, bz, cx, cy, cz):
    """Vectorized TriageSign: +1/-1 certain, 0 uncertain."""
    # det = (a x b) . c
    det = ((ay * bz - az * by) * cx
           + (az * bx - ax * bz) * cy
           + (ax * by - ay * bx) * cz)
    out = np.zeros(det.shape, dtype=np.int8)
    out[det > MAX_DET_ERROR] = 1
    out[det < -MAX_DET_ERROR] = -1
    return out


def _stable_sign_scalar(a, b, c) -> int:
    """StableSign (s2predicates.cc:63-101); 0 = still uncertain."""
    ab = (b[0] - a[0], b[1] - a[1], b[2] - a[2])
    bc = (c[0] - b[0], c[1] - b[1], c[2] - b[2])
    ca = (a[0] - c[0], a[1] - c[1], a[2] - c[2])
    ab2 = ab[0] ** 2 + ab[1] ** 2 + ab[2] ** 2
    bc2 = bc[0] ** 2 + bc[1] ** 2 + bc[2] ** 2
    ca2 = ca[0] ** 2 + ca[1] ** 2 + ca[2] ** 2
    import math

    def cross_dot(u, v, w):
        return ((u[1] * v[2] - u[2] * v[1]) * w[0]
                + (u[2] * v[0] - u[0] * v[2]) * w[1]
                + (u[0] * v[1] - u[1] * v[0]) * w[2])

    if ab2 >= bc2 and ab2 >= ca2:
        det = -cross_dot(ca, bc, c)
        max_error = _STABLE_DET_ERROR * math.sqrt(ca2 * bc2)
    elif bc2 >= ca2:
        det = -cross_dot(ab, ca, a)
        max_error = _STABLE_DET_ERROR * math.sqrt(ab2 * ca2)
    else:
        det = -cross_dot(bc, ab, b)
        max_error = _STABLE_DET_ERROR * math.sqrt(bc2 * ab2)
    min_no_underflow = _STABLE_DET_ERROR * math.sqrt(2.2250738585072014e-308)
    if max_error < min_no_underflow:
        return 0
    if abs(det) <= max_error:
        return 0
    return 1 if det > 0 else -1


def _sgn(x: Fraction) -> int:
    return (x > 0) - (x < 0)


def _symbolically_perturbed_sign(a, b, c, b_cross_c) -> int:
    """Tie-break for exactly-zero determinants (s2predicates.cc:130-223).
    Points must be lexicographically sorted a < b < c."""
    s = _sgn(b_cross_c[2])
    if s:
        return s
    s = _sgn(b_cross_c[1])
    if s:
        return s
    s = _sgn(b_cross_c[0])
    if s:
        return s
    s = _sgn(c[0] * a[1] - c[1] * a[0])
    if s:
        return s
    s = _sgn(c[0])
    if s:
        return s
    s = -_sgn(c[1])
    if s:
        return s
    s = _sgn(c[2] * a[0] - c[0] * a[2])
    if s:
        return s
    s = _sgn(c[2])
    if s:
        return s
    s = _sgn(a[0] * b[1] - a[1] * b[0])
    if s:
        return s
    s = -_sgn(b[0])
    if s:
        return s
    s = _sgn(b[1])
    if s:
        return s
    s = _sgn(a[0])
    if s:
        return s
    return 1


def _exact_sign_scalar(a, b, c, perturb: bool = True) -> int:
    """Exact determinant sign over rationals (s2predicates.cc:225-261)."""
    perm_sign = 1
    pa, pb, pc = tuple(a), tuple(b), tuple(c)
    if pa > pb:
        pa, pb = pb, pa
        perm_sign = -perm_sign
    if pb > pc:
        pb, pc = pc, pb
        perm_sign = -perm_sign
    if pa > pb:
        pa, pb = pb, pa
        perm_sign = -perm_sign
    xa = tuple(Fraction(v) for v in pa)
    xb = tuple(Fraction(v) for v in pb)
    xc = tuple(Fraction(v) for v in pc)
    bxc = (xb[1] * xc[2] - xb[2] * xc[1],
           xb[2] * xc[0] - xb[0] * xc[2],
           xb[0] * xc[1] - xb[1] * xc[0])
    det = xa[0] * bxc[0] + xa[1] * bxc[1] + xa[2] * bxc[2]
    det_sign = _sgn(det)
    if det_sign == 0 and perturb:
        det_sign = _symbolically_perturbed_sign(xa, xb, xc, bxc)
    return perm_sign * det_sign


def _expensive_sign_scalar(a, b, c) -> int:
    if a == b or b == c or c == a:
        return 0
    s = _stable_sign_scalar(a, b, c)
    if s != 0:
        return s
    return _exact_sign_scalar(a, b, c, perturb=True)


def sign(ax, ay, az, bx, by, bz, cx, cy, cz) -> np.ndarray:
    """Robust vectorized Sign: never 0 for distinct points.

    Triage decides almost all rows; uncertain rows escalate to the exact
    scalar ladder exactly like the reference (s2predicates.h:365-370).
    """
    out = triage_sign(ax, ay, az, bx, by, bz, cx, cy, cz).astype(np.int64)
    unsure = np.nonzero(out == 0)[0]
    for k in unsure:
        a = (float(ax[k]), float(ay[k]), float(az[k]))
        b = (float(bx[k]), float(by[k]), float(bz[k]))
        c = (float(cx[k]), float(cy[k]), float(cz[k]))
        out[k] = _expensive_sign_scalar(a, b, c)
    return out


# ---------------------------------------------------------------------------
# scalar helpers for shared-vertex crossing rules
# ---------------------------------------------------------------------------

def _sign_scalar(a, b, c) -> int:
    det = ((a[1] * b[2] - a[2] * b[1]) * c[0]
           + (a[2] * b[0] - a[0] * b[2]) * c[1]
           + (a[0] * b[1] - a[1] * b[0]) * c[2])
    if det > MAX_DET_ERROR:
        return 1
    if det < -MAX_DET_ERROR:
        return -1
    return _expensive_sign_scalar(a, b, c)


def ordered_ccw(a, b, c, o) -> bool:
    """Are B and C ordered CCW around O starting from A
    (s2predicates.cc:298-311)."""
    total = 0
    if _sign_scalar(b, o, a) >= 0:
        total += 1
    if _sign_scalar(c, o, b) >= 0:
        total += 1
    if _sign_scalar(a, o, c) > 0:
        total += 1
    return total >= 2


def ref_dir(a):
    """Reference direction for vertex-model tests (s2pointutil.cc:48-60)."""
    ax, ay, az = abs(a[0]), abs(a[1]), abs(a[2])
    largest = 0 if ax > ay and ax > az else (1 if ay > az else 2)
    k = largest - 1
    if k < 0:
        k = 2
    temp = [0.012, 0.0053, 0.00457]
    temp[k] = 1.0
    cx = a[1] * temp[2] - a[2] * temp[1]
    cy = a[2] * temp[0] - a[0] * temp[2]
    cz = a[0] * temp[1] - a[1] * temp[0]
    import math
    n = math.sqrt(cx * cx + cy * cy + cz * cz)
    return (cx / n, cy / n, cz / n)


def angle_contains_vertex(a, b, c) -> bool:
    """Does the wedge ABC contain vertex B (s2edge_crossings.h:239-250)."""
    return not ordered_ccw(ref_dir(b), c, a, b)


WEDGE_EQUALS = 0
WEDGE_PROPERLY_CONTAINS = 1
WEDGE_IS_PROPERLY_CONTAINED = 2
WEDGE_PROPERLY_OVERLAPS = 3
WEDGE_IS_DISJOINT = 4


def wedge_contains(a0, ab1, a2, b0, b2) -> bool:
    """Does wedge A (a0, ab1, a2) contain wedge B at the shared vertex
    ab1 (s2wedge_relations.cc:28-38): CCW order a2 b2 b0 a0."""
    return (ordered_ccw(a2, b2, b0, ab1)
            and ordered_ccw(b0, a0, a2, ab1))


def wedge_intersects(a0, ab1, a2, b0, b2) -> bool:
    """Do the wedge interiors intersect (s2wedge_relations.cc:40-50):
    negation of the disjoint order a0 b2 b0 a2 — written as negatives
    so shared vertices resolve correctly."""
    return not (ordered_ccw(a0, b2, b0, ab1)
                and ordered_ccw(b0, a2, a0, ab1))


def get_wedge_relation(a0, ab1, a2, b0, b2) -> int:
    """Full wedge relation (s2wedge_relations.cc:52-88)."""
    if a0 == b0 and a2 == b2:
        return WEDGE_EQUALS
    if ordered_ccw(a0, a2, b2, ab1):
        if ordered_ccw(b2, b0, a0, ab1):
            return WEDGE_PROPERLY_CONTAINS
        return (WEDGE_IS_PROPERLY_CONTAINED if a2 == b2
                else WEDGE_PROPERLY_OVERLAPS)
    if ordered_ccw(a0, b0, b2, ab1):
        return WEDGE_IS_PROPERLY_CONTAINED
    return (WEDGE_IS_DISJOINT if ordered_ccw(a0, b0, a2, ab1)
            else WEDGE_PROPERLY_OVERLAPS)


def vertex_crossing(a, b, c, d) -> bool:
    """Shared-vertex crossing parity rule (s2edge_crossings.cc:369-389)."""
    if a == b or c == d:
        return False
    if a == c:
        return (b == d) or ordered_ccw(ref_dir(a), d, b, a)
    if b == d:
        return ordered_ccw(ref_dir(b), c, a, b)
    if a == d:
        return (b == c) or ordered_ccw(ref_dir(a), c, b, a)
    if b == c:
        return ordered_ccw(ref_dir(b), d, a, b)
    return False


def signed_vertex_crossing(a, b, c, d) -> int:
    """Signed shared-vertex crossing (s2edge_crossings.cc:391-410):
    +1 when both edges are outgoing or both incoming at the common
    vertex and they cross, -1 for mixed direction crossings, 0
    otherwise.  Summing these with the transverse +1-if-left
    contributions yields winding-number deltas along a path."""
    if a == b or c == d:
        return 0
    if a == c:
        return 1 if ((b == d) or ordered_ccw(ref_dir(a), d, b, a)) else 0
    if b == d:
        return 1 if ordered_ccw(ref_dir(b), c, a, b) else 0
    if a == d:
        return -1 if ((b == c) or ordered_ccw(ref_dir(a), c, b, a)) else 0
    if b == c:
        return -1 if ordered_ccw(ref_dir(b), d, a, b) else 0
    return 0


# ---------------------------------------------------------------------------
# vectorized crossing sign over (edge, edge) pairs
# ---------------------------------------------------------------------------

def crossing_sign(a, b, c, d) -> np.ndarray:
    """Vectorized CrossingSign: +1 = interior crossing, 0 = shared vertex,
    -1 = no crossing.  a,b,c,d are (n,3) float64 arrays.

    Mirrors S2EdgeCrosser semantics (s2edge_crosser.cc:41-96) without the
    tangent-plane early-out (the robust batch Sign subsumes it).
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    c = np.asarray(c, dtype=np.float64)
    d = np.asarray(d, dtype=np.float64)
    n = a.shape[0]
    out = np.full(n, -1, dtype=np.int64)

    eq = lambda u, v: (u == v).all(axis=1)  # noqa: E731
    shared = eq(a, c) | eq(a, d) | eq(b, c) | eq(b, d)
    degen = eq(a, b) | eq(c, d)

    live = ~(shared | degen)
    idx = np.nonzero(live)[0]
    if idx.size:
        al, bl, cl, dl = a[idx], b[idx], c[idx], d[idx]
        acb = -sign(al[:, 0], al[:, 1], al[:, 2], bl[:, 0], bl[:, 1],
                    bl[:, 2], cl[:, 0], cl[:, 1], cl[:, 2])
        bda = sign(al[:, 0], al[:, 1], al[:, 2], bl[:, 0], bl[:, 1],
                   bl[:, 2], dl[:, 0], dl[:, 1], dl[:, 2])
        maybe = bda == acb
        sub = np.nonzero(maybe)[0]
        if sub.size:
            a2, b2, c2, d2 = al[sub], bl[sub], cl[sub], dl[sub]
            cbd = -sign(c2[:, 0], c2[:, 1], c2[:, 2], d2[:, 0], d2[:, 1],
                        d2[:, 2], b2[:, 0], b2[:, 1], b2[:, 2])
            dac = sign(c2[:, 0], c2[:, 1], c2[:, 2], d2[:, 0], d2[:, 1],
                       d2[:, 2], a2[:, 0], a2[:, 1], a2[:, 2])
            hit = (cbd == acb[sub]) & (dac == acb[sub])
            res = np.where(hit, 1, -1)
            full = np.full(idx.size, -1, dtype=np.int64)
            full[sub] = res
            out[idx] = full
    out[shared & ~degen] = 0
    return out


def edge_or_vertex_crossing(a, b, c, d) -> np.ndarray:
    """Boolean parity contribution per edge pair
    (s2edge_crossings.cc:391-398): crossing>0 -> True, <0 -> False,
    ==0 -> VertexCrossing rule (scalar, rare)."""
    cs = crossing_sign(a, b, c, d)
    out = cs > 0
    zero = np.nonzero(cs == 0)[0]
    for k in zero:
        out[k] = vertex_crossing(tuple(a[k]), tuple(b[k]), tuple(c[k]),
                                 tuple(d[k]))
    return out


# ---------------------------------------------------------------------------
# CompareDistances (s2predicates.h:106-146): sign of d(x,a) - d(x,b)
# with triage -> exact-rational escalation
# ---------------------------------------------------------------------------

_DBL_EPS = 2.220446049250313e-16
# conservative error bound on (|x-a|^2 - |x-b|^2) computed in doubles:
# each squared-chord sum carries ~5.5 ulp relative error; 32 eps of
# the larger magnitude safely covers both sides plus the subtraction
_CMP_DIST_REL_ERR = 32.0 * _DBL_EPS


def triage_compare_distances(x: np.ndarray, a: np.ndarray,
                             b: np.ndarray) -> np.ndarray:
    """Vectorized triage: (n,3) arrays -> int8 sign of
    chord2(x,a) - chord2(x,b), 0 where the doubles cannot decide
    (|diff| within the error bound) — the cheap first rung of the
    reference's CompareDistances ladder."""
    x = np.asarray(x, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    d2a = ((x - a) ** 2).sum(axis=1)
    d2b = ((x - b) ** 2).sum(axis=1)
    diff = d2a - d2b
    err = _CMP_DIST_REL_ERR * np.maximum(np.maximum(d2a, d2b),
                                         _DBL_EPS)
    out = np.zeros(diff.shape[0], dtype=np.int8)
    out[diff > err] = 1
    out[diff < -err] = -1
    return out


def exact_compare_distances_scalar(x, a, b) -> int:
    """Exact rung: the inputs are exact doubles, so the squared chord
    distances are exact rationals — Fraction arithmetic gives the true
    sign (the analogue of the reference's ExactCompareDistances over
    exact arithmetic, s2predicates.cc).  Returns 0 only for genuinely
    equidistant inputs (callers break those ties symbolically, by
    id — documented divergence from the reference's full symbolic
    perturbation)."""
    from fractions import Fraction
    d2a = sum((Fraction(float(xi)) - Fraction(float(ai))) ** 2
              for xi, ai in zip(x, a))
    d2b = sum((Fraction(float(xi)) - Fraction(float(bi))) ** 2
              for xi, bi in zip(x, b))
    if d2a > d2b:
        return 1
    if d2a < d2b:
        return -1
    return 0


def compare_distances(x: np.ndarray, a: np.ndarray, b: np.ndarray
                      ) -> np.ndarray:
    """Robust vectorized CompareDistances: triage decides almost all
    rows; uncertain rows escalate to exact rational arithmetic."""
    x = np.asarray(x, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    out = triage_compare_distances(x, a, b).astype(np.int64)
    d2a = ((x - a) ** 2).sum(axis=1)
    d2b = ((x - b) ** 2).sum(axis=1)
    # escalate only true triage uncertainty (both equal doubles pass
    # through too: the exact rung is what distinguishes them)
    unsure = np.nonzero((out == 0) & ~((d2a == d2b) & (a == b).all(axis=1)))[0]
    for k in unsure:
        out[k] = exact_compare_distances_scalar(
            tuple(x[k]), tuple(a[k]), tuple(b[k]))
    return out
