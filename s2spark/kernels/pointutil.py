"""Point frames and rotations (reference s2pointutil.h:40-157):
Ortho / RefDir / Rotate / GetFrame / ToFrame / FromFrame, batched
over (n, 3) NumPy arrays.

Two frame conventions live here ON PURPOSE:

- get_frame / ortho reproduce the REFERENCE'S math exactly
  (s2pointutil.cc:48-101): Ortho crosses with the perturbed axis
  (0.012, 0.0053, 0.00457 with a 1 in the slot below the largest
  component) so no frame coordinate is exactly zero, and the frame
  columns are (y×z, Ortho(z), z).
- tangent_frame is the repo's FROZEN fixture-generator convention
  (ref = z-hat unless |z| >= 0.9, u = normalize(z×ref), v = z×u).
  Its double operation order is mirrored literally by the DuckDB
  oracles (raster_cell_map, convex_hull fixtures) and by
  ops/pip.synth_loops — it must NEVER change.  It exists here so the
  previously ad-hoc copies (ops/pip.py, kernels/buffer.py, the entry
  hull fixture) converge on one kernel (VERDICT r4 #7).
"""

from __future__ import annotations

import numpy as np

# s2pointutil.cc:57 — perturbed axis that keeps Ortho results off the
# coordinate planes (fewer degenerate cases downstream)
_ORTHO_TEMP = np.array([0.012, 0.0053, 0.00457], dtype=np.float64)

# s2pointutil.h Origin(): ~66 km from the north pole (not a pole, not
# on a low-level cell boundary — avoids degeneracies in edge tests)
_ORIGIN = np.array([-0.0099994664350250197, 0.0025924542609324121,
                    0.99994664350250195], dtype=np.float64)


def origin() -> np.ndarray:
    return _ORIGIN.copy()


def _norm_rows(v: np.ndarray) -> np.ndarray:
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def ortho(a: np.ndarray) -> np.ndarray:
    """Unit vector(s) orthogonal to each row of `a`; Ortho(-a) =
    -Ortho(a) (s2pointutil.cc:48-60: cross with the perturbed basis
    vector one slot below the largest-|.| component)."""
    a = np.atleast_2d(np.asarray(a, dtype=np.float64))
    k = np.argmax(np.abs(a), axis=1) - 1
    k[k < 0] = 2
    temp = np.broadcast_to(_ORTHO_TEMP, a.shape).copy()
    temp[np.arange(len(a)), k] = 1.0
    return _norm_rows(np.cross(a, temp))


def ref_dir(a: np.ndarray) -> np.ndarray:
    """Reference direction for semi-open vertex containment
    (s2pointutil.h RefDir == Ortho)."""
    return ortho(a)


def approx_equals(a: np.ndarray, b: np.ndarray,
                  max_error: float = 1e-15) -> np.ndarray:
    """Angle(a, b) <= max_error, batched (s2pointutil.cc:42-46)."""
    a = np.atleast_2d(np.asarray(a, dtype=np.float64))
    b = np.atleast_2d(np.asarray(b, dtype=np.float64))
    cross = np.linalg.norm(np.cross(a, b), axis=1)
    dot = np.einsum("ij,ij->i", a, b)
    return np.arctan2(cross, dot) <= max_error


def rotate(p: np.ndarray, axis: np.ndarray, angle: float) -> np.ndarray:
    """Rotate p about unit `axis` by `angle` radians
    (s2pointutil.cc:63-78: decompose into the in-plane frame
    (dx, dy) around center = (p·axis)axis, then cos·dx + sin·dy +
    center, normalized)."""
    p = np.atleast_2d(np.asarray(p, dtype=np.float64))
    axis = np.broadcast_to(
        np.asarray(axis, dtype=np.float64), p.shape)
    center = np.einsum("ij,ij->i", p, axis)[:, None] * axis
    dx = p - center
    dy = np.cross(axis, p)
    return _norm_rows(np.cos(angle) * dx + np.sin(angle) * dy + center)


def get_frame(z: np.ndarray) -> np.ndarray:
    """(n, 3, 3) right-handed orthonormal column frames m = (x, y, z)
    per unit point z (s2pointutil.cc:87-92): col2 = z, col1 =
    Ortho(z), col0 = col1 × z."""
    z = np.atleast_2d(np.asarray(z, dtype=np.float64))
    y = ortho(z)
    x = np.cross(y, z)
    m = np.empty((len(z), 3, 3), dtype=np.float64)
    m[:, :, 0] = x
    m[:, :, 1] = y
    m[:, :, 2] = z
    return m


def to_frame(m: np.ndarray, p: np.ndarray) -> np.ndarray:
    """Coordinates of p in basis m (mᵀ p — orthonormal inverse)."""
    p = np.atleast_2d(np.asarray(p, dtype=np.float64))
    return np.einsum("nji,nj->ni", m, p)


def from_frame(m: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Standard-basis point for frame coordinates q (m q)."""
    q = np.atleast_2d(np.asarray(q, dtype=np.float64))
    return np.einsum("nij,nj->ni", m, q)


def tangent_frame(z) -> tuple[np.ndarray, np.ndarray]:
    """(u, v) tangent basis at unit point(s) z — the repo's FROZEN
    fixture convention: ref = (0,0,1) unless |z₂| >= 0.9 (then
    (1,0,0)); u = normalize(z × ref); v = z × u (NOT renormalized).
    The exact double op order is mirrored by the DuckDB oracles —
    do not change (CLAUDE.md tri-dialect invariant)."""
    z = np.atleast_2d(np.asarray(z, dtype=np.float64))
    ref = np.where((np.abs(z[:, 2]) < 0.9)[:, None],
                   np.array([0.0, 0.0, 1.0]),
                   np.array([1.0, 0.0, 0.0]))
    u = np.cross(z, ref)
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    v = np.cross(z, u)
    return u, v


def make_regular_loop(center, radius_rad: float, n: int) -> np.ndarray:
    """S2Loop::MakeRegularLoop (s2loop.cc:216-233): n vertices at
    angular distance `radius_rad` from `center`, CCW around it, laid
    out in the GetFrame basis (vertex 0 on the frame's +x tangent
    axis) — the construction the reference's test fixtures use."""
    m = get_frame(np.asarray(center, dtype=np.float64).reshape(3))
    ang = 2 * np.pi * np.arange(n) / n
    s, c = np.sin(radius_rad), np.cos(radius_rad)
    local = np.stack([s * np.cos(ang), s * np.sin(ang),
                      np.full(n, c)], axis=1)
    out = from_frame(m, local)
    # the reference normalizes each vertex (s2loop.cc MakeRegularLoop)
    return out / np.linalg.norm(out, axis=1, keepdims=True)
